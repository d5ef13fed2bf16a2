package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash band hashes over pre-hashed shingles (array<long>), one pass.
  *
  * For each of `numHashes` seeded xxh64 permutations, keeps the min over the
  * shingle set; bands of `numHashes / bands` consecutive minima are combined
  * into one hash per band. A single tight primitive loop replaces numHashes
  * interpreted higher-order-function evaluations per row (~15x faster at
  * 64-128 hashes). Fully codegen'd via the [[SketchOps]] static kernel.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SketchOps.minhashBands(v.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.SketchOps.minhashBands($c, $numHashes, $bands)")

  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}

/** MinHash signature (the per-seed minima themselves, not band hashes) over
  * pre-hashed shingles, one codegen'd pass. Component s is BIT-IDENTICAL to
  * `array_min(transform(child, h => xxhash64(lit(s), h)))` — the interpreted
  * higher-order-function formulation this replaces evaluated numHashes
  * CodegenFallback lambdas per row and re-walked the shingle array each time,
  * which made it the dominant CPU cost of the streaming banding stage (see
  * [[SketchOps.minhashSignatureXx]] for the measured ratio and the exact
  * XxHash64 fold replay).
  *
  * Parity boundaries (ADVICE r14), both unreachable from engine callers:
  * - NULL input array → null result (the HOF formulation produced a
  *   non-null array of numHashes nulls for a null child; current consumers
  *   posexplode the band array, which drops the row either way);
  * - null ELEMENTS are rejected at analysis (below) — the kernel's
  *   skip-nulls differs from `xxhash64(lit(s), null)`'s hashInt(s, 42)
  *   fallback, so arrays that could carry null elements must not reach it.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "minhashsignature requires array<bigint> with containsNull = false " +
            "(null elements would diverge from the xxhash64 HOF formulation)")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhashsignature requires ARRAY<BIGINT>, got ${other.sql}")
    }

  // element nullability mirrors array_min: an empty/all-null shingle array
  // yields null components
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    SketchOps.minhashSignatureXx(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.SketchOps.minhashSignatureXx($c, $numHashes)")

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}
