package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All `tables` random-hyperplane LSH bucket keys for an embedding vector in
  * ONE pass (tight double loops). The higher-order-function formulation
  * (aggregate/zip_with per plane) is interpreted, not codegen'd — measured
  * 15x slower on the minhash path; same trap here with tables*planes dot
  * products per row.
  *
  * Output: array<long> of length `tables`; element t = (t << 48) | signBits
  * (planes <= 48). Hyperplane RNG matches
  * [[Similarity.randomHyperplanes]](planes, dim, seed + t*1000L) so column
  * and expression paths agree bit-for-bit. Fully codegen'd: the plane matrix
  * ships into generated code as a reference object, the kernel lives in
  * [[SketchOps]].
  */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int,
                             dim: Int, seed: Long)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 48, "planes must be in [1, 48]")
  require(tables >= 1, "tables must be >= 1")

  // tables x planes x dim, generated once per executor (deterministic seed)
  @transient private lazy val hyper: Array[Array[Array[Double]]] =
    Array.tabulate(tables) { t =>
      val rnd = new java.util.Random(seed + t * 1000L)
      Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SketchOps.hyperplaneBuckets(v.asInstanceOf[ArrayData], hyper, planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hyperRef = ctx.addReferenceObj("hyper", hyper, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.SketchOps.hyperplaneBuckets($c, $hyperRef, $planes, $dim)")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}

/** L2 norm of a numeric array as double — codegen'd replacement for the
  * `sqrt(aggregate(vec, 0.0, (acc,x) => acc + x*x))` higher-order chain,
  * which is CodegenFallback and left the embedding-stats map stage
  * interpreted. Element order and accumulation match the HOF exactly
  * (sequential left-to-right in double), so results are bit-identical.
  * NULL input or any NULL element -> NULL (cast-through-HOF semantics).
  */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def kernel: String = child.dataType match {
    case ArrayType(DoubleType, _) => "l2NormF64"
    case ArrayType(FloatType, _) => "l2NormF32"
    case ArrayType(LongType, _) => "l2NormI64"
    case ArrayType(IntegerType, _) => "l2NormI32"
    case other => throw new IllegalArgumentException(
      s"VectorNorm needs array<double|float|bigint|int>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType | LongType | IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"VectorNorm needs array<double|float|bigint|int>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    kernel match {
      case "l2NormF64" => SketchOps.l2NormF64(arr)
      case "l2NormF32" => SketchOps.l2NormF32(arr)
      case "l2NormI64" => SketchOps.l2NormI64(arr)
      case "l2NormI32" => SketchOps.l2NormI32(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("norm")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${childGen.isNull}) {
          java.lang.Double $boxed = graft.pipeline.SketchOps.$kernel(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }""")
  }

  override protected def withNewChildInternal(c: Expression): VectorNorm = copy(child = c)
}

/** The `nprobe` centroid ids nearest (by cosine) to an embedding vector, most
  * similar first — the IVF assignment/probe step, one tight double loop per
  * row (same interpreted-HOF trap as [[HyperplaneBuckets]]). Centroids ship
  * inside the expression (driver-trained, kilobytes) and are L2-normalized
  * once per executor so similarity is a plain dot product. Fully codegen'd
  * via [[SketchOps]] with the normalized matrix as a reference object.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
                            nprobe: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroids must not be empty")
  require(nprobe >= 1 && nprobe <= centroids.length, "nprobe must be in [1, numCentroids]")

  @transient private lazy val normed: Array[Array[Double]] = centroids.map { c =>
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0.0) c else c.map(_ / n)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SketchOps.nearestCentroids(v.asInstanceOf[ArrayData], normed, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val normedRef = ctx.addReferenceObj("normed", normed, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.SketchOps.nearestCentroids($c, $normedRef, $nprobe)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroids = copy(child = c)
}

/** Exact cosine similarity of two double-array columns — one tight fused
  * loop per pair, fully codegen'd via [[SketchOps.cosineSim]]. Replaces the
  * zip_with/aggregate HOF formulation whose CodegenFallback de-codegen'd
  * every cosine verify stage (knn ranking, cosine near-dup, SemDeDup); the
  * kernel accumulates dot and both norms left-to-right in the exact element
  * order the HOF chain used, so results are bit-identical (and the DuckDB
  * oracles are unaffected). Null when either array is null, lengths differ,
  * or an element is null — the same poisoning the HOF zip_with/aggregate
  * produced.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"CosineSimilarity needs two array<double> arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchOps.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("cos")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          java.lang.Double $boxed =
            graft.pipeline.SketchOps.cosineSim(${leftGen.value}, ${rightGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }""")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimilarity = copy(left = l, right = r)
}
