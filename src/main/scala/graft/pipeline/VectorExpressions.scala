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
