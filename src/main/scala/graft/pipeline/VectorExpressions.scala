package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  * and expression paths agree bit-for-bit.
  */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int,
                             dim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1 && planes <= 48, "planes must be in [1, 48]")
  require(tables >= 1, "tables must be >= 1")

  // tables x planes x dim, generated once per partition (deterministic seed)
  @transient private lazy val hyper: Array[Array[Array[Double]]] =
    Array.tabulate(tables) { t =>
      val rnd = new java.util.Random(seed + t * 1000L)
      Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i); i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bits = 0L
      var p = 0
      while (p < planes) {
        val plane = hyper(t)(p)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += vec(d) * plane(d); d += 1 }
        if (dot >= 0) bits |= (1L << p)
        p += 1
      }
      out(t) = (t.toLong << 48) | bits
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}

/** The `nprobe` centroid ids nearest (by cosine) to an embedding vector, most
  * similar first — the IVF assignment/probe step, one tight double loop per
  * row (same interpreted-HOF trap as [[HyperplaneBuckets]]). Centroids ship
  * inside the expression (driver-trained, kilobytes) and are L2-normalized
  * once per partition so similarity is a plain dot product.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
                            nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "centroids must not be empty")
  require(nprobe >= 1 && nprobe <= centroids.length, "nprobe must be in [1, numCentroids]")

  @transient private lazy val normed: Array[Array[Double]] = centroids.map { c =>
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0.0) c else c.map(_ / n)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i); i += 1 }
    val sims = new Array[Double](normed.length)
    var c = 0
    while (c < normed.length) {
      val cen = normed(c)
      val d = math.min(n, cen.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += vec(j) * cen(j); j += 1 }
      sims(c) = dot
      c += 1
    }
    val order = sims.zipWithIndex.sortBy { case (s, idx) => (-s, idx) }
    new GenericArrayData(order.take(nprobe).map(_._2))
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroids = copy(child = c)
}
