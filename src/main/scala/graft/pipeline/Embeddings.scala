package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: norms, L2
  * normalization, and per-group statistics (the health dashboard a 100 TB
  * embedding corpus needs before ANN indexing — norm drift, degenerate
  * all-zero vectors, centroid collapse per shard/label).
  *
  * Scale shapes: norms and normalization are row-local expressions;
  * groupStats is one partial-aggregated shuffle on the group key; centroids
  * aggregate per (group, dimension) — group-count x dim rows, partial-agg
  * map-side, never a full-vector shuffle.
  */
object Embeddings {

  /** L2 norm, accumulated in double (row-local). Codegen'd [[VectorNorm]]
    * expression — bit-identical to the old `aggregate` HOF (same element
    * order, same double accumulation), which was CodegenFallback and left
    * every stage containing a norm interpreted.
    */
  def l2Norm(vec: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(VectorNorm(GraftColumnBridge.expression(vec)))
  }

  /** Vector scaled to unit L2 norm; all-zero vectors pass through unchanged
    * (guard against divide-by-zero). Row-local.
    */
  def l2Normalize(vec: Column): Column = {
    val n = l2Norm(vec)
    when(n > 0, transform(vec, x => x.cast("double") / n)).otherwise(transform(vec, _.cast("double")))
  }

  /** Order-independent mean: per-row values are rounded to `scale` decimals,
    * summed exactly as DECIMAL(38,scale) (partial-aggregatable, no FP drift
    * across partition orders), then one deterministic double division. This
    * makes distributed Spark bit-match a sequential engine at any parallelism.
    */
  private def stableAvg(v: Column, scale: Int, roundTo: Int): Column =
    round(sum(round(v, scale).cast(s"decimal(38,$scale)")).cast("double") /
      count(v), roundTo)

  /** Per-group embedding statistics: row count, zero-vector count, and
    * min/avg/max L2 norm (rounded to `roundTo` decimals — cross-engine stable
    * under distributed summation order: min/max are order-free, avg uses an
    * exact decimal sum so partition order can't flip the last rounded digit).
    */
  def groupStats(df: DataFrame, groupCol: String, vecCol: String, roundTo: Int = 6): DataFrame = {
    val n = l2Norm(col(vecCol))
    df.groupBy(groupCol).agg(
      count(lit(1)).as("n_vectors"),
      sum(when(n === 0 || col(vecCol).isNull, 1).otherwise(0)).as("n_zero"),
      round(min(n), roundTo).as("min_norm"),
      stableAvg(n, 6, roundTo).as("avg_norm"),
      round(max(n), roundTo).as("max_norm"))
  }

  /** Per-group centroid (element-wise mean), one output row per group:
    * explode to (group, dim, value), partial-agg the means, regroup into an
    * ordered array. Returns (groupCol, centroid array<double>, centroid_norm).
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String, roundTo: Int = 6): DataFrame = {
    val exploded = df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("__dim", "__v")))
    val dimMeans = exploded.groupBy(col(groupCol), col("__dim"))
      .agg(stableAvg(col("__v").cast("double"), 6, roundTo).as("__mean"))
    dimMeans.groupBy(groupCol)
      .agg(array_sort(collect_list(struct(col("__dim"), col("__mean")))).as("__pairs"))
      .select(col(groupCol),
        transform(col("__pairs"), p => p.getField("__mean")).as("centroid"))
      .withColumn("centroid_norm", round(l2Norm(col("centroid")), roundTo))
  }

  /** Topic/cluster assignment: each row labeled with its nearest centroid
    * (max dot against the L2-normalized centroid list; ties → lowest index)
    * — the corpus-bucketing step before per-topic sampling or domain mixing.
    * Row-local and codegen'd (the [[NearestCentroids]] IVF kernel; centroids
    * broadcast as a reference object, zero shuffle). Train centroids with
    * [[Similarity.trainKMeans]] on a capped sample, or pass any external
    * quantizer.
    */
  def assignClusters(df: DataFrame, vecCol: String,
                     centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "assignClusters needs at least one centroid")
    import org.apache.spark.sql.GraftColumnBridge
    val cluster = GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(col(vecCol).cast("array<double>")),
      centroids, 1))(0)
    df.withColumn("cluster", cluster)
  }
}
