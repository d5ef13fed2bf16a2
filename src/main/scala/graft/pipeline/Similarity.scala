package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set against
  * the corpus, one scan, no corpus shuffle; ranking is a per-query window.
  * Scale path: random-hyperplane LSH buckets shrink the candidate set so the
  * join is equi- (bucket) rather than cross-; recall traded via `tables`
  * independent hash tables.
  */
object Similarity {

  /** Exact cosine similarity between two float-array columns (codegen'd
    * higher-order functions; double accumulation).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: every query row against every corpus row.
    * `queries` must be small (broadcast); corpus is scanned once. Output:
    * (query_id, rank, neighbor_id, cosine), rank 1..k, self-match excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplanes (driver-side, seeded). */
  def randomHyperplanes(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id from hyperplane projections (row-local, no shuffle). */
  def hyperplaneBucket(vec: Column, hyperplanes: Seq[Seq[Double]]): Column = {
    val bits: Seq[Column] = hyperplanes.zipWithIndex.map { case (h, i) =>
      val harr = array(h.map(lit): _*)
      val proj = aggregate(zip_with(vec, harr, (x, w) => x * w), lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: queries meet only corpus rows sharing a
    * bucket in at least one of `tables` hash tables. Candidates are
    * exact-cosine ranked; recall < 1 by design (the 100 TB path — the bucket
    * join replaces the cross join). The bucket join and candidate dedup carry
    * ONLY ids; vectors re-join for the candidate set.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 12, tables: Int = 4, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    def bucketed(df: DataFrame, side: String): DataFrame = {
      val base = df.select(col(idCol).as(s"${side}_id"),
        col(vecCol).cast("array<double>").as(s"__${side}v"))
      val buckets = GraftColumnBridge.column(HyperplaneBuckets(
        GraftColumnBridge.expression(col(s"__${side}v")), planes, tables, dim, seed))
      base.select(col(s"${side}_id"), explode(buckets).as("__bucket"))
    }
    val candidateIds = bucketed(corpus, "neighbor")
      .join(bucketed(queries, "query"), Seq("__bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("__queryv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("__neighborv"))
    val scored = candidateIds
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("__queryv"), col("__neighborv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
