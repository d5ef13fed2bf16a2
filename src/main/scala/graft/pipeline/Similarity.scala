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

  /** Exact cosine similarity between two `array<double>` columns — a fused
    * codegen'd kernel ([[CosineSimilarity]]/[[SketchOps.cosineSim]]). The
    * pre-r7 zip_with/aggregate HOF formulation was CodegenFallback (Spark
    * HOFs don't participate in whole-stage codegen) and de-codegen'd every
    * cosine verify stage; the kernel keeps its exact semantics (null
    * poisoning on length mismatch or null elements, left-to-right
    * accumulation) at ~3x the throughput.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    // cast is identity (removed by SimplifyCasts) for array<double> inputs;
    // float arrays upcast once — products then accumulate in full double
    // precision (the old HOF path rounded each product to float first)
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a.cast("array<double>")),
      GraftColumnBridge.expression(b.cast("array<double>"))))
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

  // (the old hyperplaneBucket Column helper is gone: its zip_with/aggregate
  // HOF chain was CodegenFallback; [[HyperplaneBuckets]] is the codegen'd
  // replacement every caller migrated to in r5)

  /** Driver-side spherical k-means (Lloyd over cosine similarity) for the IVF
    * coarse quantizer: trains on a small sample, like the IsolationForest
    * pattern — the model is kilobytes and broadcasts inside an expression.
    */
  def trainKMeans(sample: Array[Array[Double]], numCentroids: Int,
                  iterations: Int = 10, seed: Long = 42L): Array[Array[Double]] = {
    require(sample.nonEmpty, "no rows to train the IVF quantizer")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val data = sample.map(normalize)
    val k = math.min(numCentroids, data.length)
    val rnd = new scala.util.Random(seed)
    var centroids = rnd.shuffle(data.indices.toVector).take(k).map(data).toArray
    for (_ <- 0 until iterations) {
      val sums = Array.fill(k)(new Array[Double](data.head.length))
      val counts = new Array[Int](k)
      data.foreach { v =>
        var best = 0; var bestSim = Double.MinValue
        var c = 0
        while (c < k) {
          var dot = 0.0; var j = 0
          val cen = centroids(c)
          val d = math.min(v.length, cen.length)
          while (j < d) { dot += v(j) * cen(j); j += 1 }
          if (dot > bestSim) { bestSim = dot; best = c }
          c += 1
        }
        var j = 0
        while (j < v.length && j < sums(best).length) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c))
      }
    }
    centroids
  }

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path next
    * to [[lshTopK]]: a driver-trained coarse quantizer assigns every corpus
    * row to its nearest centroid (row-local, no shuffle), queries probe their
    * `nprobe` nearest centroid lists, and the candidate join is an equi-join
    * on centroid id (corpus shuffles once on a key with `numCentroids`
    * distinct values — size partitions accordingly). Candidates are
    * exact-cosine ranked; recall rises with `nprobe`, and
    * nprobe = numCentroids degenerates to exact brute force (the oracle
    * setting). Batch-only: training is a driver action, like D1/D15.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, numCentroids: Int = 64, nprobe: Int = 8,
              trainRows: Int = 10000, iterations: Int = 10,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val sample = corpus.select(col(vecCol).cast("array<double>").as("__v"))
      .limit(trainRows).collect().map(_.getSeq[Double](0).toArray)
    val centroids = trainKMeans(sample, numCentroids, iterations, seed)
    val probes = math.min(nprobe, centroids.length)
    def assigned(df: DataFrame, side: String, n: Int): DataFrame = {
      val base = df.select(col(idCol).as(s"${side}_id"),
        col(vecCol).cast("array<double>").as(s"__${side}v"))
      val cents = GraftColumnBridge.column(NearestCentroids(
        GraftColumnBridge.expression(col(s"__${side}v")), centroids, n))
      base.select(col(s"${side}_id"), explode(cents).as("__cent"))
    }
    val candidateIds = assigned(corpus, "neighbor", 1)
      .join(broadcast(assigned(queries, "query", probes)), Seq("__cent"))
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
