package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity}

/** Scratch diagnostics for designing the simhash / knn_lsh / iforest oracle
  * gates: prints the planted-pair jaccard-vs-hamming distribution and LSH
  * containment stats on sf0.01 so the gate thresholds are evidence-based.
  */
object OracleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val toksRaw = split(col("text"), " ")
    val keepN = greatest((size(toksRaw) * 8) / 10, lit(3))
    val pert = docs.where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat_ws(" ", slice(toksRaw, lit(1), keepN)).as("text"))
    val planted = docs.unionByName(pert)

    // all pairs emitted by simhash, with exact distinct-token jaccard
    val pairs = Dedup.simHashDuplicatePairs(planted, "doc_id", "text", maxHamming = 3)
    val tk = planted.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tk"))
    val j = pairs
      .join(tk.select(col("doc_id").as("id_a"), col("tk").as("tk_a")), "id_a")
      .join(tk.select(col("doc_id").as("id_b"), col("tk").as("tk_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))))
      .withColumn("uni", size(col("tk_a")) + size(col("tk_b")) - col("inter"))
      .withColumn("jac", col("inter").cast("double") / col("uni"))
      .withColumn("is_planted", col("id_b") === col("id_a") + 100000)
    println("=== emitted simhash pairs (id_a, id_b, hamming, jac, planted) ===")
    j.select("id_a", "id_b", "hamming", "jac", "is_planted")
      .orderBy("jac").show(60, false)

    // ALL planted pairs: jaccard + whether simhash found them
    val plantedPairs = docs.where(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))
    val found = pairs.select(col("id_a"), col("id_b"), lit(true).as("found"))
    val pp = plantedPairs
      .join(tk.select(col("doc_id").as("id_a"), col("tk").as("tk_a")), "id_a")
      .join(tk.select(col("doc_id").as("id_b"), col("tk").as("tk_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))))
      .withColumn("uni", size(col("tk_a")) + size(col("tk_b")) - col("inter"))
      .withColumn("jac", col("inter").cast("double") / col("uni"))
      .join(found, Seq("id_a", "id_b"), "left")
      .withColumn("found", coalesce(col("found"), lit(false)))
    println("=== planted pairs: jac vs found ===")
    pp.select("id_a", "jac", "found").orderBy("jac").show(60, false)

    // knn_lsh containment: for each query, are the 5 LSH neighbors inside
    // exact brute-force top-20? and does each query get exactly 5?
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val lsh = Similarity.lshTopK(emb, emb.where(col("vec_id") < 20), "vec_id", "embedding",
      5, planes = 6, tables = 6, dim = 64)
    val embD = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val bf = Similarity.bruteForceTopK(embD, embD.where(col("vec_id") < 20), "vec_id", "embedding", 20)
      .select("query_id", "neighbor_id")
    val outside = lsh.join(bf, Seq("query_id", "neighbor_id"), "left_anti")
    println("=== lsh: per-query neighbor count ===")
    lsh.groupBy("query_id").count().orderBy("query_id").show(25)
    println("=== lsh: neighbors outside exact top-20 ===")
    outside.orderBy("query_id").show(120, false)
    spark.stop()
  }
}
