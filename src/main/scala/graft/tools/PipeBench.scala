package graft.tools

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-operator benchmark at 1M documents — the scale probe for the
  * LLM-curation ops (the sf0.1 documents fixture is only 5k docs, which
  * measures fixed overhead, not scale shape). The corpus is generated
  * in-plan (codegen'd, deterministic, no RNG): ~50-word docs over a 10k-word
  * vocabulary; every block of 1000 ids plants a 10-doc exact-dup group
  * (same text seed), and every 10th doc gets a shared 12-word boilerplate
  * tail (the exact-substring span target).
  *
  * Usage: SPARK_GRAFT_PIPE_DOCS=1000000 runMain graft.tools.PipeBench
  */
object PipeBench {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private val Boiler = "subscribe to our newsletter today for offers updates deals news and more"

  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    // text seed: dup groups share a seed -> identical word sequences
    val seed = when(col("id") % 1000 < 10, (col("id") - col("id") % 1000) * 7919)
      .otherwise(col("id") * 7919)
    val words = transform(sequence(lit(1), lit(48) + (col("id") % 5).cast("int")),
      i => concat(lit("w"), pmod(hash(seed + i * 131), lit(10000))))
    spark.range(0, nDocs, 1, 32).select(
      col("id").as("doc_id"),
      when(col("id") % 10 === 0, concat_ws(" ", flatten(array(words, split(lit(Boiler), " ")))))
        .otherwise(concat_ws(" ", words)).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.get("SPARK_GRAFT_PIPE_DOCS").map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = corpus(spark, nDocs).localCheckpoint() // materialize once: ops measure themselves, not the generator
    val n = docs.count()

    val evalSet = docs.where(col("doc_id") % 997 === 3) // ~0.1% "benchmark"
    val queries = {
      import spark.implicits._
      Seq.tabulate(5)(i => (s"q$i", s"w${i * 7} w${i * 13 + 1} w${i * 29 + 2}"))
        .toDF("qid", "qtext")
    }

    val results = Seq(
      "exact_dedup" -> time(
        Dedup.dedupExact(docs, Seq(col("text")), col("doc_id")).count()),
      "dedup_lines" -> time(
        Dedup.dedupLines(docs, "doc_id", "text", sep = " ").count()),
      "minhash_pairs" -> time(
        Dedup.minHashDuplicatePairs(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8).count()),
      "duplicate_spans" -> time(
        Dedup.duplicateSpans(docs, "doc_id", "text", windowWords = 8).count()),
      "remove_spans" -> time(
        Dedup.removeDuplicateSpans(docs, "doc_id", "text", windowWords = 8)
          .agg(sum(length(col("text")))).collect()),
      "simhash_pairs" -> time(
        Dedup.simHashDuplicatePairs(docs, "doc_id", "text", maxHamming = 3).count()),
      "decontaminate" -> time(
        Curation.decontaminate(docs, col("doc_id"), col("text"),
          evalSet, col("text"), n = 8).where(col("is_contaminated")).count()),
      "pack_sequences" -> time(
        Curation.packSequences(docs, "doc_id", length(col("text")), budget = 4096,
          numGroups = 256).agg(max("bin_id")).collect()),
      "bm25_topk" -> time(
        Search.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", k = 10).count()),
      "quality_train_5ep" -> time(
        QualityClassifier.train(docs.withColumn("label", (col("doc_id") % 2).cast("double")),
          col("text"), col("label"), vocabSize = 4096, epochs = 5)),
      "quality_score" -> time(
        QualityClassifier.score(docs, col("text"),
          QualityModel(0.0, Map("w1" -> 1.0, "w2" -> -1.0)))
          .agg(sum("quality_score")).collect()),
      "corpus_stats" -> time(TextAnalysis.corpusStats(docs, col("text")).collect()),
      "bpe_train_256" -> time(Bpe.train(docs, col("text"), numMerges = 256)),
      "bpe_count" -> {
        val m = Bpe.train(docs, col("text"), numMerges = 256)
        time(docs.agg(sum(Bpe.countColumn(col("text"), m))).collect())
      })

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    println(f"""{"metric":"pipe_total","value":${results.map(_._2).sum}%.2f,"unit":"sec","n_docs":$n,"ops":$qs}""")

    // bm25 branch sweep (VERDICT r6 "Next #8"): literal-filter vs broadcast
    // semi-join at 64/256/1024 distinct query terms. Query terms drawn from
    // the corpus vocabulary so they actually match documents.
    if (sys.env.get("SPARK_GRAFT_BM25_SWEEP").contains("1")) {
      import spark.implicits._
      Seq(64, 256, 1024).foreach { nTerms =>
        val sweepQueries = (0 until nTerms).grouped(32).zipWithIndex.map { case (g, qi) =>
          (s"q$qi", g.map(t => s"w${(t * 31) % 10000}").mkString(" "))
        }.toSeq.toDF("qid", "qtext")
        val tLit = time(Search.bm25TopK(docs, "doc_id", "text", sweepQueries,
          "qid", "qtext", k = 10, termFilterThreshold = 100000).count())
        val tSemi = time(Search.bm25TopK(docs, "doc_id", "text", sweepQueries,
          "qid", "qtext", k = 10, termFilterThreshold = 0).count())
        println(f"""{"metric":"bm25_sweep","terms":$nTerms,"literal_filter_sec":$tLit%.2f,"semi_join_sec":$tSemi%.2f}""")
      }
    }
    spark.stop()
  }
}
