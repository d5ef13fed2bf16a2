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

  /** time() plus a stderr marker so a dead run identifies its op. */
  private def timed(name: String)(f: => Unit): Double = {
    System.err.println(s"[pipebench] $name")
    time(f)
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
      "exact_dedup" -> timed("exact_dedup")(
        Dedup.dedupExact(docs, Seq(col("text")), col("doc_id")).count()),
      "dedup_lines" -> timed("dedup_lines")(
        Dedup.dedupLines(docs, "doc_id", "text", sep = " ").count()),
      "minhash_pairs" -> timed("minhash_pairs")(
        Dedup.minHashDuplicatePairs(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8).count()),
      "duplicate_spans" -> timed("duplicate_spans")(
        Dedup.duplicateSpans(docs, "doc_id", "text", windowWords = 8).count()),
      "remove_spans" -> timed("remove_spans")(
        Dedup.removeDuplicateSpans(docs, "doc_id", "text", windowWords = 8)
          .agg(sum(length(col("text")))).collect()),
      "simhash_pairs" -> timed("simhash_pairs")(
        Dedup.simHashDuplicatePairs(docs, "doc_id", "text", maxHamming = 3).count()),
      "decontaminate" -> timed("decontaminate")(
        Curation.decontaminate(docs, col("doc_id"), col("text"),
          evalSet, col("text"), n = 8).where(col("is_contaminated")).count()),
      "pack_sequences" -> timed("pack_sequences")(
        Curation.packSequences(docs, "doc_id", length(col("text")), budget = 4096,
          numGroups = 256).agg(max("bin_id")).collect()),
      "bm25_topk" -> timed("bm25_topk")(
        Search.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", k = 10).count()),
      "quality_train_5ep" -> timed("quality_train_5ep")(
        QualityClassifier.train(docs.withColumn("label", (col("doc_id") % 2).cast("double")),
          col("text"), col("label"), vocabSize = 4096, epochs = 5)),
      "quality_score" -> timed("quality_score")(
        QualityClassifier.score(docs, col("text"),
          QualityModel(0.0, Map("w1" -> 1.0, "w2" -> -1.0)))
          .agg(sum("quality_score")).collect()),
      "corpus_stats" -> timed("corpus_stats")(TextAnalysis.corpusStats(docs, col("text")).collect()),
      "bpe_train_256" -> timed("bpe_train_256")(Bpe.train(docs, col("text"), numMerges = 256)),
      "bpe_count" -> {
        System.err.println("[pipebench] bpe_count")
        val m = Bpe.train(docs, col("text"), numMerges = 256)
        time(docs.agg(sum(Bpe.countColumn(col("text"), m))).collect())
      },
      "lm_train_8k" -> timed("lm_train_8k")(
        NgramLm.train(docs, col("text"), vocabSize = 8192, maxBigrams = 262144)),
      "lm_score" -> timed("lm_score")(
        NgramLm.score(docs, col("text"), LmModel(0.5,
          Map("w1" -> 100L, "w2" -> 40L, LmModel.Unk -> 1000L),
          Map(LmModel.key("w1", "w2") -> 10L)))
          .agg(sum("lm_perplexity")).collect()),
      "strip_markup" -> timed("strip_markup")(
        docs.select(TextAnalysis.stripMarkup(
          concat(lit("<html><body><p>"), col("text"),
            lit(" &amp; tail</p><script>var x=1;</script></body></html>")))
          .as("clean")).agg(sum(length(col("clean")))).collect()),
      "char_entropy" -> timed("char_entropy")(
        docs.agg(sum(TextAnalysis.charEntropy(col("text")))).collect()),
      "stratified_split" -> timed("stratified_split")(
        Curation.stratifiedSplit(docs.withColumn("grp", col("doc_id") % 20),
          Seq("grp"), col("doc_id"), 0.1)
          .where(col("split") === "val").count()),
      // cross-snapshot incremental dedup: "yesterday" = every 3rd doc (~333k
      // ref keys); ~1/3 of today bloom-hits and takes the confirm anti-join,
      // the rest is a row-local probe
      "dedup_incremental" -> timed("dedup_incremental")(
        Dedup.dedupAgainstReference(docs, col("text"),
          docs.where(col("doc_id") % 3 === 0), col("text")).count()),
      // cross-snapshot near-dup: ref = 90%-truncated rewrites of every 20th
      // doc (~50k); candidates only from cross-side band collisions
      "neardup_incremental" -> {
        System.err.println("[pipebench] neardup_incremental")
        val toks = split(col("text"), " ")
        val ref = docs.where(col("doc_id") % 20 === 0)
          .select((col("doc_id") + nDocs).as("doc_id"),
            concat_ws(" ", slice(toks, lit(1), greatest((size(toks) * 9) / 10, lit(3)))).as("text"))
        time(Dedup.nearDupPairsAgainstReference(docs, "doc_id", "text",
          ref, "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16,
          threshold = 0.8).count())
      },
      "dsir_train_4k" -> timed("dsir_train_4k")(
        Dsir.train(evalSet, docs, col("text"), features = 4096)),
      "dsir_score_resample" -> timed("dsir_score_resample") {
        val m = DsirModel(1.0, Map("w1 w2" -> 30L), Map("w1 w2" -> 10L),
          40L, 1000L, 8L, 950L)
        val scored = Dsir.score(docs, col("text"), m)
        Dsir.resample(scored, col("doc_id"), col("dsir_log_importance"), 0.0).count()
        ()
      },
      "gopher_filter" -> timed("gopher_filter")(
        docs.where(TextAnalysis.gopherFilter(col("text"), minWords = 10)).count()),
      "blocklist_filter" -> timed("blocklist_filter")(
        docs.where(TextAnalysis.blocklistFilter(col("text"),
          Seq("w1", "w2", "w3", "w4"), maxRatio = 0.01)).count()),
      "url_canonical_dedup" -> {
        System.err.println("[pipebench] url_canonical_dedup")
        // ~10 raw URLs per page (www/port/tracking variants via doc_id % 10)
        val urls = docs.select(col("doc_id"),
          concat(lit("http://"),
            when(col("doc_id") % 2 === 0, "www.").otherwise(""),
            lit("site"), (col("doc_id") / 10).cast("long").cast("string"),
            lit(".com/p"),
            when(col("doc_id") % 3 === 0, "/?utm_source=x&a=1").otherwise("")).as("url"))
        time(UrlAnalysis.dedupByCanonicalUrl(urls, "url", col("doc_id")).count())
      },
      "unigram_train_4k" -> timed("unigram_train_4k")(
        Unigram.train(docs, col("text"), vocabSize = 4096, maxPieceLen = 6)),
      "unigram_count" -> {
        System.err.println("[pipebench] unigram_count")
        val m = Unigram.train(docs, col("text"), vocabSize = 4096, maxPieceLen = 6)
        time(docs.agg(sum(Unigram.countColumn(col("text"), m))).collect())
      },
      "langid_train" -> timed("langid_train")(
        LangId.train(docs.withColumn("lang",
          when(col("doc_id") % 2 === 0, "en").otherwise("de")),
          col("text"), col("lang"), n = 3, vocabPerLang = 4096)),
      "langid_predict" -> {
        System.err.println("[pipebench] langid_predict")
        val m = LangId.train(docs.limit(10000).withColumn("lang",
          when(col("doc_id") % 2 === 0, "en").otherwise("de")),
          col("text"), col("lang"), n = 3, vocabPerLang = 4096)
        time(docs.select(LangId.predictColumn(col("text"), m).as("l"))
          .groupBy("l").count().collect())
      },
      // SemDeDup probed at 250k docs: the within-cluster exact step is
      // inherently sum(|cluster|^2), so the centroid count must scale with
      // the corpus — 2048 centroids over 250k docs keeps clusters ~122 docs
      // (~15M verified pairs total). doc_id % 2048 picks one of 2048
      // deterministic directions; every cluster's docs are near-parallel.
      "semantic_dedup_250k" -> {
        System.err.println("[pipebench] semantic_dedup_250k")
        val nSem = math.min(nDocs, 250000L)
        val dim = 16
        // SIGNED components (no abs): all-positive vectors would crowd one
        // orthant, correlate the directions, and skew the argmax assignment
        val dirs = Array.tabulate(2048) { g =>
          val v = Array.tabulate(dim)(j => math.sin(g * 131 + j * 17))
          val norm = math.sqrt(v.map(x => x * x).sum)
          v.map(_ / norm)
        }
        // j runs 0..dim-1 to mirror the driver-side Array.tabulate indexing
        val vecExpr = transform(sequence(lit(0), lit(dim - 1)), j =>
          sin(col("doc_id") % 2048 * 131 + j.cast("double") * 17) +
            (pmod(hash(col("doc_id") * 31 + j), lit(1000)).cast("double") / 1e7))
        val emb = corpus(spark, nSem)
          .select(col("doc_id"), vecExpr.as("v")).localCheckpoint()
        time(Dedup.semanticDupPairs(emb, "doc_id", "v", dirs,
          threshold = 0.999, maxClusterSize = 10000).count())
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
