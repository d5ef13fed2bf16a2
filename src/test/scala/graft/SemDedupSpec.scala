package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** Round-7 curation ops: SemDeDup semantic near-dup pairs/removal, the
  * char-entropy and readability quality signals, TF-IDF keywords, the
  * codegen'd cosine kernel, and the streaming form of the row-local stages.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val e1 = Array(1.0, 0.0)
  private val e2 = Array(0.0, 1.0)

  test("semanticDupPairs pairs only within a cluster, verified by exact cosine") {
    // ids 1,2 near e1 (cosine ~1); id 3 also cluster-e1 but 45 deg off;
    // ids 10,11 near e2 (exact duplicates)
    val df = Seq(
      (1L, Seq(10.0, 0.1)), (2L, Seq(5.0, 0.05)), (3L, Seq(1.0, 0.9)),
      (10L, Seq(0.0, 2.0)), (11L, Seq(0.0, 2.0))).toDF("id", "v")
    val pairs = Dedup.semanticDupPairs(df, "id", "v", Array(e1, e2), threshold = 0.99)
      .select("id_a", "id_b", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (10L, 11L, 1)), pairs)
  }

  test("semanticDupPairs assignment is argmax dot with lowest-index ties") {
    // (1,1) ties both centroids -> cluster 0
    val df = Seq((1L, Seq(1.0, 1.0))).toDF("id", "v")
    import org.apache.spark.sql.GraftColumnBridge
    val c = df.select(GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(col("v")), Array(e1, e2), 1))(0)).head().getInt(0)
    assert(c == 0)
  }

  test("maxClusterSize drops an over-full cluster before the self-join") {
    val big = (1 to 20).map(i => (i.toLong, Seq(1.0, 0.0)))
    val small = Seq((100L, Seq(0.0, 1.0)), (101L, Seq(0.0, 1.0)))
    val df = (big ++ small).toDF("id", "v")
    val pairs = Dedup.semanticDupPairs(df, "id", "v", Array(e1, e2),
      threshold = 0.99, maxClusterSize = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L)), pairs) // cluster 0 (20 rows) guarded away
  }

  test("dedupSemantic drops higher ids of over-threshold pairs") {
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.001)),
      (10L, Seq(0.0, 1.0))).toDF("id", "v")
    val kept = Dedup.dedupSemantic(df, "id", "v", Array(e1, e2), threshold = 0.999)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L), kept)
  }

  test("pqSemanticDupPairs: generous margin reproduces the plain pair set exactly") {
    // clustered 8-dim corpus with planted exact duplicates
    val rnd = new java.util.Random(11)
    val anchors = Array.fill(4)(Array.fill(8)(rnd.nextGaussian() * 10))
    val data = (0 until 300).map { i =>
      val a = anchors(i % 4)
      (i.toLong, a.map(_ + rnd.nextGaussian() * 0.4).toSeq)
    } ++ Seq((1000L, data0Copy(anchors(0))), (1001L, data0Copy(anchors(0))))
    val df = data.toDF("id", "v")
    val cents = Similarity.trainKMeans(
      data.map(_._2.toArray).toArray, 4, seed = 5)
    val model = Pq.train(df, "v", numBlocks = 4, codebookSize = 16,
      trainRows = 400, seed = 7)
    val plain = Dedup.semanticDupPairs(df, "id", "v", cents, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // margin 1.0 disables pruning entirely -> identical output (exact verify
    // is the last word); the planted twins must be in both
    val pq = Dedup.pqSemanticDupPairs(df, "id", "v", cents, model,
      threshold = 0.999, margin = 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pq == plain, s"pq=$pq plain=$plain")
    assert(plain.contains((1000L, 1001L)))
    // a tighter margin can only REMOVE candidates, never invent pairs (the
    // exact-cosine verify is the last word); at 0.1 the well-quantized
    // planted twins survive (their SDC approx cosine is |q(v)|^2/|v|^2)
    val tight = Dedup.pqSemanticDupPairs(df, "id", "v", cents, model,
      threshold = 0.999, margin = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(tight.subsetOf(plain))
    assert(tight.contains((1000L, 1001L)))
    // removal policy matches dedupSemantic under the no-pruning margin
    val keptPlain = Dedup.dedupSemantic(df, "id", "v", cents, threshold = 0.999)
      .select("id").as[Long].collect().toSet
    val keptPq = Dedup.dedupSemanticPq(df, "id", "v", cents, model,
      threshold = 0.999, margin = 1.0)
      .select("id").as[Long].collect().toSet
    assert(keptPq == keptPlain)
  }

  private def data0Copy(a: Array[Double]): Seq[Double] = a.toSeq

  test("pqSemanticDupPairs: margin >= threshold+1 skips the prefilter (unbounded SDC)") {
    // r10 ADVICE regression: the SDC approximate cosine is NOT bounded below
    // for a poorly-fit codebook, so no finite band can guarantee zero
    // pruning. An adversarial codebook sends two near-identical vectors
    // (exact cosine ~0.9998) to centroids with dot -25 -> approx cosine -25.
    val df = Seq((1L, Seq(1.0, 0.01)), (2L, Seq(1.0, -0.01))).toDF("id", "v")
    val cents = Array(Array(1.0, 0.0)) // one cell: both rows pair up
    val bad = Pq.PqModel(2, Array(Array(Array(0.0, 5.0), Array(0.0, -5.0))))
    // banded margin 1.0: approx -25 < 0.95 - 1.0 -> the pair is pruned
    // (this is the actual band bound the doc now states)
    val banded = Dedup.pqSemanticDupPairs(df, "id", "v", cents, bad,
      threshold = 0.95, margin = 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded.isEmpty, banded)
    // margin >= threshold + 1 skips the prefilter entirely -> exact verify
    // is the only decider and the true pair survives any codebook
    val skip = Dedup.pqSemanticDupPairs(df, "id", "v", cents, bad,
      threshold = 0.95, margin = 1.96)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(skip == Set((1L, 2L)), skip)
  }

  test("semanticDupPairsAgainstReference: cross-side pairs only, ref-cell cap, drop policy") {
    // corpus: two near-identical NEW rows (1, 2) + one row shared with the
    // ref (10); ref: rows 10 and 11 (e2-ish)
    val df = Seq(
      (1L, Seq(10.0, 0.1)), (2L, Seq(10.0, 0.1)), (10L, Seq(0.0, 2.0))).toDF("id", "v")
    val ref = Seq((10L, Seq(0.0, 2.0)), (11L, Seq(0.0, 2.0))).toDF("rid", "rv")
    val pairs = Dedup.semanticDupPairsAgainstReference(df, "id", "v", ref, "rid", "rv",
      Array(e1, e2), threshold = 0.99)
      .select("id", "ref_id").as[(Long, Long)].collect().toSet
    // rows 1-2 duplicate EACH OTHER but have no ref neighbor -> NOT emitted
    // (cross-side only); row 10 pairs with both ref copies incl. itself
    assert(pairs == Set((10L, 10L), (10L, 11L)), pairs)
    // drop policy: only semantically-new rows survive
    val kept = Dedup.dropSemanticDupsAgainstReference(df, "id", "v", ref, "rid", "rv",
      Array(e1, e2), threshold = 0.99)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), kept)
    // ref-cell skew cap: an over-full reference cell is skipped entirely
    val bigRef = (100 until 120).map(i => (i.toLong, Seq(0.0, 2.0))).toDF("rid", "rv")
    val capped = Dedup.semanticDupPairsAgainstReference(df, "id", "v", bigRef, "rid", "rv",
      Array(e1, e2), threshold = 0.99, maxCellSize = 10)
      .count()
    assert(capped == 0L)
  }

  test("PqSdcDot: table lookups match brute dot; null conventions") {
    val model = Pq.PqModel(2, Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(2.0, 0.0), Array(0.0, 2.0))))
    val t = Pq.sdcTables(model)
    assert(t(0)(0)(0) == 1.0 && t(0)(0)(1) == 0.0 && t(1)(1)(1) == 4.0)
    val df = Seq(
      (Seq(Option(0), Option(1)), Seq(Option(0), Option(1))), // dot = 1 + 4 = 5
      (Seq(Option(0), Option(1)), Seq(Option(1), Option(0))), // dot = 0 + 0 = 0
      (Seq(Option(0), Option(9)), Seq(Option(0), Option(0))), // out-of-range -> null
      (Seq(Option(0), Option.empty[Int]), Seq(Option(0), Option(0)))) // null elem -> null
      .toDF("a", "b")
    val out = df.select(Pq.sdcDotColumn(col("a"), col("b"), model)).collect()
    assert(out(0).getDouble(0) == 5.0)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("charEntropy: closed forms, empty/null, codegen") {
    val rows = Seq(
      (1L, "aaaa"), (2L, "ab"), (3L, "aabb"), (4L, "")).toDF("id", "t")
      .select(col("id"), TextAnalysis.charEntropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) == 0.0)
    assert(math.abs(rows(2L) - math.log(2)) < 1e-12)
    assert(math.abs(rows(3L) - math.log(2)) < 1e-12)
    assert(rows(4L) == 0.0)
    val n = Seq(Option.empty[String]).toDF("t")
      .select(TextAnalysis.charEntropy(col("t"))).head()
    assert(n.isNullAt(0))
    // stays in whole-stage codegen over a non-foldable input
    val df = spark.range(3).select(TextAnalysis.charEntropy(
      col("id").cast("string")).as("h"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty)
    assert(df.collect().forall(_.getDouble(0) == 0.0)) // single-char strings
  }

  test("charEntropy handles non-BMP code points as single symbols") {
    // U+1F600 twice -> one distinct symbol -> entropy 0
    val s = new String(Character.toChars(0x1F600)) * 2
    val h = Seq(s).toDF("t").select(TextAnalysis.charEntropy(col("t")))
      .head().getDouble(0)
    assert(h == 0.0)
  }

  test("row-local curation signals run unchanged inside a streaming plan") {
    // stripMarkup / charEntropy / lm scoring are row-local expressions: the
    // same projection must work incrementally under readStream (no batch
    // gate, no state) — the streaming form of the curation scan stage
    val dir = java.nio.file.Files.createTempDirectory("curation_stream").toString
    Seq((1L, "<p>hello &amp; world</p>"), (2L, "aa bb aa"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val m = LmModel(0.5, Map("aa" -> 4L, LmModel.Unk -> 2L),
      Map(LmModel.key("aa", LmModel.Unk) -> 1L))
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(dir)
      .select(col("doc_id"),
        TextAnalysis.stripMarkup(col("text")).as("clean"),
        TextAnalysis.charEntropy(coalesce(col("text"), lit(""))).as("h"),
        NgramLm.perplexityColumn(col("text"), m).as("ppl"))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("curation_stream_out").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("curation_stream_out").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "hello & world")
    assert(out(1).getString(1) == "aa bb aa")
    assert(out(1).getDouble(2) > 0.0)
    assert(!out(1).isNullAt(3))
  }

  test("cosine verify stage stays inside whole-stage codegen (kernel, not HOF)") {
    // non-foldable input (range-derived) so the projection can't constant-fold
    val df = spark.range(1)
      .select(array(col("id") + 1.0, lit(0.0)).as("a"),
        array(lit(0.6), lit(0.8)).as("b"))
      .select(graft.pipeline.Similarity.cosine(col("a"), col("b")).as("c"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(math.abs(df.head().getDouble(0) - 0.6) < 1e-12)
    // HOF-parity semantics: length mismatch and null elements poison to null
    val bad = Seq((Seq(1.0, 0.0), Seq(1.0)), (Seq(1.0, 0.0), null))
      .toDF("a", "b")
      .select(graft.pipeline.Similarity.cosine(col("a"), col("b"))).collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("readabilitySignals: closed-form counts and formulas, empty-doc floors") {
    val r = Seq("The quick brown fox. It jumps!").toDF("t")
      .select(TextAnalysis.readabilitySignals(col("t")).as("s"))
      .select("s.*").head()
    // words 6, sentences 2, vowel groups: e,ui,o,o,I,u,(fox 'o' counted),(jumps 'u')
    assert(r.getAs[Int]("n_words") == 6)
    assert(r.getAs[Int]("n_sentences") == 2)
    val words = 6.0; val sent = 2.0; val syl = r.getAs[Int]("n_syllables").toDouble
    val fk = BigDecimal(0.39 * (words / sent) + 11.8 * (syl / words) - 15.59)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("fk_grade") - fk) < 1e-9)
    val empty = Seq("").toDF("t")
      .select(TextAnalysis.readabilitySignals(col("t")).as("s")).select("s.*").head()
    assert(empty.getAs[Int]("n_words") == 0 && empty.getAs[Int]("n_sentences") == 1)
    assert(empty.getAs[Double]("fk_grade") == -15.59)
  }

  test("tfIdfKeywords: rare terms outrank common ones, deterministic ties, k bound") {
    // 'rare' appears once in doc 1 only; 'common' in every doc
    val df = Seq(
      (1L, "common rare common alpha"),
      (2L, "common beta beta"),
      (3L, "common gamma")).toDF("id", "text")
    val out = TextAnalysis.tfIdfKeywords(df, "id", col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toList
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(doc1.head != "common", out) // idf of the everywhere-term is ln(1)=0
    assert(doc1.size == 2)
    // doc 2: beta tf=2 idf=ln(3) outranks common tf=1 idf=0
    assert(out.filter(_._1 == 2L).minBy(_._2)._3 == "beta", out)
    // empty doc emits nothing
    val out2 = TextAnalysis.tfIdfKeywords(
      Seq((9L, "")).toDF("id", "text"), "id", col("text"))
    assert(out2.count() == 0)
  }
}
