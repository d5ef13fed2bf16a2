package graft

import graft.pipeline.{Curation, TextAnalysis}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hash sample is deterministic and roughly proportional") {
    val df = spark.range(0, 10000).toDF("id")
    val a = Curation.hashSample(df, col("id"), 0.25).select("id").as[Long].collect().toSet
    val b = Curation.hashSample(df, col("id"), 0.25).select("id").as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 2500) < 300)
    // monotone: a larger fraction strictly contains a smaller one
    val wider = Curation.hashSample(df, col("id"), 0.5).select("id").as[Long].collect().toSet
    assert(a.subsetOf(wider))
  }

  test("quota sample keeps at most the quota per group, deterministically") {
    val df = Seq.tabulate(500)(i => (i.toLong, if (i % 5 == 0) "a" else "b")).toDF("id", "g")
    val out = Curation.quotaSample(df, Seq("g"), col("id"), quota = 30)
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes("a") == 30 && sizes("b") == 30)
    val again = Curation.quotaSample(df, Seq("g"), col("id"), quota = 30)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // a group smaller than the quota survives whole
    val tiny = Curation.quotaSample(df.where(col("g") === "a"), Seq("g"), col("id"), quota = 1000)
    assert(tiny.count() == 100)
  }

  test("decontaminate flags docs sharing an 8-gram with the eval set, and only those") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"prefix words here $shared suffix tail"), // contaminated: contains the eval 8-gram
      (2L, (1 to 12).map(i => s"c$i").mkString(" ")), // clean
      (3L, shared),                                   // exactly the 8-gram
      (4L, "short doc")                               // < 8 tokens: never contaminated
    ).toDF("doc_id", "text")
    val eval = Seq((100L, s"eval lead-in $shared trailing words pad pad")).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, col("doc_id"), col("text"), eval, col("text"))
      .select("doc_id", "is_contaminated").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("fused wordNgramHashes equals the HOF formulation, null text -> empty") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "exactly eight tokens one two three four five"),
      (3L, "short doc"),
      (4L, null.asInstanceOf[String]),
      (5L, "dup dup dup dup dup dup dup dup dup")
    ).toDF("doc_id", "text")
    val t = split(col("text"), " ")
    val hof = when(size(t) >= 8,
      array_distinct(transform(sequence(lit(1), size(t) - 7),
        i => xxhash64(concat_ws(" ", slice(t, i, lit(8)))))))
      .otherwise(array().cast("array<bigint>"))
    val rows = docs.select(col("doc_id"),
      Curation.wordNgramHashes(col("text"), 8).as("fused"), hof.as("old"))
      .collect()
    rows.foreach { r =>
      val fused = r.getSeq[Long](1).sorted
      val old = r.getSeq[Long](2).sorted
      assert(fused == old, s"doc ${r.getLong(0)}: $fused != $old")
    }
    assert(rows.find(_.getLong(0) == 4L).get.getSeq[Long](1).isEmpty)
  }

  test("repetition signals: clean text low, repeated text high") {
    val df = Seq(
      (1, "one two three four five six seven eight"),
      (2, "spam spam spam spam spam spam spam spam")
    ).toDF("id", "text")
    val r = df.select(col("id"), TextAnalysis.repetitionSignals(col("text")).as("r"))
      .select(col("id"), col("r.dup_word_frac"), col("r.top_word_frac"), col("r.dup_2gram_frac"))
      .as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    assert(r(0) == ((1, 0.0, 1.0 / 8, 0.0)))
    assert(r(1)._2 == 7.0 / 8 && r(1)._3 == 1.0 && r(1)._4 == 1.0 - 1.0 / 7)
    assert(df.where(TextAnalysis.repetitionFilter(col("text"))).select("id").as[Int].collect().toSeq == Seq(1))
  }

  test("chunking covers every token, respects overlap, single chunk for short docs") {
    val doc = (1 to 30).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "text", chunkSize = 16, overlap = 4)
      .select("doc_id", "chunk_id", "chunk_text").as[(Long, Int, String)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // starts 1, 13, 25 (stride 12): chunk 0 = t1..t16, chunk 1 = t13..t28, chunk 2 = t25..t30
    assert(d1.length == 3)
    assert(d1(0).startsWith("t1 ") && d1(0).endsWith(" t16"))
    assert(d1(1).startsWith("t13 ") && d1(1).endsWith(" t28"))
    assert(d1(2) == (25 to 30).map(i => s"t$i").mkString(" "))
    // every token appears in some chunk
    assert(d1.flatMap(_.split(" ")).toSet == (1 to 30).map(i => s"t$i").toSet)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c")))
  }

  test("document frequency counts docs, not occurrences") {
    val df = Seq((1, "a a a b"), (2, "a c"), (3, "c c")).toDF("id", "text")
    val got = TextAnalysis.documentFrequency(df, col("text"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2, "b" -> 1, "c" -> 2))
  }

  test("normalizeText collapses case, control chars and whitespace") {
    val df = Seq((1, "  Hello\tWorld  \n  AGAIN ")).toDF("id", "text")
    val got = df.select(TextAnalysis.normalizeText(col("text"))).as[String].head()
    assert(got == "hello world again")
  }

  test("c4 line rules: terminal punctuation, word minimum, javascript warning, page flags") {
    val page = Seq(
      "This is a proper sentence with words.",
      "Is this kept as well?",          // terminal '?' + 5 words -> kept
      "She said \"stop here.\"",        // closing quote after '.' -> kept
      "no terminal punctuation here",   // dropped
      "Too short.",                     // 2 words -> dropped
      "Please enable javascript now.",  // javascript warning -> dropped
      "if (x) { return; }"              // dropped line; page flagged for '{'
    ).mkString("\n")
    val df = Seq((1, page), (2, "lorem ipsum dolor sit amet."), (3, null.asInstanceOf[String]))
      .toDF("id", "text")
    val rows = df.select(col("id"), TextAnalysis.c4Signals(col("text")).as("s"),
        TextAnalysis.c4Keep(col("text")).as("keep"),
        TextAnalysis.c4CleanedText(col("text")).as("cleaned"))
      .orderBy("id").collect()
    val s1 = rows(0).getStruct(1)
    assert(s1.getAs[Int]("n_lines") == 7)
    assert(s1.getAs[Int]("n_kept_lines") == 3)
    assert(s1.getAs[Int]("n_sentences") == 3)
    assert(!s1.getAs[Boolean]("has_lorem_ipsum"))
    assert(s1.getAs[Boolean]("has_curly_brace") && s1.getAs[Boolean]("has_javascript_line"))
    assert(!rows(0).getAs[Boolean]("keep")) // curly brace + only 3 sentences
    assert(rows(0).getAs[String]("cleaned") ==
      "This is a proper sentence with words.\nIs this kept as well?\nShe said \"stop here.\"")
    val s2 = rows(1).getStruct(1)
    assert(s2.getAs[Boolean]("has_lorem_ipsum") && !rows(1).getAs[Boolean]("keep"))
    val s3 = rows(2).getStruct(1) // null text behaves as empty page
    assert(s3.getAs[Int]("n_kept_lines") == 0 && !rows(2).getAs[Boolean]("keep"))
  }

  test("c4Keep requires the sentence minimum after line cleaning") {
    val five = (1 to 5).map(i => s"Sentence number $i is fine.").mkString("\n")
    val four = (1 to 4).map(i => s"Sentence number $i is fine.").mkString("\n")
    val df = Seq((1, five), (2, four)).toDF("id", "text")
    val keep = df.select(col("id"), TextAnalysis.c4Keep(col("text")).as("k"))
      .as[(Int, Boolean)].collect().toMap
    assert(keep(1) && !keep(2))
  }

  test("sampleToTokenBudget: hash-order prefix, strict ceiling, group budgets") {
    // tokens per doc = 10; hash order decides WHICH docs fill the budget
    val docs = (1L to 20L).map(i => (i, Seq.fill(10)("w").mkString(" "))).toDF("doc_id", "text")
    def hashOf(id: Long): Long = (id % 2147483648L) * 2654435761L % 4294967296L
    val order = (1L to 20L).sortBy(i => (hashOf(i), i))
    // budget 55 -> exactly the first 5 docs in hash order (50 tokens; the
    // 6th would reach 60 > 55 and is dropped: strict ceiling)
    val kept = Curation.sampleToTokenBudget(docs,
      TextAnalysis.tokenCount(col("text")), col("doc_id"), 55L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == order.take(5).toSet, s"kept=$kept expected=${order.take(5)}")
    // partition-count independence: same answer from 1 and 13 partitions
    val kept13 = Curation.sampleToTokenBudget(docs.repartition(13),
      TextAnalysis.tokenCount(col("text")), col("doc_id"), 55L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept13 == kept)
    // zero budget keeps nothing; huge budget keeps everything
    assert(Curation.sampleToTokenBudget(docs, TextAnalysis.tokenCount(col("text")),
      col("doc_id"), 0L).count() == 0)
    assert(Curation.sampleToTokenBudget(docs, TextAnalysis.tokenCount(col("text")),
      col("doc_id"), 1000L).count() == 20)
    // per-group: each group gets its own 25-token budget (2 docs per group)
    val grouped = docs.withColumn("g", col("doc_id") % 2)
    val byGroup = Curation.sampleToTokenBudget(grouped,
      TextAnalysis.tokenCount(col("text")), col("doc_id"), 25L, Seq("g"))
      .groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(byGroup == Map(0L -> 2L, 1L -> 2L), byGroup.toString)
    // null text counts as zero tokens and survives inside the budget
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, "a b c")).toDF("doc_id", "text")
    val nullKept = Curation.sampleToTokenBudget(withNull,
      TextAnalysis.tokenCount(col("text")), col("doc_id"), 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(nullKept == Set(1L, 2L))
  }

  test("sampleByWeights keeps per-group fractions: 0 drops all, 1 keeps all") {
    val df = Seq.tabulate(3000) { i =>
      (i.toLong, Seq("keep", "drop", "half")(i % 3))
    }.toDF("id", "src")
    val out = Curation.sampleByWeights(df, col("src"),
      Map("keep" -> 1.0, "drop" -> 0.0, "half" -> 0.5), col("id"))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(out("keep") == 1000)
    assert(!out.contains("drop"))
    assert(math.abs(out("half") - 500) < 120)
    // unlisted groups fall back to the default weight
    val defaulted = Curation.sampleByWeights(df, col("src"),
      Map("drop" -> 0.0), col("id"), defaultWeight = 1.0)
    assert(defaulted.count() == 2000)
  }

  test("packSequences: next-fit bins respect the budget, oversized docs get their own bin") {
    val df = Seq(
      (0L, 600L), (8L, 600L), (16L, 600L), (24L, 600L), // one group? no — hashed groups
      (1L, 5000L), // heavier than budget -> own bin
      (2L, 100L), (3L, 100L)
    ).toDF("doc_id", "n_tok")
    val out = Curation.packSequences(df, "doc_id", col("n_tok"), budget = 1000, numGroups = 1)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toList
    // single group -> global next-fit in doc_id order:
    // 0(600) -> bin0(600); 1(5000) -> bin1; 2(100) -> bin2(100); 3(100) -> bin2(200);
    // 8(600) -> bin2(800); 16(600) -> bin3; 24(600) -> bin4
    val bins = out.map { case (id, _, bin) => id -> bin }.toMap
    assert(bins(0L) == 0 && bins(1L) == 1 && bins(2L) == 2 && bins(3L) == 2)
    assert(bins(8L) == 2 && bins(16L) == 3 && bins(24L) == 4)
    // bin totals never exceed the budget unless the bin is a single oversized doc
    val totals = df.as[(Long, Long)].collect().toMap
    out.groupBy { case (_, g, bin) => (g, bin) }.foreach { case (_, docs) =>
      val tot = docs.map(d => totals(d._1)).sum
      assert(tot <= 1000 || docs.size == 1)
    }
    // determinism across numGroups for group membership: every doc appears once
    val multi = Curation.packSequences(df, "doc_id", col("n_tok"), budget = 1000, numGroups = 4)
    assert(multi.count() == df.count())
    assert(multi.select("doc_id").distinct().count() == df.count())
  }

  test("epochMix preserves caller columns named pos/col") {
    val df = Seq((1L, "en", 7, "keep")).toDF("doc_id", "lang", "pos", "col")
    val out = Curation.epochMix(df, col("lang"), Map("en" -> 2.0), col("doc_id"))
    assert(out.columns.toSet == Set("doc_id", "lang", "pos", "col", "epoch_copy"))
    val rows = out.select("pos", "col", "epoch_copy").collect()
    assert(rows.length == 2 && rows.forall(r => r.getInt(0) == 7 && r.getString(1) == "keep"))
  }

  test("epochMix repeats floor(w) times plus the salted fractional draw, zero shuffle") {
    val df = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "fr"), (5L, "en"))
      .toDF("doc_id", "lang")
    val out = Curation.epochMix(df, col("lang"),
      Map("en" -> 2.5, "de" -> 0.0), col("doc_id"))
    def salted(id: Long): Long =
      ((id % 2147483648L + Curation.EpochMixSalt) % 2147483648L) * 2654435761L % 4294967296L
    def expectedReps(id: Long, lang: String): Long = lang match {
      case "en" => 2L + (if (salted(id) < 2147483648L) 1L else 0L)
      case "de" => 0L
      case _ => 1L
    }
    val got = out.select("doc_id", "epoch_copy").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    for ((id, lang) <- Seq(1L -> "en", 2L -> "en", 3L -> "de", 4L -> "fr", 5L -> "en")) {
      val n = expectedReps(id, lang)
      assert(got.getOrElse(id, Seq.empty) == (0L until n), s"doc $id")
    }
    // both expanded doc 1 (2 or 3 copies) and dropped doc 3 exercised
    assert(got.contains(1L) && !got.contains(3L))
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
  }

  test("shardAssign: shard in range, salted order hash, deterministic, plan-local") {
    val df = spark.range(0, 500).toDF("doc_id")
    val out = Curation.shardAssign(df, col("doc_id"), 8)
    val rows = out.select("doc_id", "shard", "shard_order").as[(Long, Long, Long)].collect()
    assert(rows.length == 500)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 8 })
    // every shard populated and the order hash spreads (no global collisions here)
    assert(rows.map(_._2).distinct.length == 8)
    assert(rows.map(_._3).distinct.length == 500)
    val again = Curation.shardAssign(df, col("doc_id"), 8)
      .select("doc_id", "shard", "shard_order").as[(Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
  }

  test("decontaminateSemantic flags near-eval embeddings, never NaN, never shuffles the corpus") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),   // exact eval member direction
      (2L, Seq(2.0, 0.0, 0.0)),   // scaled copy -> cosine 1
      (3L, Seq(0.0, 1.0, 0.0)),   // orthogonal -> clean
      (4L, Seq(0.9, 0.1, 0.0)),   // close but below 0.999
      (5L, Seq(0.0, 0.0, 0.0))    // zero norm -> NaN sim -> must stay clean
    ).toDF("id", "v")
    val eval = Seq(Tuple1(Seq(1.0, 0.0, 0.0))).toDF("ev")
    val out = Curation.decontaminateSemantic(corpus, col("id"), col("v"),
      eval, col("ev"), threshold = 0.999)
    val flags = out.select("id", "is_contaminated").as[(Long, Boolean)].collect().toMap
    assert(flags == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> false))
    // the corpus side never shuffles: the eval probe is a broadcast
    // nested-loop semi join and the flag comes back via a broadcast hash
    // join (the only exchange in the plan is the tiny matched-id distinct)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
