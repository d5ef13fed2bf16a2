package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.pipeline._

/** The sketch expressions and generators must participate in whole-stage
  * codegen: one CodegenFallback in a projection de-codegens every sibling
  * expression, and a CodegenFallback Generator forces GenerateExec out of
  * codegen entirely. These tests pin (a) plans containing each sketch
  * expression keep a WholeStageCodegen span over it, and (b) the codegen'd
  * results equal the interpreted kernels bit-for-bit.
  */
class SketchCodegenSpec extends SparkSpec {
  import spark.implicits._

  // RDD-backed so ConvertToLocalRelation can't fold the projection away —
  // the point of the suite is to inspect the physical plan.
  private def docs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with other tokens here"),
    (4L, "")
  ), 2)).toDF("doc_id", "text")

  /** All physical operators inside WholeStageCodegen spans. */
  private def codegenned(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case w: WholeStageCodegenExec =>
      w.child.collect { case n => n.nodeName }
    }.flatten
  }

  test("SimHash64 projection stays inside WholeStageCodegen") {
    val df = docs.select(
      col("doc_id"),
      GraftColumnBridge.column(SimHash64(
        GraftColumnBridge.expression(split(col("text"), " ")))).as("sh"))
    assert(codegenned(df).contains("Project"), df.queryExecution.executedPlan.toString)
    // codegen'd vs interpreted kernel agreement
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.collect().map { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))
      r.getLong(0) -> SketchOps.simhash64(arr)
    }.toMap
    // split("", " ") yields [""], not [] — hash of the singleton empty token
    assert(rows(1L) == expected(1L) && rows(2L) == expected(2L) && rows(3L) == expected(3L))
    assert(rows(1L) != rows(3L))
  }

  test("MinHashSignature is codegen'd and bit-identical to the HOF formulation") {
    val hsh = GraftColumnBridge.column(HashedShingles(
      GraftColumnBridge.expression(col("text")), 3))
    val numHashes = 64
    // the formulation MinHashSignature replaced: numHashes interpreted
    // higher-order functions — kept here as the semantic reference
    val hof = array((0 until numHashes).map { seed =>
      array_min(transform(hsh, h => xxhash64(lit(seed), h)))
    }: _*)
    val df = docs.where(length(col("text")) > 0).select(
      col("doc_id"),
      graft.pipeline.Dedup.minHashSignature(hsh, numHashes).as("fast"),
      hof.as("ref"))
    assert(codegenned(df.select("doc_id", "fast")).contains("Project"),
      df.select("doc_id", "fast").queryExecution.executedPlan.toString)
    df.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
    // null text -> null signature (whole array), like the HOF on a null child
    val nulls = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Tuple1(null: String)), 1)).toDF("text")
      .select(graft.pipeline.Dedup.minHashSignature(
        GraftColumnBridge.column(HashedShingles(
          GraftColumnBridge.expression(col("text")), 3)), 8).as("sig"))
      .collect()
    assert(nulls.head.isNullAt(0))
  }

  test("WsTokens/WordBigrams are codegen'd and byte-identical to the HOF formulations") {
    val fixtures = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (1L, "The quick  Brown fox"),        // double space -> empty segment dropped
      (2L, " leading and trailing "),      // edge empties
      (3L, ""),                            // empty text
      (4L, null: String),                  // null text
      (5L, "ÄØÇ Straße İstanbul ΣΙΓΜΑ"),   // unicode lowercasing
      (6L, "single"),                      // < 2 tokens -> no bigrams
      (7L, "a\tb\nc d")                    // tabs/newlines are NOT separators
    ), 2)).toDF("id", "text")
    val hofTokens = filter(split(lower(coalesce(col("text"), lit(""))), " "), t => t =!= "")
    val hofBigrams = {
      val t = hofTokens
      when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
        .otherwise(array().cast("array<string>"))
    }
    val kT = graft.pipeline.TextAnalysis.wsTokens(col("text"))
    val kB = graft.pipeline.TextAnalysis.wordBigrams(kT)
    val df = fixtures.select(col("id"), kT.as("kt"), hofTokens.as("ht"),
      kB.as("kb"), hofBigrams.as("hb"))
    assert(codegenned(df.select("id", "kt", "kb")).contains("Project"),
      df.select("id", "kt", "kb").queryExecution.executedPlan.toString)
    df.collect().foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"tokens id=${r.getLong(0)}")
      assert(r.getSeq[String](3) == r.getSeq[String](4), s"bigrams id=${r.getLong(0)}")
    }
  }

  test("MinHashBands + HyperplaneBuckets + NearestCentroids stay codegen'd") {
    val emb = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0))), 2))
      .toDF("id", "v")
    val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val df = emb.select(
      col("id"),
      GraftColumnBridge.column(MinHashBands(
        GraftColumnBridge.expression(array(hash(col("id")).cast("long"))),
        numHashes = 16, bands = 4)).as("mh"),
      GraftColumnBridge.column(HyperplaneBuckets(
        GraftColumnBridge.expression(col("v")), planes = 4, tables = 2,
        dim = 3, seed = 42L)).as("hb"),
      GraftColumnBridge.column(NearestCentroids(
        GraftColumnBridge.expression(col("v")), centroids, nprobe = 1)).as("nc"))
    assert(codegenned(df).contains("Project"), df.queryExecution.executedPlan.toString)
    val got = df.orderBy("id").collect()
    assert(got(0).getSeq[Long](1).length == 4)
    assert(got(0).getSeq[Int](3) == Seq(0)) // (1,0,0) nearest centroid 0
    assert(got(1).getSeq[Int](3) == Seq(1))
  }

  test("sketch generators run inside WholeStageCodegen (GenerateExec)") {
    val tokens = split(col("text"), " ")
    // production shape: HashedShingles feeding the generator, both codegen'd
    val mh = docs.select(col("doc_id"),
      GraftColumnBridge.column(MinHashBandsExplode(
        HashedShingles(GraftColumnBridge.expression(col("text")), 3),
        16, 4)).as(Seq("band", "bandhash")))
    val nodes = codegenned(mh)
    assert(nodes.contains("Generate"), mh.queryExecution.executedPlan.toString)
    val perDoc = mh.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.values.forall(_ == 4))

    val sp = docs.select(col("doc_id"),
      GraftColumnBridge.column(SimHashChunkPairsExplode(
        GraftColumnBridge.expression(tokens), 5)).as(Seq("pair", "pairval", "simhash")))
    assert(codegenned(sp).contains("Generate"), sp.queryExecution.executedPlan.toString)
    assert(sp.where(col("doc_id") === 1L).count() == 10) // C(5,2)

    val sc = docs.select(col("doc_id"),
      GraftColumnBridge.column(SimHashChunksExplode(
        GraftColumnBridge.expression(tokens), 4)).as(Seq("chunk", "chunkval", "simhash")))
    assert(codegenned(sc).contains("Generate"), sc.queryExecution.executedPlan.toString)
    assert(sc.where(col("doc_id") === 1L).count() == 4)
  }

  test("HashedShingles equals transform(shingles, xxhash64) as a set") {
    val hof = docs.select(col("doc_id"),
      array_distinct(transform(
        Dedup.shingles(col("text"), 3), s => xxhash64(s))).as("h"))
    val fused = docs.select(col("doc_id"),
      GraftColumnBridge.column(HashedShingles(
        GraftColumnBridge.expression(col("text")), 3)).as("h"))
    // array_sort is itself a HOF (CodegenFallback) — sort driver-side so the
    // codegen assertion sees only the expression under test
    assert(codegenned(fused).contains("Project"), fused.queryExecution.executedPlan.toString)
    val a = hof.orderBy("doc_id").collect().map(_.getSeq[Long](1).sorted).toSeq
    val b = fused.orderBy("doc_id").collect().map(_.getSeq[Long](1).sorted).toSeq
    assert(a == b)
  }

  test("generator eval path (interpreted) matches codegen path") {
    // Force the interpreted path by disabling whole-stage codegen.
    val tokens = split(col("text"), " ")
    def pairs() = docs.select(col("doc_id"),
      GraftColumnBridge.column(SimHashChunkPairsExplode(
        GraftColumnBridge.expression(tokens), 5)).as(Seq("pair", "pairval", "simhash")))
      .orderBy("doc_id", "pair").collect().map(_.toSeq).toSeq
    val on = pairs()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try pairs() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on == off)
  }

  test("ShinglePositionsExplode runs inside WholeStageCodegen, positions 1-based in order") {
    val df = docs.select(col("doc_id"),
      GraftColumnBridge.column(ShinglePositionsExplode(
        GraftColumnBridge.expression(col("text")), 3)).as(Seq("pos", "gramhash")))
    assert(codegenned(df).contains("Generate"), df.queryExecution.executedPlan.toString)
    // 9-token docs emit 7 windows at positions 1..7; the empty doc emits none
    val perDoc = df.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc(1L) == 7 && perDoc(2L) == 7 && !perDoc.contains(4L))
    val pos1 = df.where(col("doc_id") === 1L).select("pos")
      .collect().map(_.getInt(0)).toSeq
    assert(pos1 == (1 to 7))
    // gram identity matches HashedShingles' byte-span hashing: docs 1 and 2
    // share their first 6 windows ("the quick brown ... the lazy") exactly
    val byDoc = df.collect().groupBy(_.getLong(0))
    val h1 = byDoc(1L).map(r => r.getInt(1) -> r.getLong(2)).toMap
    val h2 = byDoc(2L).map(r => r.getInt(1) -> r.getLong(2)).toMap
    (1 to 6).foreach(p => assert(h1(p) == h2(p)))
    assert(h1(7) != h2(7)) // dog vs cat
  }

  test("DictScore projection stays inside WholeStageCodegen, codegen == interpreted") {
    val model = graft.pipeline.QualityModel(0.2, Map("quick" -> 1.0, "lazy" -> -0.5))
    def scored() = docs.select(col("doc_id"),
      QualityClassifier.scoreColumn(col("text"), model).as("q"))
    assert(codegenned(scored()).contains("Project"),
      scored().queryExecution.executedPlan.toString)
    val on = scored().orderBy("doc_id").collect().map(_.toSeq).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try scored().orderBy("doc_id").collect().map(_.toSeq).toSeq
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on == off)
  }
}
