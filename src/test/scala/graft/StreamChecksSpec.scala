package graft

import graft.streaming.StreamChecks
import org.apache.spark.sql.functions._

import java.nio.file.Files

class StreamChecksSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked freshness: under-filled closed windows emit exactly once") {
    val dir = Files.createTempDirectory("wm_in").toString
    // window 1 (00:00-00:10): 3 rows; window 2 (00:10-00:20): 1 row;
    // a late straggler at 01:00 advances the watermark past both windows
    Seq("2024-01-01 00:01:00", "2024-01-01 00:02:00", "2024-01-01 00:03:00",
      "2024-01-01 00:11:00", "2024-01-01 01:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("ts TIMESTAMP").parquet(dir)
    val out = StreamChecks.freshnessViolationsPerWindow(stream, "ts",
      windowMinutes = 10, minRecords = 2, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("wm_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("wm_out")
      .select(col("window_start").cast("string"), col("record_count"))
      .as[(String, Long)].collect().toSet
    // only the 00:10 window is under-filled among CLOSED windows (01:00 window
    // never closes - watermark stops at the max event time)
    assert(rows == Set(("2024-01-01 00:10:00", 1L)))
  }

  test("cross-batch duplicate detection via flatMapGroupsWithState") {
    import StreamChecks.{DupEvent, KeyedRow}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KeyedRow]
    val q = StreamChecks.duplicateEvents(in.toDS())
      .writeStream.format("memory").queryName("dup_out").outputMode("append").start()
    // batch 1: a twice (in-batch dup), b once
    in.addData(KeyedRow("a", 1L), KeyedRow("a", 2L), KeyedRow("b", 3L))
    q.processAllAvailable()
    // batch 2: a again (cross-batch dup), c new
    in.addData(KeyedRow("a", 4L), KeyedRow("c", 5L))
    q.processAllAvailable()
    val dups = spark.table("dup_out").as[DupEvent].collect().sortBy(_.rowId)
    q.stop()
    assert(dups.map(d => (d.key, d.rowId, d.firstRowId)).toSeq ==
      Seq(("a", 2L, 1L), ("a", 4L, 1L)))
    assert(dups.map(_.dupIndex).toSeq == Seq(1L, 2L))
  }

  test("foreachBatch recipe: exact keep-first dedup runs per micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = graft.streaming.StreamingRecipes
      .dedupExactPerBatch(stream, Seq("text"), "doc_id") { (batch, id) =>
        seen ++= batch.collect().map(r => (id, r.getLong(0), r.getString(1)))
      }.start()
    // batch with in-batch dups: keep-first by doc_id per text key
    in.addData((1L, "aa"), (2L, "aa"), (3L, "bb"))
    q.processAllAvailable()
    // next batch: "aa" appears again — PER-BATCH scope keeps it again
    in.addData((4L, "aa"))
    q.processAllAvailable()
    q.stop()
    assert(seen.sortBy(t => (t._1, t._2)).toSeq ==
      Seq((0L, 1L, "aa"), (0L, 3L, "bb"), (1L, 4L, "aa")))
  }

  test("foreachBatch recipe: dedup against a static reference corpus, bloom built once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = Seq("known page one", "known page two").toDF("old_text")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = graft.streaming.StreamingRecipes
      .dedupAgainstReferencePerBatch(stream, "text", ref, "old_text") { (batch, id) =>
        seen ++= batch.collect().map(r => (id, r.getLong(0)))
      }.start()
    in.addData((1L, "known page one"), (2L, "fresh page"))
    q.processAllAvailable()
    // the filter is the STATIC reference only: a row that passed in batch 0
    // passes again in batch 1 (no cross-batch learning), known refs drop
    in.addData((3L, "fresh page"), (4L, "known page two"))
    q.processAllAvailable()
    q.stop()
    assert(seen.sortBy(identity).toSeq == Seq((0L, 2L), (1L, 3L)))
  }

  test("foreachBatch recipe: near-dup drop against a static reference index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = graft.streaming.StreamingRecipes
      .dropNearDupsAgainstReferencePerBatch(stream, "doc_id", "text",
        ref, "doc_id", "text", numHashes = 128, bands = 32) { (batch, id) =>
        seen ++= batch.collect().map(r => (id, r.getLong(0)))
      }.start()
    // doc 1 is a 10-token superset of the 9-token ref doc (jaccard 7/8) ->
    // dropped; doc 2 is novel -> kept
    in.addData(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "a completely unrelated fresh document about something else"))
    q.processAllAvailable()
    in.addData((3L, "another novel page"), (4L, "alpha beta gamma delta epsilon zeta eta theta iota"))
    q.processAllAvailable()
    q.stop()
    assert(seen.sortBy(identity).toSeq == Seq((0L, 2L), (1L, 3L)))
  }

  test("foreachBatch recipe: SEMANTIC dedup against a static reference corpus") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = Seq((900L, Seq(0.0, 2.0))).toDF("rid", "rv")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val stream = in.toDF().toDF("doc_id", "vec")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = graft.streaming.StreamingRecipes
      .dropSemanticDupsAgainstReferencePerBatch(stream, "doc_id", "vec",
        ref, "rid", "rv", Array(Array(1.0, 0.0), Array(0.0, 1.0)),
        threshold = 0.99) { (batch, id) =>
        seen ++= batch.collect().map(r => (id, r.getLong(0)))
      }.start()
    // doc 1 is semantically the ref row (cosine 1.0) -> dropped; doc 2 novel
    in.addData((1L, Seq(0.0, 5.0)), (2L, Seq(10.0, 0.1)))
    q.processAllAvailable()
    // no cross-batch learning: a near-copy of doc 2 still passes in batch 1
    in.addData((3L, Seq(10.0, 0.1)), (4L, Seq(0.0, 1.0)))
    q.processAllAvailable()
    q.stop()
    assert(seen.sortBy(identity).toSeq == Seq((0L, 2L), (1L, 3L)))
  }

  test("cross-batch keep-first dedup via firstSeenRows state") {
    import StreamChecks.KeyedRow
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KeyedRow]
    val q = StreamChecks.firstSeenRows(in.toDS())
      .writeStream.format("memory").queryName("first_seen").outputMode("append").start()
    in.addData(KeyedRow("a", 1L), KeyedRow("a", 2L), KeyedRow("b", 3L))
    q.processAllAvailable()
    // cross-batch: "a" and "b" already seen, only "c" survives
    in.addData(KeyedRow("a", 4L), KeyedRow("c", 5L), KeyedRow("b", 6L))
    q.processAllAvailable()
    val kept = spark.table("first_seen").as[KeyedRow].collect().sortBy(_.rowId)
    q.stop()
    assert(kept.map(r => (r.key, r.rowId)).toSeq == Seq(("a", 1L), ("b", 3L), ("c", 5L)))
  }

  test("cross-batch canonical-URL dedup keeps the first id per page") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("id", "url")
    val q = graft.streaming.StreamingRecipes
      .dedupByCanonicalUrlCrossBatch(stream, "url", "id")
      .writeStream.format("memory").queryName("url_first_seen")
      .outputMode("append").start()
    in.addData((1L, "http://www.a.com/p/"), (2L, "http://a.com:80/p"))
    q.processAllAvailable()
    // second batch: same page spelled a third way + a genuinely new page
    in.addData((3L, "http://a.com/p?utm_source=x"), (4L, "https://b.org/q"))
    q.processAllAvailable()
    val kept = spark.table("url_first_seen").as[StreamChecks.KeyedRow]
      .collect().sortBy(_.rowId)
    q.stop()
    assert(kept.map(_.rowId).toSeq == Seq(1L, 4L))
    assert(kept.head.key == "http://a.com/p")
  }

  test("corpus-global pipeline ops are gated batch-only under readStream") {
    import graft.pipeline.{Curation, Dedup, TextAnalysis}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    assert(stream.isStreaming)
    // each must fail FAST at plan-build time with the remediation in the
    // message — not return silently per-micro-batch answers
    val gated: Seq[(String, () => Any)] = Seq(
      "dedupLines" -> (() => Dedup.dedupLines(stream, "doc_id", "text")),
      "flagExactDuplicates" -> (() => Dedup.flagExactDuplicates(stream, Seq(col("text")))),
      "dedupExact" -> (() => Dedup.dedupExact(stream, Seq(col("text")), col("doc_id"))),
      "minHashDuplicatePairs" -> (() => Dedup.minHashDuplicatePairs(stream, "doc_id", "text")),
      "simHashDuplicatePairs" -> (() => Dedup.simHashDuplicatePairs(stream, "doc_id", "text")),
      "duplicateClusters" -> (() => Dedup.duplicateClusters(
        stream.toDF("id_a", "id_b"))),
      "documentFrequency" -> (() => TextAnalysis.documentFrequency(stream, col("text"))),
      "quotaSample" -> (() => Curation.quotaSample(stream, Seq("text"), col("doc_id"), 10)))
    gated.foreach { case (name, f) =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("batch-only") && e.getMessage.contains("foreachBatch"),
        s"$name: ${e.getMessage}")
    }
    // row-local ops stay streaming-safe: plan builds without error
    val rowLocal = stream.select(TextAnalysis.fingerprint(col("text")),
      TextAnalysis.qualitysignals(col("text")),
      graft.checks.PiiChecks.redactPii(col("text")))
    assert(rowLocal.isStreaming)
  }

  test("cross-batch near-dup detection: LSH bucket state flags pairs across batches") {
    import StreamChecks.NearDupEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val banded = StreamChecks.bandDocuments(stream, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 32)
    val q = StreamChecks.nearDupEvents(banded, threshold = 0.5)
      .writeStream.format("memory").queryName("ndup_out").outputMode("append").start()
    val base = "spark catalyst plan optimizer shuffle partition broadcast join window aggregate"
    // batch 1: the original + an unrelated doc
    in.addData((1L, base), (3L, "completely different words nothing shared here at all ok then"))
    q.processAllAvailable()
    // batch 2: a near-duplicate of doc 1 (one word appended)
    in.addData((2L, base + " extra"))
    q.processAllAvailable()
    val events = spark.table("ndup_out").as[NearDupEvent].collect()
    q.stop()
    // doc 2 must match doc 1 (cross-batch), never doc 3; per-bucket emission
    // means the pair may repeat — distinct pairs is the contract
    val pairs = events.map(e => (e.docId, e.matchedDocId)).distinct.toSeq
    assert(pairs == Seq((2L, 1L)), events.mkString(", "))
    assert(events.forall(_.estJaccard >= 0.5))
  }

  test("foreachBatch recipe: per-batch drift monitor against a stored baseline") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.anomaly.Drift
    val baseline = Map("v" -> Drift.ColumnStats(10.0, 1.0))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val stream = in.toDF().toDF("id", "v")
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Boolean)]
    var rows = 0L
    val q = graft.streaming.StreamingRecipes
      .driftMonitorPerBatch(stream, Seq("v"), baseline, minSampleSize = 10) {
        (res, id) => results += ((id, res.recommendation, res.driftDetected))
      } { (batch, _) => rows += batch.count() }
      .start()
    // batch 0: small -> skipped; batch 1: on-baseline -> ok; batch 2: shifted -> retrain
    in.addData((1L, 10.0))
    q.processAllAvailable()
    in.addData((2L to 21L).map(i => (i, 10.0 + (i % 3) - 1.0)): _*)
    q.processAllAvailable()
    in.addData((22L to 41L).map(i => (i, 500.0)): _*)
    q.processAllAvailable()
    q.stop()
    assert(results.toSeq == Seq(
      (0L, "skipped_small_batch", false), (1L, "ok", false), (2L, "retrain", true)),
      results.mkString(", "))
    assert(rows == 41L)
  }

  test("foreachBatch recipe: frozen-model ANN index append per micro-batch") {
    import graft.pipeline.Pq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // seed corpus: 2 well-separated directions in 4 dims
    def vec(id: Long): Seq[Double] = {
      val d = (id % 2).toInt
      Seq.tabulate(4)(i => if (i == d) 10.0 + (id % 5) else 0.1 * (id % 3))
    }
    val seed = (0L until 100L).map(i => (i, vec(i)))
    val (model, idx0) = Pq.ivfPqBuildIndex(seed.toDF("vec_id", "v"), "vec_id", "v",
      numCells = 2, numBlocks = 2, codebookSize = 4, trainRows = 100, seed = 3)
    val dir = Files.createTempDirectory("ivfpq_stream").toString
    idx0.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val stream = in.toDF().toDF("vec_id", "v")
    val q = graft.streaming.StreamingRecipes
      .ivfPqAppendPerBatch(stream, model, "vec_id", "v", dir).start()
    in.addData((100L, vec(100L)), (101L, vec(101L)))
    q.processAllAvailable()
    in.addData((102L, vec(102L)))
    q.processAllAvailable()
    q.stop()
    val grown = spark.read.parquet(dir)
    assert(grown.count() == 103)
    // appended rows answer queries identically to a one-shot frozen encode
    val queries = Seq((100L, vec(100L).toArray))
    val fromStream = Pq.ivfPqTopKIndexed(grown, model, queries, k = 3, nprobe = 2, shortlist = 50)
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    val all = (0L until 103L).map(i => (i, vec(i)))
    val oneShot = Pq.ivfPqTopKIndexed(
      Pq.ivfPqAppendToIndex(model, all.toDF("vec_id", "v"), "vec_id", "v"),
      model, queries, k = 3, nprobe = 2, shortlist = 50)
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    assert(fromStream == oneShot && fromStream.nonEmpty)
  }

  test("ANN index append is replay-idempotent: a re-delivered micro-batch appends nothing") {
    import graft.pipeline.Pq
    // ADVICE r12: foreachBatch is at-least-once — the per-batch body must be
    // a no-op when the same micro-batch is delivered twice, or replayed rows
    // become clones occupying multiple top-k slots
    def vec(id: Long): Seq[Double] = {
      val d = (id % 2).toInt
      Seq.tabulate(4)(i => if (i == d) 10.0 + (id % 5) else 0.1 * (id % 3))
    }
    val seed = (0L until 100L).map(i => (i, vec(i)))
    val (model, idx0) = Pq.ivfPqBuildIndex(seed.toDF("vec_id", "v"), "vec_id", "v",
      numCells = 2, numBlocks = 2, codebookSize = 4, trainRows = 100, seed = 3)
    val dirOnce = Files.createTempDirectory("ivfpq_replay1").toString
    val dirTwice = Files.createTempDirectory("ivfpq_replay2").toString
    idx0.write.mode("overwrite").partitionBy("cell").parquet(dirOnce)
    idx0.write.mode("overwrite").partitionBy("cell").parquet(dirTwice)
    val batch = (100L to 104L).map(i => (i, vec(i))).toDF("vec_id", "v")
    graft.streaming.StreamingRecipes.ivfPqAppendBatch(model, batch, "vec_id", "v", dirOnce)
    // replay: identical batch body runs twice against the same index location
    graft.streaming.StreamingRecipes.ivfPqAppendBatch(model, batch, "vec_id", "v", dirTwice)
    graft.streaming.StreamingRecipes.ivfPqAppendBatch(model, batch, "vec_id", "v", dirTwice)
    def snapshot(dir: String) = spark.read.parquet(dir)
      .select("neighbor_id", "cell", "codes", "vector")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    assert(snapshot(dirTwice) == snapshot(dirOnce),
      "replayed micro-batch changed the index")
    // and the k-NN answers match single delivery exactly
    val queries = Seq((100L, vec(100L).toArray), (103L, vec(103L).toArray))
    def answers(dir: String) = Pq.ivfPqTopKIndexed(spark.read.parquet(dir), model,
        queries, k = 3, nprobe = 2, shortlist = 50)
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    assert(answers(dirTwice) == answers(dirOnce) && answers(dirOnce).nonEmpty)
  }
}
