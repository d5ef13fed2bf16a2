package graft

import graft.pipeline.{Pq, Similarity}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Product quantization: codebook training, row-local encoding, ADC top-k
  * recall against brute force, and codegen integration.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered synthetic vectors: `n` points around `k` well-separated
    * 8-dim anchors with small deterministic jitter.
    */
  private def clustered(n: Int, k: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new java.util.Random(42)
    val anchors = Array.fill(k)(Array.fill(8)(rnd.nextGaussian() * 10))
    (0 until n).map { i =>
      val a = anchors(i % k)
      (i.toLong, a.map(_ + rnd.nextGaussian() * 0.5).toSeq)
    }
  }

  test("train -> encode -> ADC shortlist + exact rerank recalls brute-force top-k") {
    val data = clustered(400, 5)
    val df = data.toDF("vec_id", "v")
    val model = Pq.train(df, "v", numBlocks = 4, codebookSize = 8,
      trainRows = 400, seed = 7)
    assert(model.numBlocks == 4 && model.blockDim == 2 && model.codebookSize == 8)

    val codes = df.select(col("vec_id"), Pq.encodeColumn(col("v"), model).as("codes"))
    // codes are one small int per block (32x smaller than the float vector)
    val c0 = codes.select(col("codes")).head().getSeq[Int](0)
    assert(c0.length == 4 && c0.forall(c => c >= 0 && c < 8))

    val queries = data.take(5).map { case (id, v) => (id, v.toArray) }

    // prefilter contract: the ADC-100 shortlist contains the exact cosine
    // top-10 (quantization cannot rank WITHIN a cell, so shortlist size
    // must cover same-code ties — here a full cluster)
    val shortlist = Pq.topKByAdc(codes, "vec_id", "codes", queries, model, k = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val corpus = data.map { case (id, v) => (id, v.toArray) }
    val exact = queries.map { case (qid, qv) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    }.toMap
    val shortRecalls = queries.map { case (qid, _) =>
      exact(qid).count(shortlist.getOrElse(qid, Set.empty)).toDouble / 10.0
    }
    assert(shortRecalls.forall(_ >= 0.9), s"shortlist recall: ${shortRecalls.mkString(",")}")

    // full search shape: shortlist + exact rerank == brute force top-10
    val reranked = Pq.topKByAdcRerank(codes, df, "vec_id", "codes", "v",
      queries, model, k = 10, shortlist = 100)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val rerankRecalls = queries.map { case (qid, _) =>
      exact(qid).count(reranked.getOrElse(qid, Seq.empty).toSet).toDouble / 10.0
    }
    assert(rerankRecalls.forall(_ >= 0.9), s"rerank recall: ${rerankRecalls.mkString(",")}")
  }

  test("IVF-PQ composition recalls brute-force top-k; zero-probe cells never scanned") {
    val data = clustered(600, 6)
    val df = data.toDF("vec_id", "v")
    val queries = data.take(6).map { case (id, v) => (id, v.toArray) }

    val got = Pq.ivfPqTopK(df, "vec_id", "v", queries, k = 10,
      numCells = 6, nprobe = 3, numBlocks = 4, codebookSize = 8,
      shortlist = 150, trainRows = 600, seed = 7)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val corpus = data.map { case (id, v) => (id, v.toArray) }
    val exact = queries.map { case (qid, qv) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    }.toMap
    val recalls = queries.map { case (qid, _) =>
      exact(qid).count(got.getOrElse(qid, Seq.empty).toSet).toDouble / 10.0
    }
    // with 6 well-separated clusters and nprobe=3, every query's own cluster
    // is probed -> near-exact recall on clustered data
    assert(recalls.forall(_ >= 0.9), s"ivfpq recall: ${recalls.mkString(",")}")

    // nprobe = numCells degenerates to PQ-over-everything = exact after rerank
    val full = Pq.ivfPqTopK(df, "vec_id", "v", queries, k = 10,
      numCells = 6, nprobe = 6, numBlocks = 4, codebookSize = 8,
      shortlist = 300, trainRows = 600, seed = 7)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queries.foreach { case (qid, _) =>
      assert(full(qid) == exact(qid).toSeq, s"query $qid full-probe mismatch")
    }
  }

  test("residual IVFADC: exact decomposition, recall beats raw-space PQ at tight codebooks") {
    // clusters FAR from the origin with small intra-cluster spread: raw-space
    // codebooks (k=2 per block!) must cover the whole space, residual
    // codebooks only the small per-cell ball — the textbook IVFADC win
    val rnd = new java.util.Random(19)
    val anchors = Array.fill(4)(Array.fill(8)(rnd.nextGaussian() * 100))
    val data = (0 until 400).map { i =>
      val a = anchors(i % 4)
      (i.toLong, a.map(_ + rnd.nextGaussian() * 1.0).toSeq)
    }
    val df = data.toDF("vec_id", "v")
    val queries = data.take(4).map { case (id, v) => (id, v.toArray) }

    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val corpus = data.map { case (id, v) => (id, v.toArray) }
    val exact = queries.map { case (qid, qv) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    }.toMap
    // THE IVFADC claim (Jégou et al. 2011 §V): quantizing residuals instead
    // of raw vectors shrinks the ADC dot-estimation error — measure it
    // directly. Same bit budget both sides (4 blocks x 4 centroids).
    def assignCell(v: Array[Double], cents: Array[Array[Double]]): Int = {
      val normed = cents.map { c =>
        val n = math.sqrt(c.map(x => x * x).sum); if (n == 0) c else c.map(_ / n) }
      normed.zipWithIndex.map { case (c, i) =>
        (v.zip(c).map { case (a, b) => a * b }.sum, i) }
        .maxBy { case (s, i) => (s, -i) }._2
    }
    val all = data.map(_._2.toArray).toArray
    val cells4 = Similarity.trainKMeans(all, 4, seed = 7)
    val rawModel = Pq.train(df, "v", numBlocks = 4, codebookSize = 4, trainRows = 400, seed = 7)
    // raw-space per-cell anchors (cell means), the residual reference points
    val members = all.groupBy(v => assignCell(v, cells4))
    val cellAnchors = Array.tabulate(cells4.length)(c =>
      members.get(c).map(vs => vs.transpose.map(_.sum / vs.length))
        .getOrElse(new Array[Double](8)))
    val resSample = all.map { v =>
      val a = cellAnchors(assignCell(v, cells4)); v.indices.map(i => v(i) - a(i)).toArray }
    val resModel = Pq.PqModel(2, Array.tabulate(4) { b =>
      // train per-block on residual subvectors through the public API
      val sub = resSample.map(v => v.slice(b * 2, b * 2 + 2).toSeq).toSeq
      Pq.train(sub.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sv"),
        "sv", numBlocks = 1, codebookSize = 4, trainRows = 400, seed = 7 + b)
        .codebooks.head
    })
    val q = queries.head._2
    import org.apache.spark.sql.GraftColumnBridge
    val cellCol = element_at(GraftColumnBridge.column(graft.pipeline.NearestCentroids(
      GraftColumnBridge.expression(col("v").cast("array<double>")), cells4, 1)), 1)
    val qCellDot = array(cellAnchors.map(c =>
      lit(q.zip(c).map { case (a, b) => a * b }.sum)): _*)
    val rows = df.select(col("vec_id"),
      (Pq.adcDotColumn(GraftColumnBridge.column(graft.pipeline.PqEncodeResidual(
        GraftColumnBridge.expression(col("v").cast("array<double>")),
        GraftColumnBridge.expression(cellCol), cellAnchors, resModel)), q, resModel)
        + element_at(qCellDot, cellCol + 1)).as("res_est"),
      Pq.adcDotColumn(Pq.encodeColumn(col("v"), rawModel), q, rawModel).as("raw_est"))
      .collect()
    val trueDot = corpus.map { case (id, v) =>
      id -> v.zip(q).map { case (a, b) => a * b }.sum }.toMap
    val (resErr, rawErr) = rows.foldLeft((0.0, 0.0)) { case ((re, ra), r) =>
      val t = trueDot(r.getLong(0))
      (re + math.abs(r.getDouble(1) - t), ra + math.abs(r.getDouble(2) - t))
    }
    assert(resErr < rawErr * 0.5,
      f"residual ADC error ${resErr / rows.length}%.2f not well below raw ${rawErr / rows.length}%.2f")
    // exhaustive setting stays exact in residual mode too (the rerank is the
    // last word; the dot decomposition loses nothing)
    val full = Pq.ivfPqTopK(df, "vec_id", "v", queries, k = 10,
      numCells = 4, nprobe = 4, numBlocks = 4, codebookSize = 8,
      shortlist = 1000, trainRows = 400, seed = 7, residual = true)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queries.foreach { case (qid, _) =>
      assert(full(qid) == exact(qid).toSeq, s"query $qid residual full-probe mismatch")
    }
  }

  test("self-match excluded BEFORE the shortlist cut: shortlist == k returns k neighbors") {
    // r10 ADVICE regression (Pq.scala ivfPqTopK): with the query id present
    // in the corpus and shortlist == k, the self row must not consume a
    // shortlist slot and silently shrink the result to k-1
    val data = clustered(120, 3)
    val df = data.toDF("vec_id", "v")
    val queries = data.take(2).map { case (id, v) => (id, v.toArray) }
    val k = 5
    val ivf = Pq.ivfPqTopK(df, "vec_id", "v", queries, k = k,
      numCells = 3, nprobe = 3, numBlocks = 4, codebookSize = 8,
      shortlist = k, trainRows = 120, seed = 7)
      .groupBy("query_id").count().select("count").as[Long].collect()
    assert(ivf.nonEmpty && ivf.forall(_ == k.toLong), s"ivfpq per-query counts: ${ivf.mkString(",")}")

    val model = Pq.train(df, "v", numBlocks = 4, codebookSize = 8, seed = 7)
    val codes = df.select(col("vec_id"), Pq.encodeColumn(col("v"), model).as("codes"))
    val rr = Pq.topKByAdcRerank(codes, df, "vec_id", "codes", "v",
      queries, model, k = k, shortlist = k)
      .groupBy("query_id").count().select("count").as[Long].collect()
    assert(rr.nonEmpty && rr.forall(_ == k.toLong), s"rerank per-query counts: ${rr.mkString(",")}")
  }

  test("encode is deterministic, null-safe, and dimension-checked") {
    val model = Pq.PqModel(2, Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0))))
    val df = Seq(
      (1L, Seq(0.9, 0.1, 0.1, 0.9)),  // codes (0, 1)
      (2L, Seq(0.5, 0.5, 0.5, 0.5)),  // exact ties -> lowest index (0, 0)
      (3L, Seq(1.0, 2.0)),            // wrong dim -> null
      (4L, null.asInstanceOf[Seq[Double]]))
      .toDF("id", "v")
    val out = df.select(col("id"), Pq.encodeColumn(col("v"), model).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Int](1))).toMap
    assert(out(1L).contains(Seq(0, 1)))
    assert(out(2L).contains(Seq(0, 0)))
    assert(out(3L).isEmpty && out(4L).isEmpty)
    // ADC with out-of-range codes (foreign model) nulls instead of crashing
    val lutModel = model
    val bad = Seq((1L, Seq(7, 0))).toDF("id", "c")
    val adc = bad.select(Pq.adcDotColumn(col("c"), Array(1.0, 0.0, 0.0, 1.0), lutModel))
      .head()
    assert(adc.isNullAt(0))
    // a NULL element inside the codes array nulls the score (adcDotColumn
    // accepts arbitrary array<int>, so containsNull is possible)
    val nullElem = Seq((1L, Seq[Integer](0, null))).toDF("id", "c")
    val adcNull = nullElem
      .select(Pq.adcDotColumn(col("c"), Array(1.0, 0.0, 0.0, 1.0), lutModel))
      .head()
    assert(adcNull.isNullAt(0))
  }

  test("PqModelJson: exact round trip; file load wires the pq_encode step") {
    val data = clustered(200, 4)
    val df = data.toDF("vec_id", "v")
    val model = Pq.train(df, "v", numBlocks = 4, codebookSize = 8,
      trainRows = 200, seed = 7)
    // render -> parse is bit-exact
    val rt = graft.pipeline.PqModelJson.parse(graft.pipeline.PqModelJson.render(model))
    assert(rt.blockDim == model.blockDim)
    (0 until model.numBlocks).foreach { b =>
      model.codebooks(b).zip(rt.codebooks(b)).foreach { case (a, c) =>
        assert(java.util.Arrays.equals(a, c)) }
    }
    // same codes from the round-tripped model
    val c1 = df.select(Pq.encodeColumn(col("v"), model)).collect().map(_.getSeq[Int](0))
    val c2 = df.select(Pq.encodeColumn(col("v"), rt)).collect().map(_.getSeq[Int](0))
    assert(c1.toSeq == c2.toSeq)
    // malformed models fail loudly
    intercept[IllegalArgumentException] {
      graft.pipeline.PqModelJson.parse("""{"block_dim": 2, "codebooks": [[[1.0]]]}""")
    }
    // saved model drives the declarative step without retraining
    val dir = java.nio.file.Files.createTempDirectory("graft_pqm")
    try {
      val loc = dir.resolve("pq.json").toUri.toString
      graft.pipeline.PqModelJson.save(spark, loc, model)
      val stepDf = data.toDF("doc_id", "vec").withColumn("text", lit("t"))
      val coded = graft.pipeline.CurationPipeline(stepDf, Seq(Map(
        "step" -> "pq_encode", "vec_col" -> "vec", "model_location" -> loc)))
      val viaStep = coded.orderBy("doc_id").select("pq_codes")
        .collect().map(_.getSeq[Int](0))
      assert(viaStep.toSeq == c1.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }
  }

  test("PQ expressions stay inside whole-stage codegen") {
    val model = Pq.PqModel(2, Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0))))
    val df = spark.range(100).select(array(
      col("id").cast("double") % 2, lit(0.0),
      lit(0.0), col("id").cast("double") % 3).as("v"))
    val q = df.select(Pq.encodeColumn(col("v"), model).as("c"))
      .select(Pq.adcDotColumn(col("c"), Array(1.0, 0.0, 0.0, 1.0), model).as("d"))
      .where(col("d").isNotNull)
    val codegen = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.nonEmpty, q.queryExecution.executedPlan.toString)
    assert(q.count() == 100)
  }

  test("top-k ranking window gets the group-limit pushdown (no full per-query sort)") {
    val model = Pq.PqModel(2, Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0))))
    val codes = spark.range(1000).select(col("id").as("vec_id"),
      array((col("id") % 2).cast("int"), (col("id") % 3 === 0).cast("int")).as("codes"))
    val q = Pq.topKByAdc(codes, "vec_id", "codes",
      Seq((1L, Array(1.0, 0.0, 0.0, 1.0)), (2L, Array(0.0, 1.0, 1.0, 0.0))),
      model, k = 5)
    // Spark's rank<=k filter over a row_number window plans a
    // WindowGroupLimit, so each partition retains only k rows per query
    // before the sort — without it, top-k would fully sort the corpus per
    // query partition
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(q.count() == 10)
  }

  test("index at rest: partitionBy(cell) parquet prunes untouched cells at the scan") {
    // VERDICT r10 Next #3: convert the "isin(touched) partition-prunes at
    // rest" design claim into a pinned scan-metrics guarantee
    val data = clustered(600, 6)
    val df = data.toDF("vec_id", "v")
    val queries = data.take(3).map { case (id, v) => (id, v.toArray) }
    val (model, index) = Pq.ivfPqBuildIndex(df, "vec_id", "v",
      numCells = 6, numBlocks = 4, codebookSize = 8, trainRows = 600, seed = 7)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_index").toString
    index.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val modelPath = s"$dir/_model.json"
    graft.pipeline.IvfPqIndexModelJson.save(spark, modelPath, model)

    // a fresh job: load model + index, query with nprobe < numCells
    val loaded = graft.pipeline.IvfPqIndexModelJson.load(spark, modelPath)
    assert(loaded.cells.map(_.toSeq).toSeq == model.cells.map(_.toSeq).toSeq)
    val indexAtRest = spark.read.parquet(dir)
    val out = Pq.ivfPqTopKIndexed(indexAtRest, loaded, queries, k = 5,
      nprobe = 2, shortlist = 50)
    val rows = out.collect()
    assert(rows.length == queries.length * 5)

    // the executed plan's parquet scans read ONLY the touched cell
    // partitions: every scan's partition count < total cells
    val totalCells = indexAtRest.select("cell").distinct().count()
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val self = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Seq.empty
      }
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => allScans(r.child)
        case _ => Seq.empty
      }
      self ++ nested ++ p.children.flatMap(allScans)
    }
    val qe = out.queryExecution
    val scans = allScans(qe.executedPlan)
    assert(scans.nonEmpty, s"no parquet scans found:\n${qe.executedPlan}")
    scans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"scan has no partition filters:\n$s")
      val read = s.metrics.get("numPartitions").map(_.value)
        .orElse(s.metrics.get("numFiles").map(_.value)).getOrElse(-1L)
      assert(read > 0 && read < totalCells,
        s"scan read $read partitions/files of $totalCells cells — not pruned")
    }

    // and the pruned-index answers match the one-shot path on the same params
    val oneShot = Pq.ivfPqTopK(df, "vec_id", "v", queries, k = 5,
      numCells = 6, nprobe = 2, numBlocks = 4, codebookSize = 8,
      shortlist = 50, trainRows = 600, seed = 7)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val fromIndex = out.toDF().select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(fromIndex == oneShot)
  }

  test("incremental append: frozen-codebook encode == rebuild-on-union, prunes at rest") {
    // VERDICT r11 next #6: growing corpora must not retrain per batch.
    // Split the corpus, build on A, append B with the STORED quantizers —
    // the union index must answer byte-identically to encoding A∪B in one
    // shot with the SAME frozen model (append is a pure encode pass).
    val data = clustered(600, 6)
    val a = data.filter(_._1 % 2 == 0); val b = data.filter(_._1 % 2 == 1)
    val dfA = a.toDF("vec_id", "v"); val dfB = b.toDF("vec_id", "v")
    val dfAll = data.toDF("vec_id", "v")
    val queries = data.take(3).map { case (id, v) => (id, v.toArray) }
    val (model, idxA) = Pq.ivfPqBuildIndex(dfA, "vec_id", "v",
      numCells = 6, numBlocks = 4, codebookSize = 8, trainRows = 600, seed = 7)
    val appended = Pq.ivfPqAppendToIndex(model, dfB, "vec_id", "v")
    def ans(index: org.apache.spark.sql.DataFrame) =
      Pq.ivfPqTopKIndexed(index, model, queries, k = 5, nprobe = 3, shortlist = 50)
        .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val viaAppend = ans(idxA.unionByName(appended))
    val viaUnionEncode = ans(Pq.ivfPqAppendToIndex(model, dfAll, "vec_id", "v"))
    assert(viaAppend == viaUnionEncode)
    // appended rows actually participate (some odd-id neighbor surfaces)
    assert(viaAppend.exists(_._3 % 2 == 1))

    // at rest: parquet append lands inside the EXISTING cell directories
    // (same cell domain), and queries over the grown index still prune
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_append").toString
    idxA.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val cellsBefore = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    appended.write.mode("append").partitionBy("cell").parquet(dir)
    val cellsAfter = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellsAfter == cellsBefore, s"append created new cell dirs: ${cellsAfter -- cellsBefore}")
    val atRest = spark.read.parquet(dir)
    val out = Pq.ivfPqTopKIndexed(atRest, model, queries, k = 5, nprobe = 3, shortlist = 50)
    assert(out.select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      == viaAppend)
    val scans = out.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.forall(_.partitionFilters.nonEmpty), "appended index scan lost partition pruning")

    // residual (IVFADC) append: the anchor-relative encode path must give
    // the same frozen-model identity
    val (rModel, rIdxA) = Pq.ivfPqBuildIndex(dfA, "vec_id", "v",
      numCells = 6, numBlocks = 4, codebookSize = 8, trainRows = 600, seed = 7,
      residual = true)
    val rViaAppend = Pq.ivfPqTopKIndexed(
      rIdxA.unionByName(Pq.ivfPqAppendToIndex(rModel, dfB, "vec_id", "v")),
      rModel, queries, k = 5, nprobe = 3, shortlist = 50)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val rViaUnion = Pq.ivfPqTopKIndexed(
      Pq.ivfPqAppendToIndex(rModel, dfAll, "vec_id", "v"),
      rModel, queries, k = 5, nprobe = 3, shortlist = 50)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(rViaAppend == rViaUnion && rViaAppend.exists(_._3 % 2 == 1))

    // retrain-trigger heuristic: balanced clustered data sits near 1; a
    // drifted batch piling into one cell pushes skew up
    val skewBalanced = Pq.ivfPqCellSkew(idxA.unionByName(appended))
    assert(skewBalanced >= 1.0 && skewBalanced < 4.0, s"balanced skew=$skewBalanced")
    val drifted = (0 until 600).map(i => (10000L + i, a.head._2)) // all one point
    val skewDrifted = Pq.ivfPqCellSkew(
      idxA.unionByName(Pq.ivfPqAppendToIndex(model, drifted.toDF("vec_id", "v"), "vec_id", "v")))
    assert(skewDrifted > skewBalanced, s"drifted=$skewDrifted balanced=$skewBalanced")
  }

  test("index compaction: fragmented cells rewritten in place, answers and pruning preserved") {
    // per-batch appends add >= 1 file per touched cell per batch; compaction
    // is the maintenance half — only fragmented cells are re-read (partition
    // pruned), each swapped atomically, answers byte-identical
    val data = clustered(600, 6)
    val seed = data.filter(_._1 % 3 == 0)
    val rest = data.filterNot(_._1 % 3 == 0)
    val (model, idx0) = Pq.ivfPqBuildIndex(seed.toDF("vec_id", "v"), "vec_id", "v",
      numCells = 6, numBlocks = 4, codebookSize = 8, trainRows = 600, seed = 7)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_compact").toString
    idx0.write.mode("overwrite").partitionBy("cell").parquet(dir)
    rest.grouped(67).foreach { chunk =>
      graft.streaming.StreamingRecipes.ivfPqAppendBatch(
        model, chunk.toDF("vec_id", "v"), "vec_id", "v", dir)
    }
    val before = Pq.ivfPqIndexFileStats(spark, dir)
    assert(before.exists(_.files > 3), s"fixture not fragmented: $before")
    def snapshot() = spark.read.parquet(dir)
      .select("neighbor_id", "cell", "codes", "vector")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    val queries = data.take(3).map { case (id, v) => (id, v.toArray) }
    def answers() = Pq.ivfPqTopKIndexed(spark.read.parquet(dir), model, queries,
        k = 5, nprobe = 3, shortlist = 50)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val (rowsBefore, ansBefore) = (snapshot(), answers())
    val st = Pq.ivfPqCompactIndex(spark, dir, maxFilesPerCell = 3)
    assert(st.cellsRewritten == before.count(_.files > 3), st.toString)
    assert(st.filesAfter < st.filesBefore, st.toString)
    val after = Pq.ivfPqIndexFileStats(spark, dir)
    assert(after.forall(_.files <= 3), s"still fragmented after compaction: $after")
    assert(after.map(_.cell) == before.map(_.cell), "compaction changed the cell domain")
    assert(snapshot() == rowsBefore, "compaction changed index rows")
    assert(answers() == ansBefore && ansBefore.nonEmpty)
    // partition pruning intact on the compacted layout
    val out = Pq.ivfPqTopKIndexed(spark.read.parquet(dir), model, queries,
      k = 5, nprobe = 3, shortlist = 50)
    out.collect()
    val scans = out.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.forall(_.partitionFilters.nonEmpty), "compacted index scan lost partition pruning")
    // idempotent: a healthy index is a no-op
    val st2 = Pq.ivfPqCompactIndex(spark, dir, maxFilesPerCell = 3)
    assert(st2.cellsRewritten == 0 && st2.rowsRewritten == 0L, st2.toString)

    // --- crash-recovery: a crash BETWEEN the two swap renames leaves the
    // cell only under the dot-dirs; the next run must RESTORE it before
    // clearing leftovers (the r13 cleanup deleted both copies — data loss)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellName = s"cell=${after.head.cell}"
    val live = new org.apache.hadoop.fs.Path(dir, cellName)
    val bak = new org.apache.hadoop.fs.Path(dir, s".dq_compact_bak/$cellName")
    val tmp = new org.apache.hadoop.fs.Path(dir, s".dq_compact_tmp/$cellName")
    // stage the "fresh" copy in tmp (content-identical, as a finished
    // rewrite would be), then simulate the crash point: live renamed to bak,
    // fresh never swapped in
    fs.mkdirs(tmp.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, tmp, false,
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(live, bak), "fixture: could not stage out the cell")
    assert(!fs.exists(live) && fs.exists(bak) && fs.exists(tmp))
    val stRec = Pq.ivfPqCompactIndex(spark, dir, maxFilesPerCell = 3)
    assert(fs.exists(live), "crashed-swap cell not restored")
    assert(!fs.exists(bak.getParent) && !fs.exists(tmp.getParent),
      "dot-dirs not cleared after recovery")
    assert(snapshot() == rowsBefore, "crash recovery lost or duplicated rows")
    assert(answers() == ansBefore, "crash recovery changed k-NN answers")
    assert(stRec.cellsRewritten == 0, stRec.toString) // index was healthy
  }

  test("index compaction: concurrent readers see pre- or post-swap answers, never partial") {
    // Pins the prose contract: a query racing a compaction returns the same
    // answers either way (row content preserved; per-cell swap atomic). A
    // reader that LISTs mid-swap may hit a documented transient file miss —
    // tolerated; a WRONG answer is not.
    val data = clustered(600, 6)
    val (model, idx0) = Pq.ivfPqBuildIndex(data.toDF("vec_id", "v"), "vec_id", "v",
      numCells = 6, numBlocks = 4, codebookSize = 8, trainRows = 600, seed = 7)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_race").toString
    idx0.repartition(6, col("cell")).write.mode("overwrite")
      .option("maxRecordsPerFile", 8).partitionBy("cell").parquet(dir)
    val queries = data.take(3).map { case (id, v) => (id, v.toArray) }
    val expected = Pq.ivfPqTopKIndexed(spark.read.parquet(dir), model, queries,
        k = 5, nprobe = 3, shortlist = 50)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(expected.nonEmpty)
    @volatile var stop = false
    @volatile var wrong: Option[String] = None
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop && wrong.isEmpty) {
        try {
          val got = Pq.ivfPqTopKIndexed(spark.read.parquet(dir), model, queries,
              k = 5, nprobe = 3, shortlist = 50)
            .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
          if (got != expected) wrong = Some(s"racing reader got $got")
        } catch {
          case t: Throwable =>
            // unwrap: only a listed-then-swapped file miss is tolerated
            val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toList
            if (chain.exists(c => c.isInstanceOf[java.io.FileNotFoundException] ||
                Option(c.getMessage).exists(_.contains("FileNotFound"))))
              misses.incrementAndGet()
            else wrong = Some(s"racing reader threw: $t")
        }
      }
    })
    reader.start()
    try {
      // each pass triggers on the fragmented layout and REWRITES it
      // fragmented again (1 record/file), so every iteration exercises the
      // full census -> rewrite -> per-cell-swap window under the reader
      for (_ <- 1 to 4 if wrong.isEmpty)
        Pq.ivfPqCompactIndex(spark, dir, maxFilesPerCell = 3, targetBytesPerFile = 1L)
      Pq.ivfPqCompactIndex(spark, dir, maxFilesPerCell = 3) // leave it healthy
    } finally { stop = true; reader.join(60000) }
    assert(wrong.isEmpty, wrong.getOrElse(""))
    val finalAns = Pq.ivfPqTopKIndexed(spark.read.parquet(dir), model, queries,
        k = 5, nprobe = 3, shortlist = 50)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(finalAns == expected)
  }

  test("train validates inputs") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    intercept[IllegalArgumentException] { Pq.train(df, "v", numBlocks = 2) }
    intercept[IllegalArgumentException] {
      Pq.train(df, "v", numBlocks = 3, codebookSize = 300)
    }
  }
}
