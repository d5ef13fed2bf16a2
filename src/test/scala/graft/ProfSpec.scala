package graft

import graft.pipeline._
import graft.queries.QueryDefs._
import org.apache.spark.sql.functions._

class ProfSpec extends SparkSpec {
  test("dedup query timings at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      info(f"$name: $n rows, ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    tm("minhash warm")(SparkEntry.queries("pipe_dedup_minhash")(spark, dir).count())
    tm("minhash")(SparkEntry.queries("pipe_dedup_minhash")(spark, dir).count())
    tm("ngram")(SparkEntry.queries("pipe_dedup_ngram_jaccard")(spark, dir).count())
    tm("simhash")(SparkEntry.queries("pipe_dedup_simhash")(spark, dir).count())
  }

  test("summaryDf mirrors summarize stats in long format, one row per column") {
    import spark.implicits._
    val df = Seq(
      (1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, ""), (4, Double.NaN, null)
    ).toDF("id", "v", "s").select(col("id"),
      when(col("id") === 4, lit(null).cast("double")).otherwise(col("v")).as("v"), col("s"))
    val out = graft.profiler.Profiler.summaryDf(df, Seq("v", "s"),
      graft.profiler.ProfilerOptions(sampleFraction = 1.0, limit = Int.MaxValue))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val v = out("v")
    assert(v.getAs[Long]("n") == 4 && v.getAs[Long]("n_null") == 1)
    assert(v.getAs[Double]("min") == 10.0 && v.getAs[Double]("max") == 30.0)
    assert(math.abs(v.getAs[Double]("mean") - 20.0) < 1e-9)
    assert(v.isNullAt(v.fieldIndex("n_empty"))) // numeric: no empty-string stat
    val s = out("s")
    assert(s.getAs[Long]("n") == 4 && s.getAs[Long]("n_null") == 1)
    assert(s.getAs[Long]("n_empty") == 1)
    assert(s.isNullAt(s.fieldIndex("min")) && s.isNullAt(s.fieldIndex("mean")))
  }

  test("profileInput: no-op sample/limit leave no Sample/GlobalLimit in the plan; binding limit caps and re-parallelizes") {
    import spark.implicits._
    val df = spark.range(0, 1000, 1, 7).select(col("id").cast("int").as("v"))
    val P = graft.profiler.Profiler
    // no-op config (the oracle-gate shape): the plan must be the bare scan —
    // a GlobalLimit before an aggregation would shuffle to ONE partition
    val noop = P.profileInput(df, graft.profiler.ProfilerOptions(
      sampleFraction = 1.0, limit = Int.MaxValue))
    val planStr = noop.queryExecution.optimizedPlan.toString
    assert(!planStr.contains("GlobalLimit") && !planStr.contains("Sample"), planStr)
    assert(noop.count() == 1000)
    // small binding limit: caps to n rows WITHOUT a repartition shuffle —
    // below SmallCapRows the one-task aggregation is cheaper than shuffling
    // the capped rows (ADVICE r14 #4)
    val capped = P.profileInput(df, graft.profiler.ProfilerOptions(
      sampleFraction = 1.0, limit = 500))
    assert(capped.count() == 500)
    assert(!capped.queryExecution.optimizedPlan.toString.contains("Repartition"),
      "small caps must not pay a repartition shuffle")
    // large binding limit: still re-parallelized across the cluster
    val bigCap = P.profileInput(df, graft.profiler.ProfilerOptions(
      sampleFraction = 1.0, limit = P.SmallCapRows + 1))
    assert(bigCap.queryExecution.optimizedPlan.toString.contains("Repartition"),
      "binding caps above SmallCapRows must re-parallelize")
    // binding sample still samples
    val sampled = P.profileInput(df, graft.profiler.ProfilerOptions(
      sampleFraction = 0.5, limit = Int.MaxValue))
    val n = sampled.count()
    assert(n > 250 && n < 750, s"sampled $n")
    // summarize over the no-op config equals summarize semantics pre-change
    val s = P.summarize(df, Seq("v"), graft.profiler.ProfilerOptions(
      sampleFraction = 1.0, limit = Int.MaxValue))("v")
    assert(s("count") == 1000L && s("min") == 0.0 && s("max") == 999.0)
  }

  test("primary-key candidates: unique null-free columns rank first, others excluded") {
    import spark.implicits._
    val df = Seq.tabulate(2000)(i => (i.toLong, s"k$i", i % 7, if (i % 100 == 0) null else s"v$i"))
      .toDF("id", "key", "bucket", "mostly")
    val cands = graft.profiler.Profiler.primaryKeyCandidates(df)
    assert(cands.map(_._1).toSet == Set("id", "key")) // unique + null-free only
    assert(cands.forall(_._2 > 0.97))
    // low-cardinality and nullable columns are never candidates
    assert(!cands.exists(c => c._1 == "bucket" || c._1 == "mostly"))
    // restricted column list respected
    assert(graft.profiler.Profiler.primaryKeyCandidates(df, Seq("bucket")).isEmpty)
  }

  test("iforest anomaly info carries confidence_std for flagged rows") {
    import spark.implicits._
    val base = Seq.tabulate(500)(i => (i, i % 50 * 1.0)).toDF("id", "v")
    val planted = base.unionByName(Seq((9001, 1e6)).toDF("id", "v"))
    val checked = graft.engine.DQEngine.applyChecks(planted, Seq(
      graft.rules.DQDatasetRule(
        graft.checks.DatasetChecks.hasNoRowAnomaliesIForest(Seq("v"), threshold = 99.0, seed = 3,
          enableConfidenceStd = true),
        "has_no_row_anomalies", Seq("v"))))
    val flagged = checked.where(col("_errors").isNotNull)
      .select(col("id"),
        col("_dq_info")(0).getField("anomaly").getField("confidence_std").as("cs"),
        col("_dq_info")(0).getField("anomaly").getField("contributions").as("contrib"))
      .collect()
    assert(flagged.exists(_.getInt(0) == 9001))
    // every flagged row reports a non-null, finite, non-negative ensemble std
    assert(flagged.forall(r => !r.isNullAt(1) && r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0))
    // clean rows carry no confidence value
    val clean = checked.where(col("_errors").isNull)
      .select(col("_dq_info")(0).getField("anomaly").getField("confidence_std").as("cs"))
      .where(col("cs").isNotNull).count()
    assert(clean == 0)
    // reference 0.15.0 default: enable_confidence_std=False -> always null
    val defChecked = graft.engine.DQEngine.applyChecks(planted, Seq(
      graft.rules.DQDatasetRule(
        graft.checks.DatasetChecks.hasNoRowAnomaliesIForest(Seq("v"), threshold = 99.0, seed = 3),
        "has_no_row_anomalies", Seq("v"))))
    assert(defChecked
      .select(col("_dq_info")(0).getField("anomaly").getField("confidence_std").as("cs"))
      .where(col("cs").isNotNull).count() == 0)
  }

  test("streaming file read without schema infers one from existing files") {
    val dir = java.nio.file.Files.createTempDirectory("io_infer").toString
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    val stream = graft.io.IO.readInputData(spark,
      graft.io.InputConfig(location = dir, format = "parquet", isStreaming = true))
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.toSeq == Seq("id", "s"))
  }
}
