package graft

import graft.anomaly.IsolationForest
import graft.checks.DatasetChecks
import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.functions._

/** Isolation-forest anomaly scoring (D15 model-based variant). */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("model: isolated points score higher than clustered points") {
    val rnd = new java.util.Random(3)
    val cluster = Array.fill(500)(Array(rnd.nextGaussian(), rnd.nextGaussian()))
    val outlier = Array(25.0, -30.0)
    val model = IsolationForest.train(cluster :+ outlier, numTrees = 100, seed = 7)
    val clusterScores = cluster.take(50).map(model.score)
    val outlierScore = model.score(outlier)
    assert(outlierScore > clusterScores.max,
      s"outlier $outlierScore should exceed max cluster score ${clusterScores.max}")
    assert(outlierScore > 0.6 && clusterScores.max < outlierScore - 0.05)
    // deterministic given the seed
    val model2 = IsolationForest.train(cluster :+ outlier, numTrees = 100, seed = 7)
    assert(model2.score(outlier) == outlierScore)
  }

  test("has_no_row_anomalies isolation_forest flags planted outliers via _dq_info") {
    val rnd = new java.util.Random(5)
    val normal = (1 to 800).map(i => (i, 50.0 + rnd.nextGaussian() * 3, 100.0 + rnd.nextGaussian() * 5))
    val planted = Seq((9001, 500.0, -400.0), (9002, -300.0, 900.0))
    val df = (normal ++ planted).toDF("id", "a", "b")
    val out = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoRowAnomaliesIForest(Seq("a", "b"), threshold = 99.5, seed = 11),
      "has_no_row_anomalies", Seq("a", "b"))))
    val flagged = out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSet
    assert(Set(9001, 9002).subsetOf(flagged), s"planted anomalies missing from $flagged")
    assert(flagged.size <= 10) // threshold 99.5 -> at most ~0.5% of clean rows
    val a = out.where(col("id") === 9001)
      .select(col("_dq_info")(0).getField("anomaly")).collect().head.getStruct(0)
    assert(a.getAs[String]("model") == "isolation_forest")
    assert(a.getAs[Boolean]("is_anomaly"))
    assert(a.getAs[Double]("severity_percentile") >= 99.5)
    assert(a.getAs[Double]("score") > 0.5)
  }

  test("anomaly struct matches the reference 0.15.0 schema incl. ai_explanation; null by default") {
    // field-for-field parity with anomaly_info_schema.py:18-46
    import org.apache.spark.sql.types._
    val ai = graft.core.DQInfo.aiExplanationSchema
    assert(ai.fields.map(f => (f.name, f.dataType)).toSeq == Seq(
      ("narrative", StringType), ("business_impact", StringType),
      ("top_features", StringType), ("action", StringType),
      ("group_size", LongType), ("group_avg_severity", DoubleType)))
    val an = graft.core.DQInfo.anomalySchema
    assert(an.fieldNames.toSeq == Seq("check_name", "score", "severity_percentile",
      "is_anomaly", "threshold", "model", "segment", "contributions",
      "confidence_std", "ai_explanation"))
    assert(an("ai_explanation").dataType == ai)
    // default explainer leaves the sub-struct NULL, struct-typed
    val df = Seq((1, 1.0), (2, 2.0), (3, 900.0)).toDF("id", "v")
    val out = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoRowAnomalies(Seq("v"), threshold = 1.0),
      "has_no_row_anomalies", Seq("v"))))
    val aiCol = out.select(col("_dq_info")(0).getField("anomaly").getField("ai_explanation").as("x"))
    assert(aiCol.schema("x").dataType == ai)
    assert(aiCol.where(col("x").isNotNull).count() == 0)
  }

  test("TopFeaturesAnomalyExplainer: deterministic pattern + group stats, redaction, metadata path") {
    val rnd = new java.util.Random(5)
    val normal = (1 to 400).map(i => (i, 50.0 + rnd.nextGaussian(), 100.0 + rnd.nextGaussian(), 5.0))
    // two planted anomalies sharing the same dominant feature -> same group
    val planted = Seq((9001, 5000.0, 100.0, 5.0), (9002, 5200.0, 100.0, 5.0))
    val df = (normal ++ planted).toDF("id", "a", "b", "c")
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "has_no_row_anomalies",
        "arguments" -> Map("columns" -> Seq("a", "b", "c"), "threshold" -> 8.0,
          "anomaly_explainer_class" -> "graft.anomaly.TopFeaturesAnomalyExplainer",
          "redact_columns" -> Seq("b"), "max_groups" -> 10)))))
    val ex = out.where(col("id") >= 9001)
      .select(col("_dq_info")(0).getField("anomaly").getField("ai_explanation").as("x"))
      .collect().map(_.getStruct(0))
    assert(ex.length == 2 && ex.forall(_ != null))
    ex.foreach { s =>
      // 'a' dominates; 'b' is redacted so the pattern pairs a with c
      assert(s.getAs[String]("top_features") == "a+c", s.getAs[String]("top_features"))
      assert(s.getAs[Long]("group_size") == 2L)
      assert(s.getAs[String]("narrative") == null && s.getAs[String]("action") == null)
    }
    // clean rows: null sub-struct
    assert(out.where(col("id") < 9001)
      .select(col("_dq_info")(0).getField("anomaly").getField("ai_explanation").as("x"))
      .where(col("x").isNotNull).count() == 0)
    // enable_ai_explanation=false (or enable_contributions=false) -> null even
    // with an explainer class (the reference's resolve rule)
    val off = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "has_no_row_anomalies",
        "arguments" -> Map("columns" -> Seq("a", "b", "c"), "threshold" -> 8.0,
          "anomaly_explainer_class" -> "graft.anomaly.TopFeaturesAnomalyExplainer",
          "enable_contributions" -> false)))))
    assert(off.select(col("_dq_info")(0).getField("anomaly").getField("ai_explanation").as("x"))
      .where(col("x").isNotNull).count() == 0)
    // and contributions themselves are nulled when disabled
    assert(off.select(col("_dq_info")(0).getField("anomaly").getField("contributions").as("m"))
      .where(col("m").isNotNull).count() == 0)
  }

  test("TemplateAnomalyExplainer: every ai_explanation field populated, LLM-free") {
    val rnd = new java.util.Random(5)
    val normal = (1 to 400).map(i => (i, 50.0 + rnd.nextGaussian(), 100.0 + rnd.nextGaussian(), 5.0))
    val planted = Seq((9001, 5000.0, 100.0, 5.0), (9002, 5200.0, 100.0, 5.0))
    val df = (normal ++ planted).toDF("id", "a", "b", "c")
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "has_no_row_anomalies",
        "arguments" -> Map("columns" -> Seq("a", "b", "c"), "threshold" -> 8.0,
          "anomaly_explainer_class" -> "graft.anomaly.TemplateAnomalyExplainer")))))
    val ex = out.where(col("id") >= 9001)
      .select(col("_dq_info")(0).getField("anomaly").getField("ai_explanation").as("x"))
      .collect().map(_.getStruct(0))
    assert(ex.length == 2 && ex.forall(_ != null))
    ex.foreach { s =>
      val tf = s.getAs[String]("top_features")
      assert(tf != null && tf.nonEmpty && tf != "unknown", tf)
      assert(s.getAs[Long]("group_size") == 2L)
      // deterministic template text references the pattern in every field
      assert(s.getAs[String]("narrative").contains(tf))
      assert(s.getAs[String]("narrative").contains("one of 2 records"))
      assert(s.getAs[String]("business_impact").contains(tf))
      assert(s.getAs[String]("action").contains(tf))
    }
    // clean rows stay null
    assert(out.where(col("id") < 9001)
      .select(col("_dq_info")(0).getField("anomaly").getField("ai_explanation").as("x"))
      .where(col("x").isNotNull).count() == 0)
    // determinism: a second run produces identical text
    val again = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "has_no_row_anomalies",
        "arguments" -> Map("columns" -> Seq("a", "b", "c"), "threshold" -> 8.0,
          "anomaly_explainer_class" -> "graft.anomaly.TemplateAnomalyExplainer")))))
      .where(col("id") >= 9001)
      .select(col("_dq_info")(0).getField("anomaly").getField("ai_explanation").getField("narrative"))
      .as[String].collect().sorted
    assert(again.toSeq == ex.map(_.getAs[String]("narrative")).sorted.toSeq)
  }

  test("ai_explanation_llm_model_config dict keys are validated (typos surface early)") {
    val df = Seq((1, 1.0)).toDF("id", "v")
    def build(cfg: Any): Unit = {
      DQEngine.applyChecksByMetadata(df, Seq(Map(
        "criticality" -> "error",
        "check" -> Map("function" -> "has_no_row_anomalies",
          "arguments" -> Map("columns" -> Seq("v"), "threshold" -> 100.0,
            "ai_explanation_llm_model_config" -> cfg)))))
      ()
    }
    // all reference LLMModelConfig fields accepted
    build(Map("model_name" -> "ep", "api_key" -> "", "api_base" -> "",
      "max_tokens" -> 500, "temperature" -> 0.0, "timeout" -> 30.0, "max_retries" -> 3))
    // unknown key -> the reference's early error
    val e = intercept[IllegalArgumentException](build(Map("model" -> "typo")))
    assert(e.getMessage.contains("unknown keys"))
    // non-mapping -> rejected
    intercept[IllegalArgumentException](build("not-a-map"))
    // max_groups must be positive
    intercept[IllegalArgumentException] {
      DQEngine.applyChecksByMetadata(df, Seq(Map(
        "criticality" -> "error",
        "check" -> Map("function" -> "has_no_row_anomalies",
          "arguments" -> Map("columns" -> Seq("v"), "max_groups" -> 0)))))
    }
  }

  test("topContributors formats the reference's 'col (N%)' string: sort, ties, nulls, topN") {
    import graft.anomaly.Explain
    val df = Seq(1).toDF("id").select(col("id"),
      map(lit("amount"), lit(85.0), lit("quantity"), lit(10.0), lit("discount"), lit(5.0)).as("m"),
      map(lit("b"), lit(50.0), lit("a"), lit(50.0)).as("tied"),
      map(lit("x"), lit(null).cast("double"), lit("y"), lit(30.4)).as("withNull"),
      map().cast("map<string,double>").as("empty"),
      lit(null).cast("map<string,double>").as("nullMap"))
    val r = df.select(
      Explain.topContributors(col("m"), 2).as("top2"),
      Explain.topContributors(col("m"), 10).as("all3"),
      Explain.topContributors(col("tied"), 2).as("tied"),
      Explain.topContributors(col("withNull"), 3).as("withNull"),
      Explain.topContributors(col("empty"), 3).as("empty"),
      Explain.topContributors(col("nullMap"), 3).as("nullMap")).head()
    assert(r.getAs[String]("top2") == "amount (85%), quantity (10%)") // explainability.py:155 example
    assert(r.getAs[String]("all3") == "amount (85%), quantity (10%), discount (5%)")
    assert(r.getAs[String]("tied") == "a (50%), b (50%)") // name tiebreak -> deterministic
    assert(r.getAs[String]("withNull") == "y (30%)") // null-valued entries dropped
    assert(r.getAs[String]("empty") == "")
    assert(r.isNullAt(r.fieldIndex("nullMap"))) // null map -> null (coalesce at call sites)
  }

  test("addTopContributors appends formatted text only at/above the severity threshold") {
    import graft.anomaly.Explain
    val rnd = new java.util.Random(7)
    val normal = (1 to 800).map(i => (i, 50.0 + rnd.nextGaussian() * 3, 100.0 + rnd.nextGaussian() * 5))
    val planted = Seq((9001, 500.0, -400.0))
    val df = (normal ++ planted).toDF("id", "a", "b")
    val checked = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoRowAnomaliesIForest(Seq("a", "b"), threshold = 99.5, seed = 11),
      "has_no_row_anomalies", Seq("a", "b"))))
    val out = Explain.addTopContributors(checked, threshold = 99.5, topN = 2)
    val flagged = out.where(col("id") === 9001).select("_top_contributors").as[String].head()
    assert(flagged.matches("[ab] \\(\\d+%\\), [ab] \\(\\d+%\\)"), s"unexpected format: $flagged")
    // below-threshold rows get the reference's empty-string convention
    val clean = out.where(col("_errors").isNull)
      .select(sum(when(col("_top_contributors") =!= "", 1).otherwise(0)).cast("long")).head().getLong(0)
    assert(clean == 0)
  }

  test("drift: scores, detection, and the zero-std conventions") {
    import graft.anomaly.Drift
    // scalar formula branches (drift.py:74-110)
    assert(Drift.columnDriftScore(10.0, 2.0, Some(14.0), Some(3.0)) ==
      0.7 * 2.0 + 0.3 * 0.5) // z=|14-10|/2, stdChange=|3-2|/2
    assert(Drift.columnDriftScore(10.0, 0.0, Some(12.5), Some(0.0)) == 0.7 * 2.5) // bs=0 -> abs diff
    assert(Drift.columnDriftScore(10.0, 0.0, Some(10.0), Some(0.0)) == 0.0)
    assert(Drift.columnDriftScore(10.0, 2.0, Some(10.0), Some(0.0)) == 0.3) // collapsed std
    assert(Drift.columnDriftScore(10.0, 2.0, None, None) == 0.3) // null cur -> (bm, 0)

    // baseline from a training frame, one agg pass
    val train = (1 to 2000).map(i => (i, 100.0 + (i % 10), (i % 2) == 0)).toDF("id", "v", "b")
    val base = Drift.baselineStats(train, Seq("v", "b"))
    assert(math.abs(base("v").mean - 104.5) < 1e-9)
    assert(base("b").mean == 0.5) // boolean cast to double

    // shifted current frame -> drift detected on the shifted column only
    val cur = (1 to 2000).map(i => (i, 200.0 + (i % 10), (i % 2) == 0)).toDF("id", "v", "b")
    val res = Drift.computeDriftScore(cur, Seq("v", "b"), base, threshold = 3.0)
    assert(res.driftDetected && res.recommendation == "retrain")
    assert(res.driftedColumns == Seq("v") && res.sampleSize == 2000)
    assert(res.columnScores("v") > 3.0 && res.columnScores("b") < 0.1)

    // unshifted current frame -> ok
    val same = Drift.computeDriftScore(train, Seq("v", "b"), base)
    assert(!same.driftDetected && same.recommendation == "ok" && same.driftScore < 0.1)
  }

  test("drift: small batches are skipped, missing columns ignored") {
    import graft.anomaly.Drift
    val base = Map("v" -> Drift.ColumnStats(10.0, 1.0))
    val small = (1 to 50).map(i => (i, 9999.0)).toDF("id", "v")
    val res = Drift.computeDriftScore(small, Seq("v"), base)
    assert(!res.driftDetected && res.recommendation == "skipped_small_batch" && res.sampleSize == 50)
    // column absent from baseline and frame -> ok, no throw
    val none = Drift.computeDriftScore(small, Seq("w"), base)
    assert(!none.driftDetected && none.columnScores.isEmpty)
  }

  test("model registry: train -> save -> load -> score parity, drift gate") {
    import graft.anomaly.{Drift, ModelRegistry}
    import graft.checks.DatasetChecks
    val rnd = new java.util.Random(17)
    val rows = (1 to 1500).map(i =>
      (i, 50.0 + rnd.nextGaussian() * 3, 100.0 + rnd.nextGaussian() * 5)) :+
      ((9999, 500.0, -400.0))
    val df = rows.toDF("id", "a", "b")
    val rec = ModelRegistry.train(df, Seq("a", "b"), "m1",
      numTrees = 50, trainRows = 1501, seed = 9, trainedAtEpochMs = 1700000000000L)
    assert(rec.trainingRows == 1501 && rec.algorithm == "isolation_forest")
    assert(math.abs(rec.baselineStats("a").mean - 50.0) < 1.0)

    // JSON round trip is exact (model trees + sorted scores + stats)
    val loaded = ModelRegistry.parse(ModelRegistry.render(rec))
    assert(loaded.trainScoresSorted.toSeq == rec.trainScoresSorted.toSeq)
    assert(loaded.baselineStats == rec.baselineStats)
    assert(loaded.model.score(Array(500.0, -400.0)) == rec.model.score(Array(500.0, -400.0)))

    // file round trip via Hadoop FS
    val path = java.nio.file.Files.createTempDirectory("graft_reg").resolve("m1.json")
    ModelRegistry.save(spark, path.toUri.toString, rec)
    val fromDisk = ModelRegistry.load(spark, path.toUri.toString)

    // scoring with the loaded record flags the same rows as the inline train
    def flagged(check: graft.rules.DatasetCheck): Set[Int] = {
      val out = DQEngine.applyChecks(df, Seq(DQDatasetRule(check, "has_no_row_anomalies", Seq("a"))))
      out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSet
    }
    val inline = flagged(DatasetChecks.hasNoRowAnomaliesIForest(Seq("a", "b"),
      numTrees = 50, trainRows = 1501, seed = 9))
    val pretrained = flagged(DatasetChecks.hasNoRowAnomaliesPretrained(fromDisk))
    assert(pretrained == inline && pretrained.contains(9999))

    // drift gate on the stored baseline: same data ok, shifted data retrains
    assert(ModelRegistry.checkDrift(df, fromDisk).recommendation == "ok")
    val shifted = df.withColumn("a", col("a") + 1000.0)
    val drift = ModelRegistry.checkDrift(shifted, fromDisk)
    assert(drift.driftDetected && drift.driftedColumns == Seq("a"))
  }

  test("segment drift: one grouped pass, per-segment baselines, small segments skipped") {
    import graft.anomaly.Drift
    val df = ((1 to 1200).map(i => (i, "a", 10.0 + (i % 3))) ++ // on-baseline
      (1 to 1200).map(i => (2000 + i, "b", 500.0)) ++ // far from baseline
      (1 to 20).map(i => (4000 + i, "c", 999.0))) // tiny segment -> skipped
      .toDF("id", "seg", "v")
    val base = Map(
      Seq("a") -> Map("v" -> Drift.ColumnStats(11.0, 1.0)),
      Seq("b") -> Map("v" -> Drift.ColumnStats(10.0, 1.0)),
      Seq("c") -> Map("v" -> Drift.ColumnStats(10.0, 1.0)),
      Seq("d") -> Map("v" -> Drift.ColumnStats(0.0, 1.0))) // absent from data
    val out = Drift.segmentDriftScores(df, Seq("seg"), base)
      .select("seg", "drifted", "sample_size")
      .as[(String, Boolean, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set("a", "b", "c")) // segment d has no data rows
    assert(out("a") == ((false, 1200L)))
    assert(out("b") == ((true, 1200L)))
    assert(out("c") == ((false, 20L))) // huge shift but under min sample
    // one aggregation: exactly one Exchange below the baseline join
    val plan = Drift.segmentDriftScores(df, Seq("seg"), base)
      .queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan)
  }

  test("segment drift: multi-column segments join on the columns, not a concat key") {
    import graft.anomaly.Drift
    // ("a","bc") vs ("ab","c") — identical under any separator-less concat;
    // plus a null segment value, which concat_ws would silently drop.
    val df = ((1 to 1200).map(i => (i, "a", "bc", 10.0)) ++
      (1 to 1200).map(i => (3000 + i, "ab", "c", 10.0)) ++
      (1 to 1200).map(i => (6000 + i, null.asInstanceOf[String], "a", 10.0)))
      .toDF("id", "s1", "s2", "v")
    val base = Map(
      Seq("a", "bc") -> Map("v" -> Drift.ColumnStats(10.0, 1.0)), // matches -> no drift
      Seq("ab", "c") -> Map("v" -> Drift.ColumnStats(99.0, 1.0)), // far -> drift
      Seq(null.asInstanceOf[String], "a") -> Map("v" -> Drift.ColumnStats(50.0, 1.0)))
    val out = Drift.segmentDriftScores(df, Seq("s1", "s2"), base)
      .select("s1", "s2", "drifted")
      .as[(String, String, Boolean)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out.size == 3)
    assert(out(("a", "bc")) == false) // would be true if keyed on "abc" collision
    assert(out(("ab", "c")) == true)
    assert(out((null, "a")) == true) // null segment value still matches its baseline
  }

  test("has_no_drift dataset check: flag-all on drift, pass otherwise, metadata path") {
    import graft.anomaly.Drift
    import graft.checks.DatasetChecks
    val df = (1 to 1500).map(i => (i, 10.0 + (i % 5))).toDF("id", "v")
    def run(check: graft.rules.DatasetCheck): Long =
      DQEngine.applyChecks(df, Seq(DQDatasetRule(check, "has_no_drift", Seq("v"))))
        .where(col("_errors").isNotNull).count()
    // baseline matches -> pass
    val good = Map("v" -> Drift.ColumnStats(12.0, 1.5))
    assert(run(DatasetChecks.hasNoDrift(Seq("v"), good)) == 0)
    // baseline far off -> every row fails with the drift story
    val bad = Map("v" -> Drift.ColumnStats(100.0, 1.0))
    val out = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoDrift(Seq("v"), bad), "has_no_drift", Seq("v"))))
    assert(out.where(col("_errors").isNotNull).count() == 1500)
    val msg = out.select(to_json(col("_errors"))).head().getString(0)
    assert(msg.contains("drift") && msg.contains("retrain") && msg.contains("v (score"))
    // small batch -> skipped, no failures even with the bad baseline
    val small = (1 to 50).map(i => (i, 10.0)).toDF("id", "v")
    assert(DQEngine.applyChecks(small, Seq(DQDatasetRule(
      DatasetChecks.hasNoDrift(Seq("v"), bad), "has_no_drift", Seq("v"))))
      .where(col("_errors").isNotNull).count() == 0)
    // metadata path with an inline baseline map
    val meta = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "has_no_drift", "arguments" -> Map(
        "baseline" -> Map("v" -> Map("mean" -> 100.0, "std" -> 1.0)),
        "threshold" -> 3.0)))))
    assert(meta.where(col("_errors").isNotNull).count() == 1500)
  }

  test("metadata path loads a pretrained model from a file location") {
    import graft.anomaly.ModelRegistry
    val df = ((1 to 1200).map(i => (i, 10.0)) :+ ((999, 99999.0))).toDF("id", "v")
    val rec = ModelRegistry.train(df, Seq("v"), "m2", trainRows = 1201, seed = 3)
    val path = java.nio.file.Files.createTempDirectory("graft_reg2").resolve("m2.json")
    ModelRegistry.save(spark, path.toUri.toString, rec)
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "has_no_row_anomalies",
        "arguments" -> Map("method" -> "isolation_forest_pretrained",
          "model_location" -> path.toUri.toString, "threshold" -> 99.0)))))
    val bad = out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSet
    assert(bad == Set(999))
  }

  test("metadata path selects the isolation_forest method") {
    val df = ((1 to 300).map(i => (i, 10.0)) :+ ((999, 99999.0))).toDF("id", "v")
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "has_no_row_anomalies",
        "arguments" -> Map("columns" -> Seq("v"), "method" -> "isolation_forest",
          "threshold" -> 99.0)))))
    val flagged = out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSet
    assert(flagged == Set(999))
  }
}
