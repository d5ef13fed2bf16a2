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
