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
