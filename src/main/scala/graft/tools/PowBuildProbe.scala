package graft.tools

import graft.checks.DatasetChecks
import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the r13 partitioned-window compile cost (VERDICT
  * r12 next #2): splits the countparity cell of has_no_aggr_outliers into
  * rule BUILD (applyChecks — analysis only), OPTIMIZE (optimizedPlan force),
  * and EXECUTE (bare count) so the per-phase cost of the ungrouped-bucket
  * helper is on record rather than inferred from end-to-end deltas.
  */
object PowBuildProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.get("SPARK_GRAFT_PROBE_ROWS").map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.BenchRef.generatedDf(spark, rows)
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    // helper-only timing: the slim bucket frame as the caller builds it
    val bucketed = df.withColumn("g", window(coalesce(col("col6"),
        lit("1900-01-01 00:00:00").cast("timestamp")), "30 days").getField("start"))
      .groupBy(col("g")).agg(count(lit(1)).as("cur"))
    for (r <- 0 until 4) {
      val helperOnly = t {
        DatasetChecks.withPartitionedOrderedWindow(bucketed, "g", 10, 0) { (f, w) =>
          f.withColumn("m", avg(col("cur")).over(w.rowsBetween(-10, -1)))
        }
      }
      println(f"POWPROBE helperOnly=$helperOnly%.3f")
      var out: org.apache.spark.sql.DataFrame = null
      val build = t {
        out = DQEngine.applyChecks(df, Seq(DQDatasetRule(
          DatasetChecks.hasNoAggrOutliers("*", "col6", "count", sigma = 6.0, timeInterval = "30 days"),
          "has_no_aggr_outliers", Seq.empty)))
      }
      var counted: org.apache.spark.sql.DataFrame = null
      val opt = t { counted = out.select(count(lit(1))); counted.queryExecution.optimizedPlan }
      val exec = t { counted.first() }
      val joins = counted.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.size
      println(f"POWPROBE round=$r build=$build%.3f opt=$opt%.3f exec=$exec%.3f joins=$joins")
      if (r == 0) {
        val honest = out.select(count(org.apache.spark.sql.functions.when(
          col("_errors").isNotNull, 1)))
        honest.collect()
        val plan = honest.queryExecution.executedPlan.toString
        val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toList
        val reused = "ReusedExchange".r.findAllIn(plan).size
        val exch = "Exchange".r.findAllIn(plan).size
        val aggs = "HashAggregate".r.findAllIn(plan).size
        val scans = "Scan\\b".r.findAllIn(plan).size
        println(s"POWPROBE honest-plan: exchanges=$exch reused=$reused hashAggs=$aggs " +
          s"stages=${stageIds.size} distinctStages=${stageIds.distinct.size} scans=$scans")
        val ranges = "Range \\(".r.findAllIn(plan).size
        val partialAggs = "partial_count".r.findAllIn(plan).size
        val pctAggs = "percentile_approx".r.findAllIn(plan).size
        println(s"POWPROBE leafs: ranges=$ranges partialCounts=$partialAggs pct=$pctAggs")
        println("POWPROBE stages: " + "ShuffleQueryStage \\d+".r.findAllIn(plan).mkString(","))
        java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/pow_plan.txt"),
          plan.getBytes)
      }

    }
    spark.stop()
  }
}
