package graft.tools

import graft.BenchRef
import graft.core.CheckUtils._
import graft.engine.DQEngine
import graft.rules.{DQDatasetRule, DatasetCheck}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off A/B (VERDICT r6 "Next #2"): foreach_is_unique plan variants at the
  * 8g spill boundary. Five per-column is_unique checks over the 10M string
  * fixture, each variant consumed through the honest result-reading action:
  *
  *  - window:    the shipped per-column `Window.partitionBy(col)` count
  *               (reference parity, check_funcs.py:1874) — 5 chained full-row
  *               sort shuffles;
  *  - twostage:  `groupBy(col).count` (hash agg, partial combine), keep only
  *               count>1 groups, LEFT join back — AQE picks broadcast when the
  *               duplicate-key set is small (real-data case: near-zero extra
  *               cost) or shuffle join when it is not (this fixture: every key
  *               is a duplicate);
  *  - twostage_hash: same with a SHUFFLE_HASH hint on the agg side (skips the
  *               SMJ sorts that make twostage degenerate to the window cost).
  */
object UniqueProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.get("SPARK_GRAFT_BENCH_ROWS").map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def isUniqueWindow(c: String): DatasetCheck = {
      val id = uniqueSuffix()
      val cntCol = s"__dq_unique_count_$id"
      val applyFn = (df: DataFrame) =>
        df.withColumn(cntCol, count(lit(1)).over(Window.partitionBy(col(c))))
      DatasetCheck(applyFn,
        makeCondition(col(cntCol) > 1,
          concat(lit("Value '"), valueText(col(c)), lit(s"' in column '$c' is not unique, found "),
            col(cntCol).cast("string"), lit(" duplicates"))))
    }

    def isUniqueTwoStage(c: String, hashHint: Boolean): DatasetCheck = {
      val id = uniqueSuffix()
      val cntCol = s"__dq_unique_count_$id"
      val keyAlias = s"__dq_unique_key_$id"
      val applyFn = (df: DataFrame) => {
        val dups0 = df.groupBy(col(c).as(keyAlias))
          .agg(count(lit(1)).as(cntCol))
          .where(col(cntCol) > 1)
        val dups = if (hashHint) dups0.hint("SHUFFLE_HASH") else dups0
        df.join(dups, col(c) === col(keyAlias), "left").drop(keyAlias)
      }
      DatasetCheck(applyFn,
        makeCondition(col(cntCol) > 1,
          concat(lit("Value '"), valueText(col(c)), lit(s"' in column '$c' is not unique, found "),
            col(cntCol).cast("string"), lit(" duplicates"))))
    }

    def suite(mk: String => DatasetCheck): DataFrame = {
      val sdf = BenchRef.stringDf(spark, rows)
      val rules = (1 to 5).map(i => DQDatasetRule(mk(s"col$i"), "is_unique", Seq(s"col$i"),
        criticality = graft.core.Criticality.Warn))
      DQEngine.applyChecks(sdf, rules)
    }

    def run(name: String)(f: => DataFrame): Unit = {
      // warmup + median of 3, suite-isolated like BenchRef.benchNamed
      def once(): Double = {
        spark.sharedState.cacheManager.clearCache(); System.gc()
        val t0 = System.nanoTime()
        BenchRef.touch(f)
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (0 until 3).map(_ => once()).sorted
      println(f"$name: median=${ts(1)}%.2f s rounds=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // also probe the real-data shape: mostly-unique keys (0.1% dup pairs)
    def mostlyUniqueDf: DataFrame =
      spark.range(0L, rows, 1L, BenchRef.Partitions).select(
        (0 until 5).map(i => concat(lit(s"s$i"),
          when(col("id") % 1000 === 999, col("id") - 1).otherwise(col("id")).cast("string"))
          .as(s"col${i + 1}")): _*)
    def suiteOn(df: => DataFrame, mk: String => DatasetCheck): DataFrame = {
      val rules = (1 to 5).map(i => DQDatasetRule(mk(s"col$i"), "is_unique", Seq(s"col$i"),
        criticality = graft.core.Criticality.Warn))
      DQEngine.applyChecks(df, rules)
    }

    println(s"rows=$rows heapMaxMb=${Runtime.getRuntime.maxMemory() / 1024 / 1024}")
    println("== fixture: stringDf (every key duplicated) ==")
    run("window")(suite(isUniqueWindow))
    run("twostage")(suite(isUniqueTwoStage(_, hashHint = false)))
    run("twostage_hash")(suite(isUniqueTwoStage(_, hashHint = true)))
    println("== fixture: mostly-unique (0.1% dup pairs) ==")
    run("mu_window")(suiteOn(mostlyUniqueDf, isUniqueWindow))
    run("mu_twostage")(suiteOn(mostlyUniqueDf, isUniqueTwoStage(_, hashHint = false)))
    spark.stop()
  }
}
