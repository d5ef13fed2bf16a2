package graft.tools

import graft.BenchRef
import graft.checks.DatasetChecks
import graft.engine.DQEngine
import graft.rules.DQDatasetRule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B (VERDICT r10 "Next #1", superseding the r6/r7 local-variant probe):
  * `DatasetChecks.isUnique` strategy variants at the honest protocol
  * (full verdict materialization via BenchRef.touch).
  *
  * Shapes under test (DatasetChecks.isUnique `strategy`):
  *  - window: the reference's plan (check_funcs.py:1874) — per-key window
  *            count; 5 chained FULL-WIDTH sort shuffles;
  *  - probe:  slim dup-key probe — groupBy(key).count (map-side partial
  *            agg) -> count>1 keys -> SHUFFLE_HASH join-back of the count
  *            marker (AQE upgrades to broadcast when duplicates are
  *            sparse; no sort of the full-width stream either way).
  *
  * Fixtures (each x both strategies):
  *  - foreach_unique_dense:  the bench's 100M shape — 5 single-column
  *    is_unique rules on stringDf (rows/5e6-way duplication, EVERY key a
  *    duplicate: the probe's worst case, the dup-key set is all 5M keys);
  *  - foreach_unique_sparse: mostly-unique keys with 0.1% planted dup
  *    pairs — the steady-state DQ case (probe's best case: the dup-key
  *    set broadcasts).
  *
  * Run directly for quick in-JVM medians, or via BenchRefMain-style
  * fresh-JVM children per cell with SPARK_GRAFT_UNIQUE_CELL=<name> for
  * isolated medians (the FkProbe r10 protocol).
  */
object UniqueProbe {
  def cells(spark: SparkSession, rows: Long): Seq[(String, () => DataFrame)] = {
    def sparseDf: DataFrame =
      spark.range(0L, rows, 1L, BenchRef.Partitions).select(
        (0 until 5).map(i => concat(lit(s"s$i"),
          when(col("id") % 1000 === 999, col("id") - 1).otherwise(col("id")).cast("string"))
          .as(s"col${i + 1}")): _*)
    def suite(df: => DataFrame, strategy: String): DataFrame =
      DQEngine.applyChecks(df, (1 to 5).map(i => DQDatasetRule(
        DatasetChecks.isUnique(Seq(s"col$i"), nullsDistinct = false, strategy = strategy),
        "is_unique", Seq(s"col$i"), criticality = graft.core.Criticality.Warn)))
    Seq(
      "dense_window"  -> (() => suite(BenchRef.stringDf(spark, rows), "window")),
      "dense_probe"   -> (() => suite(BenchRef.stringDf(spark, rows), "probe")),
      "sparse_window" -> (() => suite(sparseDf, "window")),
      "sparse_probe"  -> (() => suite(sparseDf, "probe")))
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.get("SPARK_GRAFT_BENCH_ROWS").map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val onlyCell = sys.env.get("SPARK_GRAFT_UNIQUE_CELL")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String)(f: => DataFrame): Unit = {
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

    println(s"rows=$rows heapMaxMb=${Runtime.getRuntime.maxMemory() / 1024 / 1024} " +
      f"disk_mb_s=${BenchRef.diskProbeMbS}%.1f cell=${onlyCell.getOrElse("ALL")}")
    cells(spark, rows)
      .filter { case (n, _) => onlyCell.forall(_ == n) }
      .foreach { case (n, f) => run(n)(f()) }
    spark.stop()
  }
}
