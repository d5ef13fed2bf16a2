package graft.tools

import graft.BenchRef
import graft.checks.DatasetChecks
import graft.engine.DQEngine
import graft.rules.DQDatasetRule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B (VERDICT r9 "Next #1"): foreign_key plan variants at the
  * honest protocol (full verdict materialization via BenchRef.touch).
  *
  * Shapes under test (DatasetChecks.foreignKey `strategy`):
  *  - join:  the pre-r10 plain left join against the deduped ref — the
  *           planner's choice (SMJ for unbroadcastable refs: full-width
  *           sort+shuffle of the checked frame per FK rule);
  *  - probe: slim keys-probe — distinct checked keys, anti/semi join against
  *           the deduped ref (both sides slim), violating-key marker joined
  *           back by key with a SHUFFLE_HASH build (AQE upgrades to
  *           broadcast when violations are sparse).
  *
  * Fixtures (each x both strategies):
  *  - foreach_fk_dense:  the bench's worst case — 5 single-column string FK
  *    rules where EVERY key violates ("sN..." prefixed values vs digit-only
  *    ref) and the ref has `rows` distinct keys;
  *  - foreach_fk_sparse: same shape but keys match the ref digits except a
  *    0.1% planted violation rate — the steady-state DQ case;
  *  - fk_single_clean:   one composite-key int FK where every non-null key
  *    matches (the fkSingle bench suite).
  */
object FkProbe {
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

    val sdf = BenchRef.stringDf(spark, rows)
    // digit-only string keys that mostly exist in the ref: id except every
    // 1000th row keyed as -(id) (absent from the 0..rows ref)
    def sparseDf: DataFrame =
      spark.range(0L, rows, 1L, BenchRef.Partitions).select(
        (1 to 5).map(i => when(col("id") % 1000 === 999, -col("id") - 1)
          .otherwise(col("id")).cast("string").as(s"col$i")): _*)
    def strRef: DataFrame =
      BenchRef.refDf(spark, rows).select(col("ref_col1").cast("string").as("ref_col1"))
    val df = BenchRef.generatedDf(spark, rows)
    val intRef = BenchRef.refDf(spark, rows)

    def foreachFk(frame: DataFrame, strategy: String): DataFrame =
      DQEngine.applyChecks(frame, (1 to 5).map(i => DQDatasetRule(
        DatasetChecks.foreignKey(Seq(s"col$i"), Seq("ref_col1"), strRef, strategy = strategy),
        "foreign_key", Seq(s"col$i"), criticality = graft.core.Criticality.Warn)))
    def fkSingle(strategy: String): DataFrame =
      DQEngine.applyChecks(df, Seq(DQDatasetRule(
        DatasetChecks.foreignKey(Seq("col1", "col2"), Seq("ref_col1", "ref_col2"), intRef,
          strategy = strategy),
        "foreign_key", Seq("col1", "col2"), criticality = graft.core.Criticality.Warn)))

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
      f"disk_mb_s=${BenchRef.diskProbeMbS}%.1f")
    println("== foreach_fk_dense (bench worst case: 100% violations) ==")
    run("dense_join")(foreachFk(sdf, "join"))
    run("dense_probe")(foreachFk(sdf, "probe"))
    println("== foreach_fk_sparse (0.1% violations) ==")
    run("sparse_join")(foreachFk(sparseDf, "join"))
    run("sparse_probe")(foreachFk(sparseDf, "probe"))
    println("== fk_single_clean (composite int key, all matched) ==")
    run("single_join")(fkSingle("join"))
    run("single_probe")(fkSingle("probe"))
    spark.stop()
  }
}
