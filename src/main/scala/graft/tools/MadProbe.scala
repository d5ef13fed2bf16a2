package graft.tools

import graft.BenchRef
import graft.checks.DatasetChecks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition of the foreach_has_no_outliers floor (VERDICT r14 #5): the
  * engine already batches the 5 rules' MAD stats into TWO driver actions
  * (all medians, then all MADs) — this probe times those actions as-is and
  * under candidate levers (input re-parallelization; narrower projection)
  * so the "fuse further" hypothesis can be accepted or refuted with data.
  *
  * SPARK_GRAFT_PROBE_ROWS=10000000 sbt "runMain graft.tools.MadProbe"
  */
object MadProbe {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.get("SPARK_GRAFT_PROBE_ROWS").map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idf = BenchRef.intDf(spark, rows) // 10 partitions, 5 identical int cols
    val specs = (1 to 5).map(i => graft.rules.MadSpec(s"col$i", 3.5, exact = false,
      None, s"lo$i", s"hi$i"))

    def cell(name: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (0 until 3).map(_ => time(f))
      println(f"MAD $name%-28s med ${ts.sorted.apply(1)}%6.2f  $ts")
    }
    cell("bands_asis") { DatasetChecks.computeMadBands(idf, specs); () }
    cell("bands_repart32") {
      DatasetChecks.computeMadBands(
        idf.repartition(spark.sparkContext.defaultParallelism), specs); ()
    }
    cell("medians_only_asis") {
      idf.select((1 to 5).map(i =>
        percentile_approx(col(s"col$i"), lit(0.5), lit(10000)).as(s"m$i")): _*).first(); ()
    }
    cell("medians_only_repart32") {
      idf.repartition(32).select((1 to 5).map(i =>
        percentile_approx(col(s"col$i"), lit(0.5), lit(10000)).as(s"m$i")): _*).first(); ()
    }
    cell("medians_only_1col") {
      idf.select(percentile_approx(col("col1"), lit(0.5), lit(10000)).as("m")).first(); ()
    }
    spark.stop()
  }
}
