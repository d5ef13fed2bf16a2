package graft.tools

import graft.checks.DatasetChecks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for the r12 partitioned ordered-window rework (VERDICT r11 next #2):
  * the UNGROUPED time-bucket ranking in has_no_aggr_outliers /
  * has_no_gaps_per_time_window used to run a global `Window.orderBy` — one
  * task sorting every bucket. The fixture is the worst case the old shape
  * allowed: every row its own minute grain, so the slim bucket frame has
  * ROWS buckets and the old plan's single task sorts all of them.
  *
  * Shapes under test (identical rolling mean/stddev/count band, lookback
  * 10, plus a lead(1) pass — the two callers' exact window functions):
  *  - global: Window.orderBy(grain) — the reference's shape
  *    (check_funcs.py:2374/:3062), one task;
  *  - partitioned: DatasetChecks.withPartitionedOrderedWindow — range
  *    partitions + per-partition windows + broadcast boundary repair.
  *
  * `SPARK_GRAFT_PROBE_BUCKETS` (default 10M) sets the bucket count. Prints
  * one line per cell: name, median secs of 3 rounds after warmup.
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val buckets = sys.env.get("SPARK_GRAFT_PROBE_BUCKETS").map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // slim bucket frame: one row per minute grain, a count per bucket with
    // planted bursts (so the band actually flags and nothing folds away)
    def bucketFrame = spark.range(0, buckets).toDF("b")
      .select(
        expr("timestamp'2000-01-01 00:00:00' + make_interval(0,0,0,0,0,b,0)").as("grain"),
        when(col("b") % 1000 === 0, lit(50L)).otherwise(lit(1L)).as("cur"))

    def addStats(f: org.apache.spark.sql.DataFrame,
                 w: org.apache.spark.sql.expressions.WindowSpec) = {
      val wPrev = w.rowsBetween(-10, -1)
      f.withColumn("mean", avg(col("cur")).over(wPrev))
        .withColumn("std", stddev_pop(col("cur")).over(wPrev))
        .withColumn("n", count(col("cur")).over(wPrev))
        .withColumn("nx", lead(col("grain"), 1).over(w))
        .withColumn("flag",
          col("n") >= 3 && col("std").isNotNull &&
            abs(col("cur") - col("mean")) > lit(3.0) * col("std"))
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val v = f; ((System.nanoTime() - t0) / 1e9, v)
    }
    def cell(name: String)(f: => Long): Unit = {
      f // warmup
      val rounds = (0 until 3).map { _ => System.gc(); time(f) }
      val med = rounds.map(_._1).sorted.apply(1)
      println(f"WINDOWPROBE $name%-12s median=$med%8.2f s  rounds=${rounds.map(r => f"${r._1}%.2f").mkString("[", ",", "]")} flagged=${rounds.head._2}")
    }

    cell("partitioned") {
      DatasetChecks.withPartitionedOrderedWindow(bucketFrame, "grain", 10, 1)(addStats)
        .where(col("flag")).count()
    }
    cell("global") {
      addStats(bucketFrame, Window.orderBy(col("grain")))
        .where(col("flag")).count()
    }
    spark.stop()
  }
}
