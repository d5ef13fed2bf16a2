package graft.tools

import graft.BenchRef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off experiment: presence-path compare_datasets plan variants on the
  * 10-partition reference fixture. Quantifies what input widening buys each
  * side (the ref side runs a partial aggregation over its distinct keys; the
  * input side only scans + shuffle-writes), informing the widen gate.
  * `SPARK_GRAFT_BENCH_ROWS` rows (default 10M).
  */
object CompareProbe {
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
    val par = spark.sparkContext.defaultParallelism

    val df = BenchRef.generatedDf(spark, rows)
    val ref = BenchRef.refDf(spark, rows)
    println(s"df stats bytes=${df.queryExecution.optimizedPlan.stats.sizeInBytes}")
    println(s"ref stats bytes=${ref.queryExecution.optimizedPlan.stats.sizeInBytes}")

    def presence(dfIn: DataFrame, refIn: DataFrame): Long = {
      val refAgg = refIn
        .groupBy(struct(col("ref_col1"), col("ref_col2")).as("k"))
        .agg(count(lit(1)).as("n"))
      dfIn.withColumn("kl", struct(col("col1"), col("col2")))
        .join(refAgg, col("kl") === col("k"), "left")
        .select(sum(when(col("n").isNull, 1L).otherwise(0L)).as("extras"))
        .first().getLong(0)
    }

    def run(name: String)(f: => Long): Unit = {
      spark.sharedState.cacheManager.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (result=$r)")
    }

    run("presence_current_10p")(presence(df, ref))
    run("presence_ref_widened")(presence(df, ref.repartition(par)))
    run("presence_both_widened")(presence(df.repartition(par), ref.repartition(par)))
    run("presence_df_widened")(presence(df.repartition(par), ref))
    spark.stop()
  }
}
