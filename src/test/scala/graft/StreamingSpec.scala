package graft

import graft.checks.RowChecks
import graft.engine.{DQEngine, DQRunner}
import graft.io.{InputConfig, OutputConfig}
import graft.metrics.StreamingMetricsListener
import graft.rules.DQRowRule
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Structured Streaming parity: row checks run incrementally in the stream
  * plan; dataset checks run per-micro-batch via the foreachBatch runner
  * (reference semantics, check_funcs.py:1835, engine.py:655-658).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("row checks apply to a streaming DataFrame in-plan with observe metrics") {
    val dir = tmp("stream_in")
    Seq((1, "a"), (2, null), (3, "c")).toDF("id", "name")
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("id INT, name STRING").parquet(dir)
    val rules = Seq(DQRowRule(RowChecks.isNotNull(col("name")), "is_not_null", Seq("name")))
    val checked = DQEngine.applyChecks(stream, rules)
    assert(checked.isStreaming)

    val listener = new StreamingMetricsListener("dq_stream")
    spark.streams.addListener(listener)
    try {
      val observed = checked.observe("dq_stream",
        count(lit(1)).as("input_row_count"),
        count(when(col("_errors").isNotNull, lit(1))).as("error_row_count"),
        expr(graft.metrics.Metrics.checkMetricsExpr(rules.map(_.resolvedName))).as("check_metrics"))
      val q = observed.writeStream.format("memory").queryName("dq_stream_out")
        .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val out = spark.table("dq_stream_out")
      assert(out.count() == 3)
      assert(out.where(col("_errors").isNotNull).count() == 1)
      // listener captured the per-batch observed metrics incl. the breakdown
      val drained = listener.drain()
      assert(drained.nonEmpty)
      assert(drained.map(_._2("error_row_count").toString.toLong).sum == 1)
      val breakdowns = drained.map(_._2("check_metrics").toString)
      assert(breakdowns.exists(_.contains("\"check_name\":\"name_is_not_null\"")))
      assert(breakdowns.exists(_.contains("\"error_count\":1")))
    } finally spark.streams.removeListener(listener)
  }

  test("streaming e2e runner: dataset checks per micro-batch with quarantine") {
    val in = tmp("stream_e2e_in")
    Seq((1, "x", 5), (1, "y", 6), (2, "z", 7)).toDF("k", "v", "n")
      .write.mode("overwrite").parquet(in)
    val out = tmp("stream_e2e_out")
    val quar = tmp("stream_e2e_quar")
    val checks = Seq(
      Map("criticality" -> "error",
        "check" -> Map("function" -> "is_unique", "arguments" -> Map("columns" -> Seq("k")))))
    val handles = DQRunner.applyChecksAndSaveInTable(spark, DQRunner.RunConfig(
      input = InputConfig(in, isStreaming = true, schema = Some("k INT, v STRING, n INT")),
      output = Some(OutputConfig(out, mode = "append", trigger = Some("availableNow"))),
      quarantine = Some(OutputConfig(quar, mode = "append")),
      checks = checks))
    handles.foreach(_.awaitTermination(60000))
    assert(spark.read.parquet(out).count() == 1) // k=2 unique
    assert(spark.read.parquet(quar).count() == 2) // k=1 duplicated within the batch
  }
}
