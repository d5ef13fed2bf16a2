package graft.engine

import graft.core.ExtraParams
import graft.io.{ChecksStorageFactory, IO, InputConfig, OutputConfig}
import graft.metrics.{Metrics, MetricsRunInfo}
import graft.rules._
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** End-to-end runner (reference engine.py:853-1242): read -> apply -> save
  * (+ optional quarantine split and metrics), batch or streaming, single- or
  * multi-table with bounded driver-side parallelism.
  */
object DQRunner {

  final case class RunConfig(
      input: InputConfig,
      output: Option[OutputConfig] = None,
      quarantine: Option[OutputConfig] = None,
      checksLocation: Option[String] = None,
      checks: Seq[Map[String, Any]] = Seq.empty,
      refDfs: Map[String, DataFrame] = Map.empty,
      metricsTable: Option[String] = None,
      extra: ExtraParams = ExtraParams())

  object RunConfig {
    /** Pre-r10 positional shape (output required) kept source-compatible. */
    def apply(input: InputConfig, output: OutputConfig): RunConfig =
      RunConfig(input, Some(output))
  }

  /** Single-table E2E (engine.py:853-975). Streaming inputs run the checks
    * per micro-batch via foreachBatch — dataset checks (windows/joins/driver
    * actions) are scoped to each batch, matching the reference's explicit
    * per-micro-batch semantics (check_funcs.py:1835, :3091).
    *
    * Output configurations are INDEPENDENTLY optional (reference 0.15.0
    * #1183/#1236): quarantine-only runs write just the invalid records,
    * metrics-only runs persist the summary metrics with no data writes
    * (the observation is triggered by a dedicated pass), and a config with
    * none of output/quarantine/metrics fails fast. Metrics-only is
    * batch-only, like the reference's explicit streaming error.
    */
  def applyChecksAndSaveInTable(spark: SparkSession, cfg: RunConfig): Seq[StreamingQuery] = {
    require(cfg.output.isDefined || cfg.quarantine.isDefined || cfg.metricsTable.isDefined,
      "at least one of output, quarantine, or metricsTable is required")
    val checkDicts =
      if (cfg.checks.nonEmpty) cfg.checks
      else cfg.checksLocation.map(l => ChecksStorageFactory.forLocation(l, spark).load(l))
        .getOrElse(throw new IllegalArgumentException("checks or checksLocation required"))
    val df = IO.readInputData(spark, cfg.input)
    if (df.isStreaming && cfg.output.isEmpty && cfg.quarantine.isEmpty)
      throw new IllegalArgumentException(
        "metrics-only runs are batch-only: streaming requires an output or quarantine config")
    val rules = ChecksSerializer.deserialize(checkDicts, ResolveCtx(spark, cfg.refDfs))

    def process(batch: DataFrame): Unit = {
      // one run_id for the whole run: the result structs and the metrics rows
      // must correlate (reference shares one engine-level run_id)
      val runId = cfg.extra.runIdOverwrite.getOrElse(java.util.UUID.randomUUID().toString)
      val extra = cfg.extra.copy(runIdOverwrite = Some(runId))
      val checked = DQEngine.applyChecks(batch, rules, extra)
      val obs = new Observation(s"dq_${java.util.UUID.randomUUID().toString.take(8)}")
      val observed =
        if (cfg.metricsTable.isDefined)
          DQEngine.observeMetrics(checked, obs, extra, checkNames = rules.map(_.resolvedName))
        else checked
      (cfg.output, cfg.quarantine) match {
        case (Some(oc), Some(qc)) =>
          // one materialization of the checked frame, two filtered writes
          val cached = observed.cache()
          try {
            IO.saveDataFrame(DQEngine.getValid(cached, extra), oc)
            IO.saveDataFrame(DQEngine.getInvalid(cached, extra), qc)
          } finally cached.unpersist()
        case (Some(oc), None) =>
          IO.saveDataFrame(observed, oc)
        case (None, Some(qc)) =>
          // quarantine-only (reference #1183): write just the invalid records
          IO.saveDataFrame(DQEngine.getInvalid(observed, extra), qc)
        case (None, None) =>
          // metrics-only (reference #1236): no data writes, but the batch
          // observation needs an action to populate — a full row pass with
          // no materialized output
          observed.foreach(_ => ())
      }
      cfg.metricsTable.foreach { mt =>
        val info = MetricsRunInfo(
          runId = runId,
          inputLocation = Some(cfg.input.location),
          outputLocation = cfg.output.map(_.location),
          quarantineLocation = cfg.quarantine.map(_.location),
          checksLocation = cfg.checksLocation,
          userMetadata = extra.userMetadata)
        Metrics.buildMetricsRows(spark, obs.get, info, extra)
          .write.mode("append").saveAsTable(graft.io.IO.quoteTableName(mt))
      }
    }

    if (df.isStreaming) {
      val streamCfg = cfg.output.orElse(cfg.quarantine).get // guarded above
      val q = df.writeStream
        .foreachBatch((batch: DataFrame, _: Long) => process(batch))
        .option("checkpointLocation",
          streamCfg.checkpointLocation.getOrElse(
            Files.createTempDirectory("dq_ckpt").toString))
        .trigger(streamCfg.trigger match {
          case Some("availableNow") => org.apache.spark.sql.streaming.Trigger.AvailableNow()
          case Some(t) if t.startsWith("processingTime=") =>
            org.apache.spark.sql.streaming.Trigger.ProcessingTime(t.stripPrefix("processingTime="))
          case _ => org.apache.spark.sql.streaming.Trigger.AvailableNow()
        })
        .start()
      Seq(q)
    } else {
      process(df)
      Seq.empty
    }
  }

  private object Files {
    def createTempDirectory(prefix: String): java.nio.file.Path =
      java.nio.file.Files.createTempDirectory(prefix)
  }

  /** Wildcard-pattern fan-out (engine.py:1147-1242): discover catalog tables
    * matching `pattern` (SQL LIKE-style `%`/`_` or glob `*`), build a RunConfig
    * per table with conventional locations:
    * output = `<table><outputSuffix>`, checks = `<checksDir>/<table>.yml`.
    */
  def applyChecksAndSaveInTablesForPatterns(
      spark: SparkSession, pattern: String, checksDir: String,
      outputSuffix: String = "_checked", quarantineSuffix: Option[String] = None,
      maxParallelism: Int = 4, extra: ExtraParams = ExtraParams()): Seq[String] = {
    val re = pattern.replace(".", "\\.").replace("%", ".*").replace("*", ".*").replace("_", ".")
    val tables = spark.catalog.listTables().collect()
      .filter(t => t.name.matches(re) ||
        Option(t.database).exists(d => s"$d.${t.name}".matches(re)))
      .map(_.name)
      .toSeq
    val cfgs = tables.flatMap { t =>
      val checksFile = s"$checksDir/${t.replace('.', '_')}.yml"
      // catalog names are RAW (no backticks; `t` is the bare table name):
      // quote so hyphenated / special-character table names survive the
      // round trip (reference 0.15.0 "Allow special characters in catalog
      // and schema names"); the suffix lands INSIDE the quotes
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(checksFile)))
        Some(RunConfig(
          input = InputConfig(graft.io.IO.quotePart(t)),
          output = Some(OutputConfig(graft.io.IO.quotePart(t + outputSuffix), mode = "overwrite")),
          quarantine = quarantineSuffix.map(q =>
            OutputConfig(graft.io.IO.quotePart(t + q), mode = "overwrite")),
          checksLocation = Some(checksFile),
          extra = extra))
      else None
    }
    applyChecksAndSaveInTables(spark, cfgs, maxParallelism)
    cfgs.map(_.input.location)
  }

  /** Multi-table fan-out on a bounded driver pool (engine.py:1114-1144): each
    * config is an independent Spark job; the scheduler interleaves them.
    */
  def applyChecksAndSaveInTables(spark: SparkSession, cfgs: Seq[RunConfig],
                                 maxParallelism: Int = 4): Unit = {
    val pool = Executors.newFixedThreadPool(math.max(1, maxParallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = cfgs.map(c => Future {
        val handles = applyChecksAndSaveInTable(spark, c)
        handles.foreach(_.awaitTermination())
      })
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
    }
  }
}
