package graft.metrics

import graft.core.{DQSchemas, ExtraParams}
import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable

/** Summary-metrics machinery (reference dqx/metrics_observer.py,
  * dqx/metrics_listener.py, engine.py:1536-1730).
  */
final case class MetricsRunInfo(
    runId: String,
    runName: String = "",
    inputLocation: Option[String] = None,
    outputLocation: Option[String] = None,
    quarantineLocation: Option[String] = None,
    checksLocation: Option[String] = None,
    ruleSetFingerprint: Option[String] = None,
    userMetadata: Map[String, String] = Map.empty)

object Metrics {

  /** Default observed aggregates over a checked DataFrame
    * (metrics_observer.py:86-147).
    */
  def defaultMetricExprs(extra: ExtraParams = ExtraParams()): Seq[(String, String)] = {
    val n = extra.resultColumnNames
    Seq(
      "input_row_count" -> "count(1)",
      "error_row_count" -> s"count(case when ${n.errors} is not null then 1 end)",
      "warning_row_count" -> s"count(case when ${n.warnings} is not null then 1 end)",
      "valid_row_count" -> s"count(case when ${n.errors} is null and ${n.warnings} is null then 1 end)")
  }

  private def jsonEncode(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Per-check breakdown as ONE SQL aggregate expression producing a JSON
    * array string: `[{"check_name":...,"error_count":N,"warning_count":M},...]`
    * (metrics_observer.py:108-147). Built with concat over per-check count
    * aggregates so it works inside `observe()` — a plain string scalar.
    * Duplicate check names are preserved (each occurrence reported).
    */
  def checkMetricsExpr(checkNames: Seq[String], extra: ExtraParams = ExtraParams()): String = {
    require(checkNames.nonEmpty, "checkNames must not be empty")
    val n = extra.resultColumnNames
    val fragments = checkNames.map { name =>
      val esc = name.replace("'", "''")
      val jsonName = jsonEncode(name).replace("'", "''")
      "concat(" +
        s"""'{"check_name":$jsonName,"error_count":',""" +
        s"cast(count(case when exists(${n.errors}, x -> x.name = '$esc') then 1 end) as string)," +
        s"""',"warning_count":',""" +
        s"cast(count(case when exists(${n.warnings}, x -> x.name = '$esc') then 1 end) as string)," +
        "'}')"
    }
    s"concat('[', concat_ws(',', ${fragments.mkString(", ")}), ']')"
  }

  /** Post-hoc summary metrics over an already-checked table: one aggregation
    * pass + lazy unpivot to metric rows (engine.py:1587,
    * metrics_observer.py:217-293).
    */
  def computeSummaryMetrics(checked: DataFrame, info: MetricsRunInfo,
                            extra: ExtraParams = ExtraParams(),
                            customMetrics: Seq[(String, String)] = Seq.empty,
                            checkNames: Seq[String] = Seq.empty): DataFrame = {
    val breakdown =
      if (checkNames.nonEmpty) Seq("check_metrics" -> checkMetricsExpr(checkNames, extra))
      else Seq.empty
    val exprs = defaultMetricExprs(extra) ++ breakdown ++ customMetrics
    val agg = checked.select(exprs.map { case (name, e) => expr(e).cast("string").as(name) }: _*)
    // unpivot: array(struct(name, value)) + explode -> one row per metric
    val entries = array(exprs.map { case (name, _) =>
      struct(lit(name).as("metric_name"), col(name).as("metric_value"))
    }: _*)
    agg.select(explode(entries).as("m"))
      .select(
        lit(info.runId).as("run_id"),
        lit(info.runName).as("run_name"),
        lit(info.inputLocation.orNull).as("input_location"),
        lit(info.outputLocation.orNull).as("output_location"),
        lit(info.quarantineLocation.orNull).as("quarantine_location"),
        lit(info.checksLocation.orNull).as("checks_location"),
        lit(info.ruleSetFingerprint.orNull).as("rule_set_fingerprint"),
        col("m.metric_name"),
        col("m.metric_value"),
        current_timestamp().as("run_time"),
        lit(extra.resultColumnNames.errors).as("error_column_name"),
        lit(extra.resultColumnNames.warnings).as("warning_column_name"),
        (if (info.userMetadata.isEmpty) lit(null).cast("map<string,string>")
         else map(info.userMetadata.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
          .as("user_metadata"))
  }

  /** Build metric rows from a completed Observation (batch path). */
  def buildMetricsRows(spark: SparkSession, observed: Map[String, Any],
                       info: MetricsRunInfo, extra: ExtraParams = ExtraParams()): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = observed.toSeq.map { case (k, v) =>
      Row(info.runId, info.runName, info.inputLocation.orNull, info.outputLocation.orNull,
        info.quarantineLocation.orNull, info.checksLocation.orNull,
        info.ruleSetFingerprint.orNull, k, String.valueOf(v),
        new java.sql.Timestamp(System.currentTimeMillis()),
        extra.resultColumnNames.errors, extra.resultColumnNames.warnings,
        if (info.userMetadata.isEmpty) null else info.userMetadata)
    }
    spark.createDataFrame(rows.asJava, DQSchemas.metricsRow)
  }
}

/** Streaming metrics listener: captures the named observation's values per
  * micro-batch for a targeted query id (metrics_listener.py:13-111). Collected
  * rows are buffered; callers drain via [[drain]] (e.g. appending to a table).
  */
class StreamingMetricsListener(observationName: String, queryId: Option[String] = None)
    extends StreamingQueryListener {
  private val buffer = mutable.ArrayBuffer[(Long, Map[String, Any])]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    if (queryId.forall(_ == e.progress.id.toString)) {
      val observed = e.progress.observedMetrics
      if (observed != null && observed.containsKey(observationName)) {
        val row = observed.get(observationName)
        val m = row.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> row.get(i) }.toMap
        buffer.synchronized { buffer += ((e.progress.batchId, m)) }
      }
    }
  }

  def drain(): Seq[(Long, Map[String, Any])] = buffer.synchronized {
    val out = buffer.toSeq
    buffer.clear()
    out
  }
}
