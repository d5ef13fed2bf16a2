package graft.core

import org.apache.spark.sql.types._

/** Criticality of a rule: decides whether a failure lands in the errors or
  * warnings result column.
  *
  * Mirrors the reference semantics (dqx/rule.py:107-111).
  */
sealed abstract class Criticality(val value: String)
object Criticality {
  case object Error extends Criticality("error")
  case object Warn extends Criticality("warn")
  def fromString(s: String): Criticality = s.toLowerCase match {
    case "error" => Error
    case "warn" | "warning" => Warn
    case other => throw new IllegalArgumentException(s"Unknown criticality: $other")
  }
}

/** Names of the engine-produced result columns (dqx/reporting_columns.py:6-12). */
final case class ResultColumnNames(
    errors: String = "_errors",
    warnings: String = "_warnings",
    info: String = "_dq_info")

/** Engine knobs (dqx/engine.py:85-95). `runTimeOverwrite`/`runIdOverwrite` pin the
  * per-run stamps so golden tests are deterministic.
  *
  * `checkpointEvery`: explicit plan-blowup fence. Many dataset checks compose
  * into ONE Catalyst plan (each contributes its joins/windows upstream — the
  * reference warns about exactly this, check_funcs.py:2161); past a few dozen
  * heavy checks, analysis/optimization time grows superlinearly. With
  * `Some(n)`, the engine lazily localCheckpoints the accumulating frame after
  * every n-th applied dataset check, truncating lineage (the checkpointed
  * prefix computes once and is served from executor-local storage). Batch
  * only — streaming frames are never checkpointed. Trade-off: checkpointed
  * data occupies executor memory/disk and disables cross-segment Catalyst
  * optimization, so leave it off for small rule sets.
  *
  * `autoFencePlanNodes`: the conservative DEFAULT fence when `checkpointEvery`
  * is unset — a 21-deep unfenced sql_query chain cannot even render an
  * explain string under an 8g driver, so rule sets that deep must not depend
  * on the caller knowing the knob. After each applied dataset check the
  * engine probes the accumulated LOGICAL plan's node count (budgeted
  * traversal, so the probe never walks more than the cap) and fences once it
  * exceeds `autoFencePlanNodes`, logging the first time. Plan size — not
  * check count — is the trigger: only self-referential shapes (each sql_query
  * joins the frame to an aggregate OF the frame, roughly doubling the tree)
  * blow up; ten windows or joins grow linearly and never trip the fence, so
  * ordinary suites keep their un-checkpointed single-plan execution. Explicit
  * `checkpointEvery` always wins; `autoFencePlanNodes = None` disables the
  * safety net entirely.
  */
final case class ExtraParams(
    resultColumnNames: ResultColumnNames = ResultColumnNames(),
    runTimeOverwrite: Option[java.sql.Timestamp] = None,
    runIdOverwrite: Option[String] = None,
    userMetadata: Map[String, String] = Map.empty,
    suppressSkipped: Boolean = false,
    checkpointEvery: Option[Int] = None,
    autoFencePlanNodes: Option[Int] = Some(4096),
    // observer invoked as (ruleName, analysisError) each time a check's
    // pristine-base build fails analysis and the engine reverts to the
    // chained frame (also INFO-logged); lets callers surface why a stacked
    // plan grew faster than expected
    onBaseFallback: Option[(String, String) => Unit] = None)

/** Result schemas (dqx/schema/dq_result_schema.py:3-19). */
object DQSchemas {
  val resultItem: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("message", StringType),
    StructField("columns", ArrayType(StringType)),
    StructField("filter", StringType),
    StructField("function", StringType),
    StructField("run_time", TimestampType),
    StructField("run_id", StringType),
    StructField("user_metadata", MapType(StringType, StringType)),
    StructField("rule_fingerprint", StringType),
    StructField("rule_set_fingerprint", StringType),
    StructField("skipped", BooleanType)
  ))
  val resultArray: ArrayType = ArrayType(resultItem)

  /** Metrics row schema (dqx/metrics_observer.py:12-16). */
  val metricsRow: StructType = StructType(Seq(
    StructField("run_id", StringType),
    StructField("run_name", StringType),
    StructField("input_location", StringType),
    StructField("output_location", StringType),
    StructField("quarantine_location", StringType),
    StructField("checks_location", StringType),
    StructField("rule_set_fingerprint", StringType),
    StructField("metric_name", StringType),
    StructField("metric_value", StringType),
    StructField("run_time", TimestampType),
    StructField("error_column_name", StringType),
    StructField("warning_column_name", StringType),
    StructField("user_metadata", MapType(StringType, StringType))
  ))
}

/** SHA-256 fingerprints over a canonical sorted-key JSON form of the rule
  * definition (dqx/rule.py:644-681, dqx/rule_fingerprint.py:17-50).
  *
  * We define our own canonical form (documented here, stable across releases):
  * JSON object with keys sorted lexicographically, no whitespace, strings
  * escaped minimally, scalars rendered via toString.
  */
object Fingerprint {
  private def canonical(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"${str(k)}:${canonical(x)}" }
        .mkString("{", ",", "}")
    case s: Seq[_] => s.map(canonical).mkString("[", ",", "]")
    case s: String => str(s)
    case b: Boolean => b.toString
    case n: Number => n.toString
    case other => str(other.toString)
  }
  private def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Fingerprint of one rule definition. */
  def ruleFingerprint(fields: Map[String, Any]): String =
    sha256Hex(canonical(fields))

  /** Set-level fingerprint: SHA-256 over the sorted rule fingerprints. */
  def ruleSetFingerprint(ruleFps: Seq[String]): String =
    sha256Hex(ruleFps.sorted.mkString(","))
}
