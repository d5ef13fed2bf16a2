package graft.rules

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}

/** A dataset-level check: `applyFn` adds hidden metric columns (window aggs,
  * joins) that `condition` reads (dqx/rule.py:530-560, dqx/executor.py:115-149).
  * `condition` is message-or-null, like row checks. `infoColName`: optional
  * column `applyFn` adds holding a wide [[graft.core.DQInfo]] struct; the
  * engine merges all such columns into the `_dq_info` array
  * (reporting_columns.py:22-52).
  */
final case class DatasetCheck(applyFn: DataFrame => DataFrame, condition: Column,
                              infoColName: Option[String] = None,
                              madSpec: Option[MadSpec] = None)

/** Declarative description of a MAD-outlier band so the engine can batch the
  * driver-side stats of N `has_no_outliers` rules into two actions total (one
  * for all medians, one for all MADs) instead of 2·N full scans — the N+1
  * shape the reference pays (check_funcs.py:1743 approxQuantile per rule).
  * `applyFn` stays self-contained for standalone use; the engine prefers the
  * spec when present.
  */
final case class MadSpec(column: String, factor: Double, exact: Boolean,
                         rowFilter: Option[String], loCol: String, hiCol: String)

/** Rule definitions. Mirrors dqx/rule.py:504-641 but idiomatic Scala: the check
  * is an already-built Column / DatasetCheck; metadata deserialization builds
  * these via the [[CheckRegistry]].
  */
sealed trait DQRule {
  def name: String
  def criticality: Criticality
  def filter: Option[String]
  def columns: Seq[String]
  def function: String
  def userMetadata: Map[String, String]
  /** Arguments as given in metadata form; used only for fingerprinting. */
  def arguments: Map[String, Any]
  /** Optional custom failure-message SQL expression (manager.py:247-274);
    * NOT part of the fingerprint, like the reference. */
  def messageExpr: Option[String]
  /** Explicit name, or the auto-derived `{cols}_{function}` name. */
  def resolvedName: String

  lazy val fingerprint: String = Fingerprint.ruleFingerprint(Map(
    "name" -> name,
    "criticality" -> criticality.value,
    "function" -> function,
    "arguments" -> arguments,
    "filter" -> filter.orNull
  ))
}

object DQRule {
  /** Auto-name: `{col}_{function}` normalized (dqx utils.py:292-306 shape). */
  def autoName(function: String, columns: Seq[String]): String = {
    val base = (columns.toList ::: List(function)).mkString("_")
    base.toLowerCase.replaceAll("[^a-z0-9_]+", "_").replaceAll("_+", "_").stripPrefix("_").stripSuffix("_")
  }
}

final case class DQRowRule(
    check: Column,
    function: String,
    columns: Seq[String] = Seq.empty,
    name: String = "",
    criticality: Criticality = Criticality.Error,
    filter: Option[String] = None,
    userMetadata: Map[String, String] = Map.empty,
    arguments: Map[String, Any] = Map.empty,
    messageExpr: Option[String] = None) extends DQRule {
  def resolvedName: String = if (name.nonEmpty) name else DQRule.autoName(function, columns)
}

/** For-each-column expansion (dqx/rule.py:563-641): one check template applied
  * to N columns, producing N rules with per-column auto-names.
  */
object DQForEachColRule {
  def expand(columns: Seq[String], function: String,
             build: String => Column,
             criticality: Criticality = Criticality.Error,
             filter: Option[String] = None,
             userMetadata: Map[String, String] = Map.empty): Seq[DQRowRule] =
    columns.map { c =>
      DQRowRule(build(c), function, Seq(c), criticality = criticality,
        filter = filter, userMetadata = userMetadata,
        arguments = Map("column" -> c))
    }
}

final case class DQDatasetRule(
    check: DatasetCheck,
    function: String,
    columns: Seq[String] = Seq.empty,
    name: String = "",
    criticality: Criticality = Criticality.Error,
    filter: Option[String] = None,
    userMetadata: Map[String, String] = Map.empty,
    arguments: Map[String, Any] = Map.empty,
    messageExpr: Option[String] = None) extends DQRule {
  def resolvedName: String = if (name.nonEmpty) name else DQRule.autoName(function, columns)
}
