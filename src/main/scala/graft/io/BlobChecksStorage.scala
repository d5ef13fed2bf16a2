package graft.io

import graft.rules.ChecksSerializer
import org.apache.spark.sql.SparkSession

/** URI-addressed blob storage for rule definitions — the OSS analog of the
  * reference's workspace-file and UC-volume backends (checks_storage.py:1013,
  * :1230), generalized to any Hadoop-visible URI (file://, hdfs://, s3a://).
  *
  * Carries the SAME fingerprint-versioned contract as [[TableChecksStorage]]:
  * `location` is a directory; each saved rule set becomes one YAML blob at
  * `<location>/<run_config>/<zero-padded-millis>_<set-fingerprint>.yaml`.
  * Save is idempotent on the set fingerprint (an already-stored identical set
  * short-circuits regardless of mode, checks_storage.py:388-407); `overwrite`
  * replaces only this run config's versions (other run configs untouched);
  * `append` accumulates history. Load returns the latest version by the
  * lexically-sortable timestamp prefix, or a specific fingerprint when given.
  */
class BlobChecksStorage(spark: SparkSession) extends ChecksStorage {

  def ruleSetFingerprint(checks: Seq[Map[String, Any]]): String =
    CheckFingerprints.ruleSetFingerprint(checks)

  private def configDir(location: String, runConfigName: String): String =
    location.stripSuffix("/") + "/" + runConfigName

  private def versionOf(path: String): Option[(Long, String)] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val m = "^(\\d{20})_([0-9a-f]+)\\.yaml$".r.findFirstMatchIn(name)
    m.map(g => (g.group(1).toLong, g.group(2)))
  }

  def saveChecks(checks: Seq[Map[String, Any]], location: String,
                 runConfigName: String = "default", mode: String = "overwrite"): Unit = {
    if (checks.isEmpty) return
    require(runConfigName.matches("[\\w.\\-]+"),
      s"run_config_name must contain only word chars, '.', '-'; got '$runConfigName'")
    val setFp = ruleSetFingerprint(checks)
    val dir = configDir(location, runConfigName)
    val versions = FsText.list(spark, dir).flatMap(p => versionOf(p).map(v => (p, v)))
    if (versions.exists(_._2._2 == setFp)) return // idempotent: set already stored
    if (mode == "overwrite") versions.foreach { case (p, _) => FsText.delete(spark, p) }
    val name = f"${System.currentTimeMillis()}%020d_$setFp.yaml"
    FsText.write(spark, s"$dir/$name", ChecksSerializer.toYaml(checks))
  }

  def loadChecks(location: String, runConfigName: String = "default",
                 fingerprint: Option[String] = None): Seq[Map[String, Any]] = {
    val dir = configDir(location, runConfigName)
    val versions = FsText.list(spark, dir).flatMap(p => versionOf(p).map(v => (p, v)))
    require(versions.nonEmpty,
      s"No stored checks for run config '$runConfigName' under '$location'")
    val chosen = fingerprint match {
      case Some(fp) => versions.find(_._2._2 == fp).getOrElse(
        throw new IllegalArgumentException(
          s"No stored rule set with fingerprint '$fp' under '$dir'"))
      case None => versions.maxBy(v => (v._2._1, v._2._2))
    }
    ChecksSerializer.parseYaml(FsText.read(spark, chosen._1))
  }

  /** Stored (timestampMillis, setFingerprint) versions, oldest first. */
  def listVersions(location: String, runConfigName: String = "default"): Seq[(Long, String)] =
    FsText.list(spark, configDir(location, runConfigName))
      .flatMap(versionOf).sorted

  override def load(location: String): Seq[Map[String, Any]] = loadChecks(location)
  override def save(checks: Seq[Map[String, Any]], location: String): Unit =
    saveChecks(checks, location)
}
