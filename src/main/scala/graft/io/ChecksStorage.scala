package graft.io

import graft.core.Fingerprint
import graft.rules.ChecksSerializer

import java.nio.file.{Files, Paths}

/** Rule-definition storage backends (reference dqx/checks_storage.py).
  * Core backends for the OSS build: local file (YAML/JSON) and Spark table.
  */
trait ChecksStorage {
  def load(location: String): Seq[Map[String, Any]]
  def save(checks: Seq[Map[String, Any]], location: String): Unit
}

/** Fingerprints of metadata-form checks, shared by every versioned backend. */
object CheckFingerprints {
  /** Per-rule fingerprint over the canonical definition (rule.py:644-681). */
  def ruleFingerprint(c: Map[String, Any]): String = {
    val check = c.getOrElse("check", Map.empty).asInstanceOf[Map[String, Any]]
    Fingerprint.ruleFingerprint(Map(
      "name" -> c.get("name").map(String.valueOf).orNull,
      "criticality" -> c.get("criticality").map(String.valueOf).orNull,
      "function" -> check.get("function").map(String.valueOf).orNull,
      "arguments" -> check.getOrElse("arguments", Map.empty[String, Any]),
      "filter" -> c.get("filter").map(String.valueOf).orNull,
      "for_each_column" -> check.getOrElse("for_each_column", null)))
  }

  /** Set-level fingerprint (rule_fingerprint.py:17-50). */
  def ruleSetFingerprint(checks: Seq[Map[String, Any]]): String =
    Fingerprint.ruleSetFingerprint(checks.map(ruleFingerprint))
}

/** YAML/JSON file storage (checks_storage.py:1070-1125). Format by extension. */
object FileChecksStorage extends ChecksStorage {
  override def load(location: String): Seq[Map[String, Any]] =
    ChecksSerializer.parseYaml(Files.readString(Paths.get(location)))

  override def save(checks: Seq[Map[String, Any]], location: String): Unit = {
    val p = Paths.get(location)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, ChecksSerializer.toYaml(checks))
  }
}

/** Spark-table storage (checks_storage.py:104-498): ONE ROW PER CHECK with the
  * reference's column shape — `name, criticality, check struct(function,
  * arguments, for_each_column), filter, run_config_name, user_metadata` plus
  * versioning columns `created_at, rule_fingerprint, rule_set_fingerprint`.
  *
  * Save is fingerprint-idempotent: an existing (run_config_name,
  * rule_set_fingerprint) row set short-circuits the write regardless of mode
  * (checks_storage.py:388-407). `overwrite` replaces only this run config's
  * rows (the reference uses Delta replaceWhere; without Delta the preserved
  * rows are collected — checks tables are small by contract, the reference
  * itself warns beyond 500 rows — and rewritten). `append` accumulates
  * versions. Load returns the latest set by created_at, or a specific
  * fingerprint when given.
  */
class TableChecksStorage(spark: org.apache.spark.sql.SparkSession) extends ChecksStorage {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Row

  private val checkStruct = StructType(Seq(
    StructField("function", StringType),
    StructField("arguments", MapType(StringType, StringType)),
    StructField("for_each_column", ArrayType(StringType))))
  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("criticality", StringType),
    StructField("check", checkStruct),
    StructField("filter", StringType),
    StructField("message_expr", StringType),
    StructField("run_config_name", StringType),
    StructField("user_metadata", MapType(StringType, StringType)),
    StructField("created_at", TimestampType),
    StructField("rule_fingerprint", StringType),
    StructField("rule_set_fingerprint", StringType)))

  // Argument values round-trip through single-value YAML (faithful for
  // strings/numbers/booleans/lists/maps — mirrors the reference's JSON-encoded
  // argument strings, checks_storage.py:183-199).
  private def encodeValue(v: Any): String = ChecksSerializer.encodeScalar(v)
  private def decodeValue(s: String): Any = ChecksSerializer.decodeScalar(s)

  /** Per-rule fingerprint over the canonical definition (rule.py:644-681). */
  def ruleFingerprint(c: Map[String, Any]): String = CheckFingerprints.ruleFingerprint(c)

  /** Set-level fingerprint (rule_fingerprint.py:17-50). */
  def ruleSetFingerprint(checks: Seq[Map[String, Any]]): String =
    CheckFingerprints.ruleSetFingerprint(checks)

  private def tableExists(location: String): Boolean =
    spark.catalog.tableExists(location)

  private def toRows(checks: Seq[Map[String, Any]], runConfigName: String,
                     setFp: String): Seq[Row] = {
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    checks.map { c =>
      val check = c.getOrElse("check", Map.empty).asInstanceOf[Map[String, Any]]
      val args = check.getOrElse("arguments", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]].map { case (k, v) => k -> encodeValue(v) }
      val forEach = check.get("for_each_column").map {
        case s: Seq[_] => s.map(String.valueOf)
        case other => Seq(String.valueOf(other))
      }.orNull
      val userMeta = c.get("user_metadata")
        .map(_.asInstanceOf[Map[String, Any]].map { case (k, v) => k -> String.valueOf(v) }).orNull
      Row(
        c.get("name").map(String.valueOf).orNull,
        c.get("criticality").map(String.valueOf).orNull,
        Row(check.get("function").map(String.valueOf).orNull, args, forEach),
        c.get("filter").map(String.valueOf).orNull,
        c.get("message_expr").map(String.valueOf).orNull,
        runConfigName, userMeta, now, ruleFingerprint(c), setFp)
    }
  }

  private def fromRows(rows: Seq[Row]): Seq[Map[String, Any]] =
    rows.map { row =>
      val check = row.getStruct(row.fieldIndex("check"))
      val args = Option(check.getMap[String, String](1))
        .map(_.toMap.map { case (k, v) => k -> decodeValue(v) })
        .getOrElse(Map.empty[String, Any])
      val checkMap = Map("function" -> check.getString(0)) ++
        (if (args.nonEmpty) Map("arguments" -> args) else Map("arguments" -> Map.empty[String, Any])) ++
        Option(check.getSeq[String](2)).filter(_.nonEmpty).map("for_each_column" -> _.toList)
      Map("check" -> checkMap) ++
        Option(row.getString(row.fieldIndex("name"))).map("name" -> _) ++
        Option(row.getString(row.fieldIndex("criticality"))).map("criticality" -> _) ++
        Option(row.getString(row.fieldIndex("filter"))).map("filter" -> _) ++
        Option(row.getString(row.fieldIndex("message_expr"))).map("message_expr" -> _) ++
        Option(row.getMap[String, String](row.fieldIndex("user_metadata")))
          .map(m => "user_metadata" -> m.toMap)
    }

  def saveChecks(checks: Seq[Map[String, Any]], location: String,
                 runConfigName: String = "default", mode: String = "overwrite"): Unit = {
    if (checks.isEmpty) return
    require(runConfigName.matches("[\\w.\\-]+"),
      s"run_config_name must contain only word chars, '.', '-'; got '$runConfigName'")
    val setFp = ruleSetFingerprint(checks)
    if (tableExists(location)) {
      val existing = spark.read.table(location)
      val exists = !existing
        .where(col("run_config_name") === runConfigName && col("rule_set_fingerprint") === setFp)
        .isEmpty
      if (exists) return // idempotent: same set already stored
    }
    val newDf = spark.createDataFrame(
      spark.sparkContext.parallelize(toRows(checks, runConfigName, setFp), 1), schema)
    if (mode == "overwrite" && tableExists(location)) {
      // replaceWhere emulation: preserve other run configs, rewrite the table
      val preserved = spark.read.table(location)
        .where(col("run_config_name") =!= runConfigName).collect().toSeq
      val preservedDf = spark.createDataFrame(
        spark.sparkContext.parallelize(preserved, 1), schema)
      newDf.union(preservedDf).write.mode("overwrite").saveAsTable(location)
    } else {
      newDf.write.mode(if (mode == "overwrite") "overwrite" else "append").saveAsTable(location)
    }
  }

  def loadChecks(location: String, runConfigName: String = "default",
                 fingerprint: Option[String] = None): Seq[Map[String, Any]] = {
    require(tableExists(location), s"Checks table '$location' does not exist")
    val df = spark.read.table(location).where(col("run_config_name") === runConfigName)
    val fp = fingerprint.orElse {
      df.select("rule_set_fingerprint")
        .orderBy(col("created_at").desc_nulls_last, col("rule_set_fingerprint").desc_nulls_last)
        .limit(1).collect().headOption.map(_.getString(0))
    }
    fp match {
      case None => Seq.empty
      case Some(f) => fromRows(df.where(col("rule_set_fingerprint") === f).collect().toSeq)
    }
  }

  override def load(location: String): Seq[Map[String, Any]] = loadChecks(location)
  override def save(checks: Seq[Map[String, Any]], location: String): Unit =
    saveChecks(checks, location)
}

/** Factory by location shape (checks_storage.py:1344-1441). A scheme-qualified
  * URI (file://, hdfs://, s3a://, ...) routes to the fingerprint-versioned
  * blob backend — the OSS stand-in for workspace-file/UC-volume locations.
  */
object ChecksStorageFactory {
  def forLocation(location: String, spark: org.apache.spark.sql.SparkSession): ChecksStorage =
    if (location.startsWith("jdbc:")) new JdbcChecksStorage(location)
    else if (location.contains("://")) new BlobChecksStorage(spark)
    else if (IO.isTableLocation(location)) new TableChecksStorage(spark)
    else FileChecksStorage
}
