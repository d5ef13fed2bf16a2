package graft.io

import graft.rules.ChecksSerializer

import java.nio.file.{Files, Paths}

/** Rule-definition storage backends (reference dqx/checks_storage.py).
  * Core backends for the OSS build: local file (YAML/JSON) and Spark table.
  */
trait ChecksStorage {
  def load(location: String): Seq[Map[String, Any]]
  def save(checks: Seq[Map[String, Any]], location: String): Unit
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

/** Spark-table storage (checks_storage.py:340-498): one row per check, the
  * check payload held as a YAML string column; fingerprint-versioned saves
  * append with a `rule_set_fingerprint` stamp so older sets stay queryable.
  */
class TableChecksStorage(spark: org.apache.spark.sql.SparkSession) extends ChecksStorage {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  override def load(location: String): Seq[Map[String, Any]] = {
    val df = spark.read.table(location)
    // latest rule set only (max save_time)
    val latest = df.orderBy(col("save_time").desc).select("payload").limit(1)
      .as[String].collect()
    latest.toSeq.flatMap(ChecksSerializer.parseYaml)
  }

  override def save(checks: Seq[Map[String, Any]], location: String): Unit = {
    val payload = ChecksSerializer.toYaml(checks)
    val fp = graft.core.Fingerprint.sha256Hex(payload)
    Seq((payload, fp, new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("payload", "rule_set_fingerprint", "save_time")
      .write.mode("append").saveAsTable(location)
  }
}

/** Factory by location shape (checks_storage.py:1344-1441). */
object ChecksStorageFactory {
  def forLocation(location: String, spark: org.apache.spark.sql.SparkSession): ChecksStorage =
    if (IO.isTableLocation(location)) new TableChecksStorage(spark)
    else FileChecksStorage
}
