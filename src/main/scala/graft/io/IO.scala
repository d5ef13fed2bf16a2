package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Input/output configs + readers/writers (reference dqx/io.py, dqx/config.py).
  * OSS build: formats are whatever the Spark distribution provides (parquet,
  * json, csv, orc); table names route through the catalog.
  */
final case class InputConfig(
    location: String,
    format: String = "parquet",
    isStreaming: Boolean = false,
    schema: Option[String] = None,
    options: Map[String, String] = Map.empty)

final case class OutputConfig(
    location: String,
    format: String = "parquet",
    mode: String = "append",
    options: Map[String, String] = Map.empty,
    partitionBy: Seq[String] = Seq.empty,
    trigger: Option[String] = None, // "availableNow" | "processingTime=30 seconds"
    checkpointLocation: Option[String] = None)

object IO {

  /** 1-3-level dotted name = table; anything with a path separator or URI
    * scheme = path (io.py:15-17 regexes). Each part may be backquoted to
    * carry special characters — hyphens, spaces — in catalog/schema/table
    * names (reference 0.15.0 "Allow special characters in catalog and
    * schema names", io.py:17).
    *
    * Boundary semantics vs the reference's TABLE_PATTERN (ADVICE r12):
    *  - MULTI-part names allow any non-backtick character inside backquotes,
    *    INCLUDING '/' — `` `cat`.`sub/dir`.tbl `` is a table, reference
    *    parity.
    *  - SINGLE-part backquoted names exclude '/' so `` `/tmp/data` ``
    *    classifies as a PATH (ADVICE r11). The reference never faces this
    *    ambiguity because its pattern requires 2-3 dotted parts; we
    *    deliberately also accept BARE one-part table names (OSS
    *    `saveAsTable("tbl")` ergonomics — a documented divergence).
    */
  def isTableLocation(location: String): Boolean = {
    // backquoted parts escape interior backticks by doubling
    val partAny = "(?:`(?:``|[^`])+`|[A-Za-z0-9_]+)"
    val partNoSlash = "(?:`(?:``|[^`/])+`|[A-Za-z0-9_]+)"
    location.matches(s"$partAny(?:\\.$partAny){1,2}") || location.matches(partNoSlash)
  }

  /** Split a dotted table name on dots OUTSIDE backquotes. */
  private def splitTableParts(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    s.foreach {
      case '`' => inQ = !inQ; sb += '`'
      case '.' if !inQ => parts += sb.toString; sb.clear()
      case c => sb += c
    }
    parts += sb.toString
    parts.toSeq
  }

  /** Backtick-quote one identifier part when it needs it (embedded backticks
    * escape by doubling, Spark's own grammar).
    */
  def quotePart(p: String): String =
    if (p.matches("[A-Za-z0-9_]+")) p else "`" + p.replace("`", "``") + "`"

  /** Normalize a dotted table name so raw special-character parts parse:
    * already-backquoted parts pass through, plain parts stay plain, and a
    * part with special characters gets backquoted. Lets callers hand
    * `my-catalog.schema.tbl` or `` `my-catalog`.schema.tbl `` to any
    * read.table/saveAsTable boundary interchangeably.
    */
  def quoteTableName(location: String): String =
    splitTableParts(location).map { p =>
      // pass through only WELL-FORMED quoted parts (interior backticks
      // doubled); a malformed part like `a`b` would otherwise flow into
      // invalid SQL — re-quote its raw text instead (ADVICE r11)
      if (p.matches("`(?:``|[^`])*`")) p else quotePart(p)
    }.mkString(".")

  /** read_input_data (io.py:20-85): table or path, batch or streaming.
    *
    * File streams without an explicit schema get one inferred from the files
    * already at the location (bounded batch read of the current listing) —
    * the OSS analog of Auto Loader's `cloudFiles.inferColumnTypes` +
    * schemaLocation bootstrap (io.py:59-85). Schema EVOLUTION across
    * restarts follows the same contract as Auto Loader's `addNewColumns`
    * mode: new columns appear after a restart re-infers; pass
    * `mergeSchema=true` in options for parquet width-unions within a run.
    */
  def readInputData(spark: SparkSession, cfg: InputConfig): DataFrame = {
    if (cfg.isStreaming) {
      if (isTableLocation(cfg.location)) spark.readStream.table(quoteTableName(cfg.location))
      else {
        val r = spark.readStream.format(cfg.format).options(cfg.options)
        val withSchema = cfg.schema.map(r.schema).getOrElse {
          val inferred = spark.read.format(cfg.format).options(cfg.options)
            .load(cfg.location).schema
          r.schema(inferred)
        }
        withSchema.load(cfg.location)
      }
    } else {
      if (isTableLocation(cfg.location)) spark.read.table(quoteTableName(cfg.location))
      else {
        val r = spark.read.format(cfg.format).options(cfg.options)
        cfg.schema.map(r.schema).getOrElse(r).load(cfg.location)
      }
    }
  }

  /** save_dataframe_as_table (io.py:88-187): batch writer or streaming writer;
    * one-time triggers are awaited by the caller via the returned handle.
    */
  def saveDataFrame(df: DataFrame, cfg: OutputConfig): Option[StreamingQuery] = {
    if (df.isStreaming) {
      var w: DataStreamWriter[Row] = df.writeStream
        .format(cfg.format)
        .outputMode(cfg.mode match { case "overwrite" => "complete"; case m => m })
        .options(cfg.options)
      cfg.checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
      w = cfg.trigger match {
        case Some("availableNow") => w.trigger(Trigger.AvailableNow())
        case Some(t) if t.startsWith("processingTime=") =>
          w.trigger(Trigger.ProcessingTime(t.stripPrefix("processingTime=")))
        case _ => w
      }
      val q = if (isTableLocation(cfg.location)) w.toTable(quoteTableName(cfg.location))
              else w.start(cfg.location)
      Some(q)
    } else {
      val w = df.write.format(cfg.format).mode(cfg.mode).options(cfg.options)
      val wp = if (cfg.partitionBy.nonEmpty) w.partitionBy(cfg.partitionBy: _*) else w
      if (isTableLocation(cfg.location)) wp.saveAsTable(quoteTableName(cfg.location))
      else wp.save(cfg.location)
      None
    }
  }
}
