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

  /** 2-3-level dotted name = table; anything with a path separator or URI
    * scheme = path (io.py:15-17 regexes).
    */
  def isTableLocation(location: String): Boolean =
    location.matches("[A-Za-z0-9_]+(\\.[A-Za-z0-9_]+){0,2}") && !location.contains("/")

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
      if (isTableLocation(cfg.location)) spark.readStream.table(cfg.location)
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
      if (isTableLocation(cfg.location)) spark.read.table(cfg.location)
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
      val q = if (isTableLocation(cfg.location)) w.toTable(cfg.location)
              else w.start(cfg.location)
      Some(q)
    } else {
      val w = df.write.format(cfg.format).mode(cfg.mode).options(cfg.options)
      val wp = if (cfg.partitionBy.nonEmpty) w.partitionBy(cfg.partitionBy: _*) else w
      if (isTableLocation(cfg.location)) wp.saveAsTable(cfg.location)
      else wp.save(cfg.location)
      None
    }
  }
}
