package graft.queries

import graft.core.Criticality
import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One driver-contract query: a Spark query over an sf dir plus an optional
  * DuckDB oracle. Oracle-less entries get the driver's weaker rows-only check.
  */
final case class QueryDef(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object QueryDefs {
  /** Table loader. The driver-generated events table has stored ts as parquet
    * TIMESTAMP(NANOS) in some rounds (which Spark reads as long under
    * spark.sql.legacy.parquet.nanosAsLong, set in every session entry point)
    * and plain TIMESTAMP(MICROS) in others (which Spark 4 infers as
    * TIMESTAMP_NTZ) — normalize either to a session-zone micros timestamp,
    * losslessly (the data is µs-precision, the session zone is UTC).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }

  /** Apply ONE rule through the engine; project failing rows' keys, fully ordered. */
  def failing(df: DataFrame, rule: DQRule, keys: Seq[String]): DataFrame =
    DQEngine.applyChecks(df, Seq(rule))
      .where(col("_errors").isNotNull)
      .select(keys.map(col): _*)
      .orderBy(keys.map(col): _*)

  def row(check: Column, function: String, cols: String*): DQRowRule =
    DQRowRule(check, function, cols)

  def ds(check: DatasetCheck, function: String, cols: String*): DQDatasetRule =
    DQDatasetRule(check, function, cols)
}
