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
  /** Table loader. The driver-generated events table stores ts as parquet
    * TIMESTAMP(NANOS), which Spark cannot infer — read it as long
    * (spark.sql.legacy.parquet.nanosAsLong, set in every session entry point)
    * and convert to a micros timestamp (lossless: the data is µs-precision).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
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
