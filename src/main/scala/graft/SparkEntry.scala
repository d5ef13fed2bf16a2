package graft

import graft.checks.{DatasetChecks, RowChecks}
import graft.core._
import graft.engine.DQEngine
import graft.queries._
import graft.rules._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY §2 plus the
  * LLM-pipeline operators; definitions live in graft.queries.*. Every entry
  * with a DuckDB-expressible semantic also appears in `oracleSql` with
  * identically-named, fully-ordered output columns.
  */
object SparkEntry {

  private val registry: Seq[(String, QueryDef)] =
    RowCheckQueries.all ++ DatasetCheckQueries.all ++ EngineQueries.all ++
      GeoQueries.all ++ PipelineQueries.all ++ ProfilerQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Applies a mixed row+dataset rule suite to lineitem and returns failure
    * counts per rule.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rules = Seq(
      DQRowRule(RowChecks.isInList(col("l_returnflag"), Seq("A", "N")), "is_in_list", Seq("l_returnflag")),
      DQRowRule(RowChecks.isInRange(col("l_quantity"), 1, 25), "is_in_range", Seq("l_quantity")),
      DQRowRule(RowChecks.isNotGreaterThan(col("l_discount"), 0.05), "is_not_greater_than",
        Seq("l_discount"), criticality = Criticality.Warn),
      DQDatasetRule(DatasetChecks.isUnique(Seq("l_orderkey")), "is_unique", Seq("l_orderkey"))
    )
    DQEngine.applyChecks(li, rules)
      .select(explode(col("_errors")).as("e"))
      .groupBy(col("e.name").as("rule_name"))
      .agg(count(lit(1)).as("n_failures"))
      .orderBy(col("rule_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, QueryDef(_, Some(sql))) => n -> sql }.toMap
}
