package graft

import graft.checks._
import graft.core._
import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY §2 through the full
  * engine path (rule -> applyChecks -> result arrays -> projection of failing
  * keys) on the driver-generated TPC-H-ish tables; `oracleSql` holds the
  * equivalent DuckDB SQL. Outputs are deterministic: key columns only,
  * fully ordered.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Failing-row projection: apply ONE rule, keep rows whose _errors is
    * non-null, project + order by the key columns.
    */
  private def failing(df: DataFrame, rule: DQRule, keys: Seq[String]): DataFrame =
    DQEngine.applyChecks(df, Seq(rule))
      .where(col("_errors").isNotNull)
      .select(keys.map(col): _*)
      .orderBy(keys.map(col): _*)

  private def rowRule(check: Column, function: String, cols: Seq[String]): DQRowRule =
    DQRowRule(check, function, cols)

  private def dsRule(check: DatasetCheck, function: String, cols: Seq[String]): DQDatasetRule =
    DQDatasetRule(check, function, cols)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Applies a mixed row+dataset rule suite to lineitem and returns failure
    * counts per rule.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val rules = Seq(
      rowRule(RowChecks.isInList(col("l_returnflag"), Seq("A", "N")), "is_in_list", Seq("l_returnflag")),
      rowRule(RowChecks.isInRange(col("l_quantity"), 1, 25), "is_in_range", Seq("l_quantity")),
      DQRowRule(RowChecks.isNotGreaterThan(col("l_discount"), 0.05), "is_not_greater_than",
        Seq("l_discount"), criticality = Criticality.Warn),
      dsRule(DatasetChecks.isUnique(Seq("l_orderkey")), "is_unique", Seq("l_orderkey"))
    )
    DQEngine.applyChecks(li, rules)
      .select(explode(col("_errors")).as("e"))
      .groupBy(col("e.name").as("rule_name"))
      .agg(count(lit(1)).as("n_failures"))
      .orderBy(col("rule_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "row_is_in_list" -> ((s, dir) => {
      failing(t(s, dir, "lineitem"),
        rowRule(RowChecks.isInList(col("l_returnflag"), Seq("A", "N")), "is_in_list", Seq("l_returnflag")),
        Seq("l_orderkey", "l_linenumber"))
    }),
    "row_is_in_range" -> ((s, dir) => {
      failing(t(s, dir, "lineitem"),
        rowRule(RowChecks.isInRange(col("l_quantity"), 1, 25), "is_in_range", Seq("l_quantity")),
        Seq("l_orderkey", "l_linenumber"))
    }),
    "row_regex_match" -> ((s, dir) => {
      failing(t(s, dir, "orders"),
        rowRule(RowChecks.regexMatch(col("o_orderpriority"), "^[1-3]-"), "regex_match", Seq("o_orderpriority")),
        Seq("o_orderkey"))
    }),
    "ds_is_unique" -> ((s, dir) => {
      failing(t(s, dir, "lineitem"),
        dsRule(DatasetChecks.isUnique(Seq("l_orderkey")), "is_unique", Seq("l_orderkey")),
        Seq("l_orderkey", "l_linenumber"))
    }),
    "ds_foreign_key" -> ((s, dir) => {
      val ref = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      failing(t(s, dir, "orders"),
        dsRule(DatasetChecks.foreignKey(Seq("o_custkey"), Seq("c_custkey"), ref), "foreign_key", Seq("o_custkey")),
        Seq("o_orderkey"))
    }),
    "ds_is_aggr_not_greater_than" -> ((s, dir) => {
      failing(t(s, dir, "lineitem"),
        dsRule(DatasetChecks.isAggrNotGreaterThan("l_extendedprice", 38000.0, "avg",
          groupBy = Seq("l_returnflag")), "is_aggr_not_greater_than", Seq("l_extendedprice")),
        Seq("l_orderkey", "l_linenumber"))
        .groupBy().count().withColumnRenamed("count", "n_failing")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "row_is_in_list" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N')
        |ORDER BY 1, 2""".stripMargin,
    "row_is_in_range" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 25)
        |ORDER BY 1, 2""".stripMargin,
    "row_regex_match" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-3]-')
        |ORDER BY 1""".stripMargin,
    "ds_is_unique" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL
        |                     GROUP BY 1 HAVING count(*) > 1)
        |ORDER BY 1, 2""".stripMargin,
    "ds_foreign_key" ->
      """SELECT o_orderkey FROM orders o
        |WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
        |  SELECT 1 FROM customer c WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
        |ORDER BY 1""".stripMargin,
    "ds_is_aggr_not_greater_than" ->
      """SELECT count(*) AS n_failing FROM lineitem
        |WHERE l_returnflag IN (SELECT l_returnflag FROM lineitem
        |                       GROUP BY 1 HAVING avg(l_extendedprice) > 38000.0)""".stripMargin
  )
}
