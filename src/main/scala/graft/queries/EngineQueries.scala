package graft.queries

import graft.checks.{DatasetChecks => D, RowChecks => R}
import graft.core.Criticality
import graft.engine.DQEngine
import graft.metrics.{Metrics, MetricsRunInfo}
import graft.queries.QueryDefs._
import graft.rules._
import org.apache.spark.sql.functions._

/** Driver-contract queries for engine-level surfaces: summary metrics with
  * the per-check breakdown (metrics_observer.py:108-147) and the `_dq_info`
  * result column (reporting_columns.py:22-52).
  */
object EngineQueries {

  val all: Seq[(String, QueryDef)] = Seq(

    // Per-check breakdown JSON must byte-match an independently-written oracle.
    "eng_check_metrics" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val rules = Seq(
          DQRowRule(R.isNotGreaterThan(col("l_quantity"), 30), "is_not_greater_than",
            Seq("l_quantity"), name = "qty_hi"),
          DQRowRule(R.isNotLessThan(col("l_quantity"), 5), "is_not_less_than",
            Seq("l_quantity"), name = "qty_lo", criticality = Criticality.Warn))
        val checked = DQEngine.applyChecks(li, rules)
        Metrics.computeSummaryMetrics(checked, MetricsRunInfo("gate"),
            checkNames = rules.map(_.resolvedName))
          .select(col("metric_name"), col("metric_value"))
          .orderBy("metric_name")
      },
      Some("""WITH s AS (
             |  SELECT count(*) AS total,
             |         count(CASE WHEN l_quantity > 30 THEN 1 END) AS e,
             |         count(CASE WHEN l_quantity < 5 THEN 1 END) AS w,
             |         count(CASE WHEN NOT (l_quantity > 30) AND NOT (l_quantity < 5) THEN 1 END) AS v
             |  FROM lineitem)
             |SELECT metric_name, metric_value FROM (
             |  SELECT 'input_row_count' AS metric_name, CAST(total AS VARCHAR) AS metric_value FROM s
             |  UNION ALL SELECT 'error_row_count', CAST(e AS VARCHAR) FROM s
             |  UNION ALL SELECT 'warning_row_count', CAST(w AS VARCHAR) FROM s
             |  UNION ALL SELECT 'valid_row_count', CAST(v AS VARCHAR) FROM s
             |  UNION ALL SELECT 'check_metrics',
             |    '[{"check_name":"qty_hi","error_count":' || CAST(e AS VARCHAR) ||
             |    ',"warning_count":0},{"check_name":"qty_lo","error_count":0,"warning_count":' ||
             |    CAST(w AS VARCHAR) || '}]' FROM s
             |) ORDER BY metric_name""".stripMargin)),

    // _dq_info anomaly flag must agree with an independent z-score computation.
    "eng_dq_info_anomaly" -> QueryDef(
      (s, dir) => {
        val rule = ds(D.hasNoRowAnomalies(Seq("c_acctbal"), threshold = 1.5),
          "has_no_row_anomalies", "c_acctbal")
        DQEngine.applyChecks(t(s, dir, "customer"), Seq(rule))
          .where(col("_dq_info")(0).getField("anomaly").getField("is_anomaly"))
          .select(col("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""WITH st AS (SELECT avg(c_acctbal) AS m, stddev_samp(c_acctbal) AS sd FROM customer)
             |SELECT c_custkey FROM customer, st
             |WHERE abs(c_acctbal - st.m) / st.sd > 1.5
             |ORDER BY 1""".stripMargin))
  )
}
