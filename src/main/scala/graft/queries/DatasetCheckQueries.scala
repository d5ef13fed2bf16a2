package graft.queries

import graft.checks.{DatasetChecks => D}
import graft.engine.DQEngine
import graft.queries.QueryDefs._
import graft.rules.DQDatasetRule
import org.apache.spark.sql.functions._

/** Driver-contract queries for every dataset-level check (SURVEY §2.2). */
object DatasetCheckQueries {

  val all: Seq[(String, QueryDef)] = Seq(

    "ds_is_unique" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.isUnique(Seq("l_orderkey")), "is_unique", "l_orderkey"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL
             |                     GROUP BY 1 HAVING count(*) > 1)
             |ORDER BY 1, 2""".stripMargin)),

    "ds_is_unique_composite" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "lineitem").withColumn("k2", col("l_linenumber") % 3)
        failing(df, ds(D.isUnique(Seq("l_orderkey", "k2")), "is_unique", "l_orderkey", "k2"),
          Seq("l_orderkey", "l_linenumber"))
      },
      Some("""WITH d AS (SELECT l_orderkey, l_linenumber, l_linenumber % 3 AS k2 FROM lineitem)
             |SELECT l_orderkey, l_linenumber FROM d
             |WHERE (l_orderkey, k2) IN (SELECT (l_orderkey, k2) FROM d
             |                           GROUP BY l_orderkey, k2 HAVING count(*) > 1)
             |ORDER BY 1, 2""".stripMargin)),

    "ds_is_unique_probe" -> QueryDef(
      // the slim dup-key probe strategy (r11): same verdicts as the window
      // plan, gated against the same oracle
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.isUnique(Seq("l_orderkey"), strategy = "probe"), "is_unique", "l_orderkey"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL
             |                     GROUP BY 1 HAVING count(*) > 1)
             |ORDER BY 1, 2""".stripMargin)),

    "ds_foreign_key" -> QueryDef(
      (s, dir) => {
        val ref = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        failing(t(s, dir, "orders"),
          ds(D.foreignKey(Seq("o_custkey"), Seq("c_custkey"), ref), "foreign_key", "o_custkey"),
          Seq("o_orderkey"))
      },
      Some("""SELECT o_orderkey FROM orders o
             |WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
             |  SELECT 1 FROM customer c WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
             |ORDER BY 1""".stripMargin)),

    "ds_foreign_key_negate" -> QueryDef(
      (s, dir) => {
        val ref = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        failing(t(s, dir, "orders"),
          ds(D.foreignKey(Seq("o_custkey"), Seq("c_custkey"), ref, negate = true), "foreign_key", "o_custkey"),
          Seq("o_orderkey"))
      },
      Some("""SELECT o_orderkey FROM orders o
             |WHERE o.o_custkey IS NOT NULL AND EXISTS (
             |  SELECT 1 FROM customer c WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
             |ORDER BY 1""".stripMargin)),

    "ds_sql_query" -> QueryDef(
      (s, dir) => failing(t(s, dir, "orders"),
        ds(D.sqlQuery(
          "SELECT o_custkey, count(*) > 12 AS too_many FROM {{input_view}} GROUP BY o_custkey",
          mergeColumns = Seq("o_custkey"), conditionColumn = "too_many"), "sql_query", "o_custkey"),
        Seq("o_orderkey")),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_custkey IN (SELECT o_custkey FROM orders GROUP BY 1 HAVING count(*) > 12)
             |ORDER BY 1""".stripMargin)),

    "ds_is_aggr_not_greater_than" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.isAggrNotGreaterThan("l_extendedprice", 38000.0, "avg", groupBy = Seq("l_returnflag")),
          "is_aggr_not_greater_than", "l_extendedprice"),
        Seq("l_orderkey", "l_linenumber"))
        .groupBy().count().withColumnRenamed("count", "n_failing"),
      Some("""SELECT count(*) AS n_failing FROM lineitem
             |WHERE l_returnflag IN (SELECT l_returnflag FROM lineitem
             |                       GROUP BY 1 HAVING avg(l_extendedprice) > 38000.0)""".stripMargin)),

    "ds_is_aggr_not_less_than" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.isAggrNotLessThan("l_quantity", 5000.0, "sum", groupBy = Seq("l_suppkey")),
          "is_aggr_not_less_than", "l_quantity"),
        Seq("l_orderkey", "l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_suppkey IN (SELECT l_suppkey FROM lineitem
             |                    GROUP BY 1 HAVING sum(l_quantity) < 5000.0)
             |ORDER BY 1, 2""".stripMargin)),

    "ds_is_aggr_equal" -> QueryDef(
      (s, dir) => failing(t(s, dir, "orders"),
        ds(D.isAggrEqual("*", 5000.0, "count", groupBy = Seq("o_orderstatus"), relTolerance = 0.5),
          "is_aggr_equal", "o_orderstatus"),
        Seq("o_orderkey")),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_orderstatus IN (SELECT o_orderstatus FROM orders
             |                        GROUP BY 1 HAVING abs(count(*) - 5000.0) > 0.5 * 5000.0)
             |ORDER BY 1""".stripMargin)),

    "ds_is_aggr_not_equal" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.isAggrNotEqual("l_linenumber", 1.0, "min", groupBy = Seq("l_orderkey")),
          "is_aggr_not_equal", "l_linenumber"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
             |                     GROUP BY 1 HAVING min(l_linenumber) = 1)
             |ORDER BY 1, 2""".stripMargin)),

    "ds_is_aggr_count_distinct" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.isAggrNotGreaterThan("l_partkey", 6.0, "count_distinct", groupBy = Seq("l_suppkey")),
          "is_aggr_not_greater_than", "l_partkey"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_suppkey IN (SELECT l_suppkey FROM lineitem
             |                    GROUP BY 1 HAVING count(DISTINCT l_partkey) > 6)
             |ORDER BY 1, 2""".stripMargin)),

    "ds_has_no_aggr_outliers" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(!(dayofmonth(col("ts")) === 15 && col("event_id") % 10 =!= 0))
        failing(ev, ds(D.hasNoAggrOutliers("*", "ts", "count", sigma = 6.0, lookback = 10,
          warmup = 3, timeInterval = "1 day"), "has_no_aggr_outliers", "ts"),
          Seq("event_id"))
      },
      Some("""WITH ev AS (SELECT * FROM events WHERE NOT (date_part('day', ts) = 15 AND event_id % 10 != 0)),
             |b AS (SELECT to_timestamp(floor(epoch(ts) / 86400) * 86400) AS g, count(*) AS c FROM ev GROUP BY 1),
             |st AS (SELECT g, c,
             |         avg(c)        OVER (ORDER BY g ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS m,
             |         stddev_pop(c) OVER (ORDER BY g ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS sd,
             |         count(c)      OVER (ORDER BY g ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS n
             |       FROM b),
             |bad AS (SELECT g FROM st WHERE n >= 3 AND sd IS NOT NULL AND abs(c - m) > 6.0 * sd)
             |SELECT event_id FROM ev
             |WHERE to_timestamp(floor(epoch(ts) / 86400) * 86400) IN (SELECT g FROM bad)
             |ORDER BY 1""".stripMargin)),

    // Same rolling-band check at 15-minute grain: orderedWindowPartsFor(900)
    // is None, so THIS gate oracle-pins the partitioned bucket-repair window
    // (the 1-day gate above now takes the plain single-task path — r14's
    // static small-frame gate would otherwise leave the partitioned
    // rolling-band shape spec-pinned only).
    "ds_has_no_aggr_outliers_fine" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(!(dayofmonth(col("ts")) === 15 && col("event_id") % 10 =!= 0))
        failing(ev, ds(D.hasNoAggrOutliers("*", "ts", "count", sigma = 6.0, lookback = 10,
          warmup = 3, timeInterval = "15 minutes"), "has_no_aggr_outliers", "ts"),
          Seq("event_id"))
      },
      Some("""WITH ev AS (SELECT * FROM events WHERE NOT (date_part('day', ts) = 15 AND event_id % 10 != 0)),
             |b AS (SELECT to_timestamp(floor(epoch(ts) / 900) * 900) AS g, count(*) AS c FROM ev GROUP BY 1),
             |st AS (SELECT g, c,
             |         avg(c)        OVER (ORDER BY g ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS m,
             |         stddev_pop(c) OVER (ORDER BY g ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS sd,
             |         count(c)      OVER (ORDER BY g ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS n
             |       FROM b),
             |bad AS (SELECT g FROM st WHERE n >= 3 AND sd IS NOT NULL AND abs(c - m) > 6.0 * sd)
             |SELECT event_id FROM ev
             |WHERE to_timestamp(floor(epoch(ts) / 900) * 900) IN (SELECT g FROM bad)
             |ORDER BY 1""".stripMargin)),

    "ds_aggr_matches_dataset" -> QueryDef(
      (s, dir) => {
        val ref = t(s, dir, "orders").where(col("o_orderkey") % 100 =!= 0)
        failing(t(s, dir, "orders"),
          ds(D.aggrMatchesDataset("*", ref, "*", "count", groupBy = Seq("o_orderstatus")),
            "aggr_matches_dataset", "o_orderstatus"),
          Seq("o_orderkey"))
      },
      Some("""WITH ref AS (SELECT * FROM orders WHERE o_orderkey % 100 != 0),
             |cur AS (SELECT o_orderstatus, count(*) AS c FROM orders GROUP BY 1),
             |r AS (SELECT o_orderstatus, count(*) AS c FROM ref GROUP BY 1)
             |SELECT o_orderkey FROM orders
             |WHERE o_orderstatus IN (
             |  SELECT cur.o_orderstatus FROM cur LEFT JOIN r USING (o_orderstatus)
             |  WHERE cur.c IS DISTINCT FROM r.c)
             |ORDER BY 1""".stripMargin)),

    "ds_compare_datasets" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val ref = o
          .where(col("o_orderkey") % 50 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 70 === 0, col("o_totalprice") + 1).otherwise(col("o_totalprice")))
          .unionByName(o.where(col("o_orderkey") % 90 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + 5000000))
        val rule = ds(D.compareDatasets(Seq("o_orderkey"), Seq("o_orderkey"), ref,
          checkMissingRecords = true), "compare_datasets", "o_orderkey")
        DQEngine.applyChecks(o, Seq(rule))
          .where(col("_errors").isNotNull)
          .select(col("o_orderkey"),
            get_json_object(col("_errors")(0)("message"), "$.row_missing").cast("boolean").as("row_missing"),
            get_json_object(col("_errors")(0)("message"), "$.row_extra").cast("boolean").as("row_extra"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH ref AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 70 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
             |         o_custkey, o_orderstatus, o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey % 50 != 0
             |  UNION ALL
             |  SELECT o_orderkey + 5000000, o_totalprice, o_custkey, o_orderstatus, o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey % 90 = 0)
             |SELECT coalesce(l.o_orderkey, r.o_orderkey) AS o_orderkey,
             |       (l.o_orderkey IS NULL) AS row_missing,
             |       (r.o_orderkey IS NULL) AS row_extra
             |FROM orders l FULL OUTER JOIN ref r ON l.o_orderkey = r.o_orderkey
             |WHERE l.o_orderkey IS NULL OR r.o_orderkey IS NULL
             |   OR l.o_totalprice IS DISTINCT FROM r.o_totalprice
             |ORDER BY 1""".stripMargin)),

    "ds_is_data_fresh_per_time_window" -> QueryDef(
      (s, dir) => failing(t(s, dir, "events"),
        ds(D.isDataFreshPerTimeWindow("ts", windowMinutes = 60, minRecordsPerWindow = 10),
          "is_data_fresh_per_time_window", "ts"),
        Seq("event_id")),
      Some("""WITH w AS (SELECT event_id, to_timestamp(floor(epoch(ts) / 3600) * 3600) AS ws FROM events),
             |c AS (SELECT ws, count(*) AS n FROM w GROUP BY 1)
             |SELECT event_id FROM w JOIN c USING (ws) WHERE c.n < 10 ORDER BY 1""".stripMargin)),

    "ds_has_no_gaps_per_time_window" -> QueryDef(
      (s, dir) => failing(t(s, dir, "events"),
        ds(D.hasNoGapsPerTimeWindow("ts", windowMinutes = 10), "has_no_gaps_per_time_window", "ts"),
        Seq("event_id")),
      Some("""WITH w AS (SELECT event_id, to_timestamp(floor(epoch(ts) / 600) * 600) AS ws FROM events),
             |occ AS (SELECT DISTINCT ws FROM w),
             |gaps AS (SELECT ws, lead(ws) OVER (ORDER BY ws) AS nxt FROM occ)
             |SELECT event_id FROM w
             |WHERE ws IN (SELECT ws FROM gaps WHERE nxt IS NOT NULL AND epoch(nxt) - epoch(ws) > 600)
             |ORDER BY 1""".stripMargin)),

    "ds_has_no_outliers" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.hasNoOutliers("l_extendedprice", factor = 1.5, exact = true), "has_no_outliers", "l_extendedprice"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""WITH med AS (SELECT median(l_extendedprice) AS m FROM lineitem),
             |mad AS (SELECT median(abs(l_extendedprice - (SELECT m FROM med))) AS d FROM lineitem)
             |SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_extendedprice IS NOT NULL
             |  AND (l_extendedprice < (SELECT m FROM med) - 1.5 * (SELECT d FROM mad)
             |    OR l_extendedprice > (SELECT m FROM med) + 1.5 * (SELECT d FROM mad))
             |ORDER BY 1, 2""".stripMargin)),

    "ds_has_valid_schema" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.hasValidSchema("l_orderkey BIGINT, l_quantity DOUBLE, l_missing_col STRING"),
          "has_valid_schema"),
        Seq("l_orderkey", "l_linenumber"))
        .groupBy().count().withColumnRenamed("count", "n_failing"),
      Some("SELECT count(*) AS n_failing FROM lineitem")),

    "ds_has_no_row_anomalies" -> QueryDef(
      (s, dir) => failing(t(s, dir, "customer"),
        ds(D.hasNoRowAnomalies(Seq("c_acctbal"), threshold = 1.5), "has_no_row_anomalies", "c_acctbal"),
        Seq("c_custkey")),
      Some("""WITH st AS (SELECT avg(c_acctbal) AS m, stddev_samp(c_acctbal) AS sd FROM customer)
             |SELECT c_custkey FROM customer, st
             |WHERE abs(c_acctbal - st.m) / st.sd > 1.5
             |ORDER BY 1""".stripMargin)),

    // Top-contributor explanation text over the z-score anomaly path: every
    // piece (z per column, |z| share percentages, sort order, half-up integer
    // rounding, the reference's "col (N%), col (M%)" format) is DuckDB-
    // recomputable. c_acctbal sorts before c_nationkey on equal shares in
    // both engines (name tiebreak).
    "ds_anomaly_top_contributors" -> QueryDef(
      (s, dir) => {
        val checked = DQEngine.applyChecks(t(s, dir, "customer"), Seq(
          ds(D.hasNoRowAnomalies(Seq("c_acctbal", "c_nationkey"), threshold = 1.5),
            "has_no_row_anomalies", "c_acctbal")))
        val contrib = element_at(col("_dq_info"), 1)
          .getField("anomaly").getField("contributions")
        checked.where(col("_errors").isNotNull)
          .select(col("c_custkey"),
            coalesce(graft.anomaly.Explain.topContributors(contrib, 2), lit(""))
              .as("top_contributors"))
          .orderBy("c_custkey")
      },
      Some("""WITH st AS (SELECT avg(c_acctbal) AS m1, stddev_samp(c_acctbal) AS s1,
             |                   avg(c_nationkey) AS m2, stddev_samp(c_nationkey) AS s2 FROM customer),
             |z AS (SELECT c_custkey,
             |        abs(c_acctbal - st.m1) / st.s1 AS z1,
             |        abs(c_nationkey - st.m2) / st.s2 AS z2 FROM customer, st)
             |SELECT c_custkey,
             |  CASE WHEN z1 >= z2
             |    THEN 'c_acctbal (' || CAST(round(z1/(z1+z2)*100) AS BIGINT)
             |      || '%), c_nationkey (' || CAST(round(z2/(z1+z2)*100) AS BIGINT) || '%)'
             |    ELSE 'c_nationkey (' || CAST(round(z2/(z1+z2)*100) AS BIGINT)
             |      || '%), c_acctbal (' || CAST(round(z1/(z1+z2)*100) AS BIGINT) || '%)'
             |  END AS top_contributors
             |FROM z WHERE greatest(z1, z2) > 1.5 ORDER BY c_custkey""".stripMargin)),

    // Model-based scoring has no SQL analog, so the gate asserts the three
    // properties an oracle CAN check: (1) planted extreme outliers (1e6
    // balance vs the natural -999..9999 range) must all be flagged at the
    // 99th-percentile threshold, (2) two independent applyChecks runs with
    // the same seed must flag the identical row set (symmetric diff 0), and
    // (3) every flagged row's per-feature contribution percentages (the SHAP
    // stand-in) must sum to ~100.
    "ds_has_no_row_anomalies_iforest" -> QueryDef(
      (s, dir) => {
        val base = t(s, dir, "customer").select("c_custkey", "c_acctbal", "c_nationkey")
        val planted = base.unionByName(
          base.where(col("c_custkey") % 150 === 7)
            .select((col("c_custkey") + 900000).as("c_custkey"),
              lit(1000000.0).as("c_acctbal"), col("c_nationkey")))
        def run(): org.apache.spark.sql.DataFrame =
          graft.engine.DQEngine.applyChecks(planted, Seq(
            ds(D.hasNoRowAnomaliesIForest(Seq("c_acctbal", "c_nationkey"),
              threshold = 99.0, seed = 11), "has_no_row_anomalies", "c_acctbal")))
            .where(col("_errors").isNotNull)
            .select(col("c_custkey"),
              col("_dq_info")(0).getField("anomaly").getField("contributions").as("contrib"))
        val r1 = run()
        val r2 = run()
        val diff = r1.select("c_custkey").exceptAll(r2.select("c_custkey"))
          .unionByName(r2.select("c_custkey").exceptAll(r1.select("c_custkey")))
        val contribSum = aggregate(map_values(col("contrib")), lit(0.0), _ + _)
        r1.where(col("c_custkey") >= 900000)
          .agg(count(lit(1)).as("n_planted_flagged"))
          .crossJoin(broadcast(diff.agg(count(lit(1)).as("n_run_diff"))))
          .crossJoin(broadcast(r1.agg(sum(
            when(col("contrib").isNull || abs(contribSum - 100.0) > 0.1, 1).otherwise(0)
          ).cast("bigint").as("n_bad_contrib"))))
      },
      Some("""SELECT count(*) AS n_planted_flagged, CAST(0 AS BIGINT) AS n_run_diff,
             |       CAST(0 AS BIGINT) AS n_bad_contrib
             |FROM customer WHERE c_custkey % 150 = 7""".stripMargin)),

    "ds_points_mutually_disjoint" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("wkt", format_string("POINT (%d %d)", col("c_custkey") % 40, col("c_custkey") % 7))
        failing(df, ds(graft.checks.GeoChecks.arePointsMutuallyDisjoint("wkt"),
          "are_polygons_mutually_disjoint", "wkt"),
          Seq("c_custkey"))
      },
      Some("""WITH d AS (SELECT c_custkey, c_custkey % 40 AS x, c_custkey % 7 AS y FROM customer)
             |SELECT c_custkey FROM d
             |WHERE (x, y) IN (SELECT (x, y) FROM d GROUP BY x, y HAVING count(*) > 1)
             |ORDER BY 1""".stripMargin)),

    "ds_has_valid_schema_pass" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        ds(D.hasValidSchema("l_orderkey BIGINT, l_quantity DOUBLE"), "has_valid_schema"),
        Seq("l_orderkey", "l_linenumber"))
        .groupBy().count().withColumnRenamed("count", "n_failing"),
      Some("SELECT 0::BIGINT AS n_failing")),

    // Per-segment drift (drift.py:219-253) in ONE grouped aggregation: the
    // F segment's baseline is planted far off (drifts), O and P sit on
    // their true stats (clean).
    "ds_segment_drift" -> QueryDef(
      (s, dir) => {
        import graft.anomaly.Drift
        val base = Map(
          Seq("F") -> Map("o_totalprice" -> Drift.ColumnStats(100000.0, 10000.0)),
          Seq("O") -> Map("o_totalprice" -> Drift.ColumnStats(250000.0, 140000.0)),
          Seq("P") -> Map("o_totalprice" -> Drift.ColumnStats(250000.0, 140000.0)))
        Drift.segmentDriftScores(t(s, dir, "orders"), Seq("o_orderstatus"), base)
          .select(col("o_orderstatus"), col("column").as("col_name"),
            round(col("score"), 4).as("drift_score"), col("drifted"),
            col("sample_size"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH cur AS (SELECT o_orderstatus AS seg, count(*) AS n,
             |  avg(o_totalprice) AS m, stddev(o_totalprice) AS s
             |  FROM orders GROUP BY 1),
             |base AS (SELECT * FROM (VALUES ('F', 100000.0, 10000.0),
             |  ('O', 250000.0, 140000.0), ('P', 250000.0, 140000.0)) b(seg, bm, bs))
             |SELECT c.seg AS o_orderstatus, 'o_totalprice' AS col_name,
             |       round(CAST(0.7*abs(m-bm)/bs + 0.3*abs(s-bs)/bs AS DOUBLE), 4) AS drift_score,
             |       (n >= 1000 AND 0.7*abs(m-bm)/bs + 0.3*abs(s-bs)/bs >= 3.0) AS drifted,
             |       n AS sample_size
             |FROM cur c JOIN base b ON c.seg = b.seg
             |ORDER BY 1""".stripMargin)),

    // has_no_drift as a dataset CHECK: the baseline is far from the data, so
    // drift is detected and every row fails (flag-all convention); the oracle
    // recomputes the score decision and the row count in one aggregate.
    "ds_has_no_drift" -> QueryDef(
      (s, dir) => {
        import graft.anomaly.Drift
        val df = t(s, dir, "orders")
        val checked = graft.engine.DQEngine.applyChecks(df, Seq(
          ds(D.hasNoDrift(Seq("o_totalprice"),
            Map("o_totalprice" -> Drift.ColumnStats(100000.0, 10000.0))),
            "has_no_drift", "o_totalprice")))
        checked.where(col("_errors").isNotNull)
          .agg(count(lit(1)).as("n_failing"))
      },
      Some("""SELECT CASE WHEN 0.7*abs(avg(o_totalprice)-100000.0)/10000.0
             |          + 0.3*abs(stddev(o_totalprice)-10000.0)/10000.0 >= 3.0
             |       THEN count(*) ELSE CAST(0 AS BIGINT) END AS n_failing
             |FROM orders""".stripMargin)),

    // drift.py:34-195 — per-column baseline-vs-current drift scores against a
    // fixed literal baseline (the registry supplies it in production); o_flag
    // is a constant column exercising the zero-baseline-std branch.
    "ds_drift_scores" -> QueryDef(
      (s, dir) => {
        import graft.anomaly.Drift
        val cur = t(s, dir, "orders").withColumn("o_flag", lit(0.0))
        val baseline = Map(
          "o_totalprice" -> Drift.ColumnStats(240000.0, 140000.0),
          "o_custkey" -> Drift.ColumnStats(750.0, 400.0),
          "o_flag" -> Drift.ColumnStats(1.0, 0.0))
        Drift.driftScores(cur, baseline)
          .select(col("column").as("col_name"),
            round(col("score"), 4).as("drift_score"),
            (col("score") >= 0.5).as("drifted"), col("sample_size"))
          .orderBy("col_name")
      },
      Some("""WITH cur AS (
             |  SELECT count(*) AS n,
             |         avg(o_totalprice) AS m_tp, stddev(o_totalprice) AS s_tp,
             |         avg(o_custkey) AS m_ck, stddev(o_custkey) AS s_ck,
             |         avg(0.0) AS m_fl, stddev(0.0) AS s_fl
             |  FROM orders
             |), scores AS (
             |  SELECT 'o_totalprice' AS col_name,
             |         0.7*abs(m_tp-240000.0)/140000.0 + 0.3*abs(s_tp-140000.0)/140000.0 AS score,
             |         n FROM cur
             |  UNION ALL
             |  SELECT 'o_custkey',
             |         0.7*abs(m_ck-750.0)/400.0 + 0.3*abs(s_ck-400.0)/400.0, n FROM cur
             |  UNION ALL
             |  SELECT 'o_flag', 0.7*abs(m_fl-1.0), n FROM cur
             |)
             |SELECT col_name, round(score, 4) AS drift_score, score >= 0.5 AS drifted,
             |       n AS sample_size
             |FROM scores ORDER BY col_name""".stripMargin))
  )
}
