package graft.queries

import graft.profiler.{Profiler, ProfilerOptions}
import org.apache.spark.sql.functions._

import QueryDefs._

/** Oracle gates for the profiler surface: the one-pass summary stats and the
  * deterministic primary-key candidate detector get DuckDB-recomputed
  * expectations (exact stats only — the HLL distinct sketch stays spec-gated).
  */
object ProfilerQueries {

  /** Full-fraction options so the DuckDB oracle sees the same rows. */
  private val exactOpts =
    ProfilerOptions(sampleFraction = 1.0, limit = Int.MaxValue)

  val all: Map[String, QueryDef] = Map(

    // One-pass per-column stats (two numeric + two string columns): exact
    // fields only. mean/stddev are excluded from the gate (summation-order
    // float drift) but remain spec-tested.
    "prof_summary" -> QueryDef(
      (s, dir) => Profiler.summaryDf(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"), exactOpts)
        .select(col("column").as("col_name"), col("n"), col("n_null"),
          col("n_empty"), col("min"), col("max"))
        .orderBy("col_name"),
      Some("""SELECT 'l_quantity' AS col_name, count(*) AS n,
             |       count(*) - count(l_quantity) AS n_null,
             |       CAST(NULL AS BIGINT) AS n_empty,
             |       CAST(min(l_quantity) AS DOUBLE) AS min,
             |       CAST(max(l_quantity) AS DOUBLE) AS max FROM lineitem
             |UNION ALL
             |SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
             |       CAST(NULL AS BIGINT),
             |       CAST(min(l_extendedprice) AS DOUBLE),
             |       CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem
             |UNION ALL
             |SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
             |       count(CASE WHEN trim(l_returnflag) = '' THEN 1 END),
             |       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem
             |UNION ALL
             |SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
             |       count(CASE WHEN trim(l_linestatus) = '' THEN 1 END),
             |       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem
             |ORDER BY col_name""".stripMargin)),

    // PK candidate detection over a clearly-unique key, a low-cardinality FK,
    // and a categorical — only the key survives. DuckDB applies the same
    // rule with EXACT distinct counts at the sketch's worst-case band edge
    // (0.99 threshold - 0.01 relative error), so the columns chosen sit far
    // from the boundary on both sides.
    "prof_pk_candidates" -> QueryDef(
      (s, dir) => {
        val cands = Profiler.primaryKeyCandidates(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus"))
        val spark = s
        import spark.implicits._
        cands.map(_._1).sorted.toDF("col_name").orderBy("col_name")
      },
      Some("""SELECT col_name FROM (
             |  SELECT 'o_orderkey' AS col_name,
             |         count(o_orderkey) = count(*) AND
             |         count(DISTINCT o_orderkey) >= 0.98 * count(*) AS ok FROM orders
             |  UNION ALL
             |  SELECT 'o_custkey',
             |         count(o_custkey) = count(*) AND
             |         count(DISTINCT o_custkey) >= 0.98 * count(*) FROM orders
             |  UNION ALL
             |  SELECT 'o_orderstatus',
             |         count(o_orderstatus) = count(*) AND
             |         count(DISTINCT o_orderstatus) >= 0.98 * count(*) FROM orders)
             |WHERE ok ORDER BY col_name""".stripMargin)))
}
