package graft.checks

import graft.core.CheckUtils._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo checks — OSS-portable subset (reference geo/check_funcs.py wraps
  * Databricks-only ST_ SQL functions; those need Sedona or DBR. Lat/lon and
  * WKT POINT checks are pure expressions and implemented here; the full ST_
  * family stays a pluggable boundary, see SURVEY §2.1 #41-51).
  */
object GeoChecks {

  /** WKT POINT syntax: POINT (x y) with optional sign/decimals/exponent. */
  private val PointWktRegex = "^\\s*POINT\\s*\\(\\s*[-+]?\\d+(\\.\\d+)?([eE][-+]?\\d+)?\\s+[-+]?\\d+(\\.\\d+)?([eE][-+]?\\d+)?\\s*\\)\\s*$"

  private def pointX(c: Column): Column =
    regexp_extract(c.cast("string"), "POINT\\s*\\(\\s*([-+]?[0-9.eE+-]+)\\s+([-+]?[0-9.eE+-]+)\\s*\\)", 1).cast("double")
  private def pointY(c: Column): Column =
    regexp_extract(c.cast("string"), "POINT\\s*\\(\\s*([-+]?[0-9.eE+-]+)\\s+([-+]?[0-9.eE+-]+)\\s*\\)", 2).cast("double")

  private def isPointWkt(c: Column): Column = c.cast("string").rlike(PointWktRegex)

  /** geo:166 — value is not a WKT point fails. */
  def isPoint(c: Column): Column =
    makeCondition(c.isNotNull && !isPointWkt(c),
      concat(lit("Value '"), valueText(c), lit(s"' in column '${c.toString}' is not a WKT point")))

  /** geo:391 — empty geometry (POINT EMPTY) or unparseable fails. */
  def isNonEmptyGeometry(c: Column): Column =
    makeCondition(c.isNotNull &&
      (upper(trim(c.cast("string"))).rlike("^[A-Z]+\\s+EMPTY$") || !isPointWkt(c)),
      concat(lit("Value '"), valueText(c), lit(s"' in column '${c.toString}' is an empty or invalid geometry")))

  /** geo:420 — point at (0, 0) (null island) fails. */
  def isNotNullIsland(c: Column): Column =
    makeCondition(c.isNotNull && isPointWkt(c) && pointX(c) === 0.0 && pointY(c) === 0.0,
      concat(lit("Value '"), valueText(c), lit(s"' in column '${c.toString}' is null island (0 0)")))

  /** geo:487 — point x outside [min,max] fails. */
  def hasXCoordinateBetween(c: Column, minX: Double, maxX: Double): Column =
    makeCondition(c.isNotNull && isPointWkt(c) && !pointX(c).between(minX, maxX),
      concat(lit("Value '"), valueText(c),
        lit(s"' in column '${c.toString}' has x outside [$minX, $maxX]")))

  /** geo:520 — point y outside [min,max] fails. */
  def hasYCoordinateBetween(c: Column, minY: Double, maxY: Double): Column =
    makeCondition(c.isNotNull && isPointWkt(c) && !pointY(c).between(minY, maxY),
      concat(lit("Value '"), valueText(c),
        lit(s"' in column '${c.toString}' has y outside [$minY, $maxY]")))

  /** D16 (geo/check_funcs.py:893) restricted to the WKT-point subset: two
    * point geometries "overlap" iff their coordinates coincide, so mutual
    * disjointness = no duplicate coordinates — one window count per coordinate
    * pair (the general polygon case needs a spatial library and stays a
    * pluggable boundary).
    */
  def arePointsMutuallyDisjoint(column: String, rowFilter: Option[String] = None): graft.rules.DatasetCheck = {
    import graft.core.CheckUtils.uniqueSuffix
    import org.apache.spark.sql.expressions.Window
    val id = uniqueSuffix()
    val cntCol = s"__dq_geo_cnt_$id"
    val filterC = rowFilter.map(expr).getOrElse(lit(true))
    val c = col(column)
    val applyFn = (df: org.apache.spark.sql.DataFrame) => {
      val w = Window.partitionBy(pointX(c), pointY(c))
      df.withColumn(cntCol,
        sum(when(filterC && isPointWkt(c), lit(1)).otherwise(lit(0))).over(w))
    }
    graft.rules.DatasetCheck(applyFn,
      makeCondition(filterC && isPointWkt(c) && col(cntCol) > 1,
        concat(lit("Point '"), valueText(c),
          lit(s"' in column '$column' coincides with "), (col(cntCol) - 1).cast("string"),
          lit(" other geometr(ies)"))))
  }

  /** geo:63/86 combined — WKT point within lat/lon bounds (x=lon, y=lat). */
  def isValidLonLatPoint(c: Column): Column =
    makeCondition(c.isNotNull &&
      (!isPointWkt(c) || !pointX(c).between(-180d, 180d) || !pointY(c).between(-90d, 90d)),
      concat(lit("Value '"), valueText(c),
        lit(s"' in column '${c.toString}' is not a valid lon/lat point")))
}
