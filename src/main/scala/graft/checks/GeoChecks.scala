package graft.checks

import graft.core.CheckUtils._
import graft.geo.{WktEnvelopeCells, WktInfo, WktPairIntersects, WktRelation}
import graft.rules.DatasetCheck
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Geo check family (SURVEY §2.1 #41-51, §2.2 D16; reference
  * geo/check_funcs.py:110-1302 wraps Databricks-only spatial SQL functions).
  * OSS-portable implementation over a pure-Scala WKT parser + computational
  * geometry ([[graft.geo.Wkt]]); one [[WktInfo]] parse per row yields every
  * property. Unparseable values yield NULL — they PASS type/metric checks,
  * matching `try_to_geometry` null semantics (use is_geometry to flag them).
  */
object GeoChecks {

  private def info(c: Column): Column =
    GraftColumnBridge.column(WktInfo(GraftColumnBridge.expression(c.cast("string"))))

  private def fail(c: Column, cond: Column, what: String): Column =
    makeCondition(c.isNotNull && cond,
      concat(lit("Value '"), valueText(c), lit(s"' in column '${c.toString}' $what")))

  // ------------------------------------------------------------ #42 existence

  /** geo:110 — unparseable geometry fails. */
  def isGeometry(c: Column): Column =
    fail(c, info(c).isNull, "is not a valid geometry")

  /** geo:138 — geography = parseable AND all coordinates within lon/lat
    * bounds (x in [-180,180], y in [-90,90]).
    */
  def isGeography(c: Column): Column = {
    val i = info(c)
    val inBounds = i.getField("is_empty") ||
      (i.getField("xmin") >= -180d && i.getField("xmax") <= 180d &&
        i.getField("ymin") >= -90d && i.getField("ymax") <= 90d)
    fail(c, i.isNull || !inBounds, "is not a valid geography")
  }

  // ----------------------------------------------------------- #43 type probes

  private def typeCheck(c: Column, stType: String, human: String): Column =
    fail(c, info(c).getField("type") =!= stType, s"is not a $human")

  /** geo:166-334 — st_geometrytype probes; unparseable passes (NULL <> type). */
  def isPoint(c: Column): Column = typeCheck(c, "ST_Point", "WKT point")
  def isLineString(c: Column): Column = typeCheck(c, "ST_LineString", "WKT linestring")
  def isPolygon(c: Column): Column = typeCheck(c, "ST_Polygon", "WKT polygon")
  def isMultiPoint(c: Column): Column = typeCheck(c, "ST_MultiPoint", "WKT multipoint")
  def isMultiLineString(c: Column): Column = typeCheck(c, "ST_MultiLineString", "WKT multilinestring")
  def isMultiPolygon(c: Column): Column = typeCheck(c, "ST_MultiPolygon", "WKT multipolygon")
  def isGeometryCollection(c: Column): Column = typeCheck(c, "ST_GeometryCollection", "WKT geometrycollection")

  // --------------------------------------------------- #44-48 property probes

  /** geo:362 — parseable but OGC-invalid fails. */
  def isOgcValid(c: Column): Column =
    fail(c, !info(c).getField("is_valid"), "is not a valid OGC geometry")

  /** geo:391 — parseable but EMPTY fails. */
  def isNonEmptyGeometry(c: Column): Column =
    fail(c, info(c).getField("is_empty"), "is an empty geometry")

  /** geo:420 — point at (0, 0) fails. */
  def isNotNullIsland(c: Column): Column = {
    val i = info(c)
    fail(c, i.getField("x") === 0.0 && i.getField("y") === 0.0, "is null island (0 0)")
  }

  /** geo:457 — st_dimension <> expected fails. */
  def hasDimension(c: Column, dimension: Int): Column =
    fail(c, info(c).getField("dimension") =!= dimension, s"does not have dimension $dimension")

  /** geo:487/:520 — envelope outside [min,max] fails (st_xmin/st_xmax range). */
  def hasXCoordinateBetween(c: Column, minX: Double, maxX: Double): Column = {
    val i = info(c)
    fail(c, i.getField("xmin") < minX || i.getField("xmax") > maxX,
      s"has x outside [$minX, $maxX]")
  }

  def hasYCoordinateBetween(c: Column, minY: Double, maxY: Double): Column = {
    val i = info(c)
    fail(c, i.getField("ymin") < minY || i.getField("ymax") > maxY,
      s"has y outside [$minY, $maxY]")
  }

  // --------------------------------------------- #49/#50 area and point-count

  /** geo:553-667 — st_area comparisons (shoelace area, Cartesian). */
  def isAreaEqualTo(c: Column, value: Double): Column =
    fail(c, info(c).getField("area") =!= value, s"has area not equal to $value")
  def isAreaNotEqualTo(c: Column, value: Double): Column =
    fail(c, info(c).getField("area") === value, s"has area equal to $value")
  def isAreaNotGreaterThan(c: Column, value: Double): Column =
    fail(c, info(c).getField("area") > value, s"has area greater than $value")
  def isAreaNotLessThan(c: Column, value: Double): Column =
    fail(c, info(c).getField("area") < value, s"has area less than $value")

  /** geo:705-792 — st_numpoints comparisons (total vertex count). */
  def isNumPointsEqualTo(c: Column, value: Int): Column =
    fail(c, info(c).getField("num_points") =!= value, s"has num_points not equal to $value")
  def isNumPointsNotEqualTo(c: Column, value: Int): Column =
    fail(c, info(c).getField("num_points") === value, s"has num_points equal to $value")
  def isNumPointsNotGreaterThan(c: Column, value: Int): Column =
    fail(c, info(c).getField("num_points") > value, s"has more than $value points")
  def isNumPointsNotLessThan(c: Column, value: Int): Column =
    fail(c, info(c).getField("num_points") < value, s"has fewer than $value points")

  // ------------------------------------------------- #51 topological relations

  private def relation(c: Column, referenceWkt: String, rel: String, human: String): Column = {
    val holds = GraftColumnBridge.column(
      WktRelation(GraftColumnBridge.expression(c.cast("string")), referenceWkt, rel))
    // st_rel(reference, column); unparseable row value -> NULL -> pass
    fail(c, !holds, s"is not $human the reference geometry")
  }

  /** geo:1094-1302 — precise relation probes vs a literal reference geometry;
    * argument order st_rel(reference, column) (geo:1006).
    */
  def isGeoContains(c: Column, referenceWkt: String): Column =
    relation(c, referenceWkt, "CONTAINS", "contained by")
  def isGeoCovers(c: Column, referenceWkt: String): Column =
    relation(c, referenceWkt, "COVERS", "covered by")
  def isGeoIntersects(c: Column, referenceWkt: String): Column =
    relation(c, referenceWkt, "INTERSECTS", "intersecting")
  def isGeoTouches(c: Column, referenceWkt: String): Column =
    relation(c, referenceWkt, "TOUCHES", "touching")
  def isGeoWithin(c: Column, referenceWkt: String): Column =
    relation(c, referenceWkt, "WITHIN", "within")

  /** geo:1027 `_has_topological_relationship_approximate`: the reference
    * compares H3 cell covers of both geometries at a resolution. OSS analog:
    * square-grid envelope-cell covers at `cellSize` (same [[WktEnvelopeCells]]
    * machinery as the D16 spatial join) — INTERSECTS = cell sets overlap,
    * COVERS = the value's cells are a subset of the reference's. Like the H3
    * variant this is a fast approximation: false positives shrink with
    * `cellSize` (finer grid), and unparseable values pass (NULL semantics).
    */
  def isGeoIntersectsApprox(c: Column, referenceWkt: String, cellSize: Double = 1.0): Column =
    approxRelation(c, referenceWkt, cellSize, covers = false,
      "does not approximately intersect the reference geometry")

  def isGeoCoversApprox(c: Column, referenceWkt: String, cellSize: Double = 1.0): Column =
    approxRelation(c, referenceWkt, cellSize, covers = true,
      "is not approximately covered by the reference geometry")

  private def approxRelation(c: Column, referenceWkt: String, cellSize: Double,
                             covers: Boolean, what: String): Column = {
    val cells = GraftColumnBridge.column(WktEnvelopeCells(
      GraftColumnBridge.expression(c.cast("string")), cellSize))
    val refCells = GraftColumnBridge.column(WktEnvelopeCells(
      GraftColumnBridge.expression(lit(referenceWkt).cast("string")), cellSize))
    val inter = size(array_intersect(cells, refCells))
    val inside = if (covers) inter === size(cells) else inter > 0
    fail(c, cells.isNotNull && !inside, what)
  }

  /** geo:63/86 combined — WKT point within lat/lon bounds (x=lon, y=lat). */
  def isValidLonLatPoint(c: Column): Column = {
    val i = info(c)
    fail(c, i.isNull || i.getField("type") =!= "ST_Point" ||
      !i.getField("x").between(-180d, 180d) || !i.getField("y").between(-90d, 90d),
      "is not a valid lon/lat point")
  }

  // ----------------------------------------------------------------- D16

  /** D16 (geo/check_funcs.py:893) — general geometries: pairwise overlap
    * detection via a grid-bucketed spatial self-join.
    *
    * Scale shape (100 TB-safe): distinct geometries -> explode envelope grid
    * cells (bounded by cellSize) -> equi-join on cell -> candidate pairs
    * deduped to the upper-left shared cell -> exact pairwise intersection test
    * only on candidates -> violating geometry set joined back. No all-pairs
    * comparison anywhere; duplicate WKTs short-circuit via a window count
    * (identical non-empty geometries overlap by definition).
    */
  def arePolygonsMutuallyDisjoint(column: String, rowFilter: Option[String] = None,
                                  cellSize: Double = 4.0): DatasetCheck = {
    import org.apache.spark.sql.expressions.Window
    val id = uniqueSuffix()
    val dupCol = s"__dq_geo_dup_$id"
    val hitCol = s"__dq_geo_hit_$id"
    val filterC = rowFilter.map(expr).getOrElse(lit(true))
    val c = col(column)
    def infoOf(cc: Column) = GraftColumnBridge.column(
      WktInfo(GraftColumnBridge.expression(cc.cast("string"))))
    def cellsOf(cc: Column) = GraftColumnBridge.column(
      WktEnvelopeCells(GraftColumnBridge.expression(cc.cast("string")), cellSize))
    val applyFn = (df: DataFrame) => {
      // duplicates of the same non-empty WKT overlap each other
      val w = Window.partitionBy(c)
      val nonEmpty = !coalesce(infoOf(c).getField("is_empty"), lit(true))
      val withDup = df.withColumn(dupCol,
        sum(when(filterC && nonEmpty, lit(1)).otherwise(lit(0))).over(w) > 1 &&
          filterC && nonEmpty)
      // distinct geometries -> bucketed candidate pairs -> exact test
      val geoms = df.where(filterC && nonEmpty).select(c.as("g")).distinct()
        .withColumn("cells", cellsOf(col("g")))
        .where(col("cells").isNotNull)
      val exploded = geoms.select(col("g"), explode(col("cells")).as("cell"))
      val a = exploded.select(col("g").as("ga"), col("cell"))
      val b = exploded.select(col("g").as("gb"), col("cell"))
      val pairs = a.join(b, Seq("cell")).where(col("ga") < col("gb"))
        // dedupe multi-cell pairs: keep only the smallest shared cell
        .withColumn("mincell", array_min(array_intersect(cellsOf(col("ga")), cellsOf(col("gb")))))
        .where(col("cell") === col("mincell"))
        .where(coalesce(GraftColumnBridge.column(WktPairIntersects(
          GraftColumnBridge.expression(col("ga").cast("string")),
          GraftColumnBridge.expression(col("gb").cast("string")))), lit(false)))
      val violating = pairs.select(col("ga").as("gv"))
        .union(pairs.select(col("gb").as("gv"))).distinct()
        .withColumn(hitCol, lit(true))
      withDup.join(violating, c === col("gv"), "left").drop("gv")
    }
    DatasetCheck(applyFn,
      makeCondition(filterC && (col(dupCol) || coalesce(col(hitCol), lit(false))),
        concat(lit("Geometry '"), valueText(c),
          lit(s"' in column '$column' overlaps another geometry"))))
  }

  /** Point-subset fast path kept for callers that know the column holds only
    * points: coordinate coincidence via one window count (no spatial join).
    */
  def arePointsMutuallyDisjoint(column: String, rowFilter: Option[String] = None): DatasetCheck = {
    import org.apache.spark.sql.expressions.Window
    val id = uniqueSuffix()
    val cntCol = s"__dq_geo_cnt_$id"
    val filterC = rowFilter.map(expr).getOrElse(lit(true))
    val c = col(column)
    val i = info(c)
    val isPt = i.getField("type") === "ST_Point" && !i.getField("is_empty")
    val applyFn = (df: DataFrame) => {
      val w = Window.partitionBy(i.getField("x"), i.getField("y"))
      df.withColumn(cntCol,
        sum(when(filterC && isPt, lit(1)).otherwise(lit(0))).over(w))
    }
    DatasetCheck(applyFn,
      makeCondition(filterC && isPt && col(cntCol) > 1,
        concat(lit("Point '"), valueText(c),
          lit(s"' in column '$column' coincides with "), (col(cntCol) - 1).cast("string"),
          lit(" other geometr(ies)"))))
  }
}
