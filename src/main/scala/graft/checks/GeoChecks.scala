package graft.checks

import graft.core.CheckUtils._
import graft.geo.{WktEnvelopeCells, WktEnvelopeSubCells, WktInfo, WktPairIntersects, WktRelation}
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
                                  cellSize: Double = 4.0,
                                  maxCellGeoms: Int = 256,
                                  maxRefineLevels: Int = 12): DatasetCheck = {
    import org.apache.spark.sql.expressions.Window
    val id = uniqueSuffix()
    val dupCol = s"__dq_geo_dup_$id"
    val hitCol = s"__dq_geo_hit_$id"
    val filterC = rowFilter.map(expr).getOrElse(lit(true))
    val c = col(column)
    def infoOf(cc: Column) = GraftColumnBridge.column(
      WktInfo(GraftColumnBridge.expression(cc.cast("string"))))
    val applyFn = (df: DataFrame) => {
      // duplicates of the same non-empty WKT overlap each other
      val w = Window.partitionBy(c)
      val nonEmpty = !coalesce(infoOf(c).getField("is_empty"), lit(true))
      val withDup = df.withColumn(dupCol,
        sum(when(filterC && nonEmpty, lit(1)).otherwise(lit(0))).over(w) > 1 &&
          filterC && nonEmpty)
      // distinct geometries -> skew-guarded buckets -> candidate pairs -> exact test
      val buckets = disjointCandidateBuckets(
        df.where(filterC && nonEmpty).select(c.cast("string").as("g")),
        cellSize, maxCellGeoms, maxRefineLevels)
      val a = buckets.select(col("g").as("ga"), col("lvl"), col("cell"))
      val b = buckets.select(col("g").as("gb"), col("lvl"), col("cell"))
      // A pair sharing k buckets is exact-tested k times (k is bounded by the
      // envelope's cell span); the violating-geometry distinct below dedupes,
      // which is cheaper than shuffling full candidate-pair rows to dedupe
      // them up front.
      val pairs = a.join(b, Seq("lvl", "cell")).where(col("ga") < col("gb"))
        .where(coalesce(GraftColumnBridge.column(WktPairIntersects(
          GraftColumnBridge.expression(col("ga")),
          GraftColumnBridge.expression(col("gb")))), lit(false)))
      val violating = pairs.select(col("ga").as("gv"))
        .union(pairs.select(col("gb").as("gv"))).distinct()
        .withColumn(hitCol, lit(true))
      withDup.join(violating, c.cast("string") === col("gv"), "left").drop("gv")
    }
    DatasetCheck(applyFn,
      makeCondition(filterC && (col(dupCol) || coalesce(col(hitCol), lit(false))),
        concat(lit("Geometry '"), valueText(c),
          lit(s"' in column '$column' overlaps another geometry"))))
  }

  /** Quadtree-refined blocking buckets for the D16 spatial self-join: distinct
    * geometries explode into envelope grid cells, and any cell holding more
    * than `maxCellGeoms` geometries is recursively subdivided into half-size
    * cells (up to `maxRefineLevels`), so the in-cell self-join can never go
    * quadratic on dense real-world clusters (the same bounded-bucket rule as
    * `maxBucketSize` in the LSH dedup family). Returns `(g, lvl, cell)`.
    *
    * Any pair of envelope-intersecting geometries shares >=1 bucket: for a
    * point p in both envelopes, both cells arrays contain p's cell at every
    * level, and the refine-or-stop decision is per cell, so both stop in the
    * same (lvl, cell). Refinement levels trigger only on observed density;
    * sparse data takes the original one-explode plan plus one count job.
    */
  private[graft] def disjointCandidateBuckets(geomRows: DataFrame, cellSize: Double,
                                              maxCellGeoms: Int,
                                              maxRefineLevels: Int): DataFrame = {
    val geoms = geomRows.distinct()
      .withColumn("cells", GraftColumnBridge.column(
        WktEnvelopeCells(GraftColumnBridge.expression(col("g")), cellSize)))
      .where(col("cells").isNotNull)
    var exploded = geoms.select(col("g"), explode(col("cells")).as("cell"))
    var size = cellSize
    var lvl = 0
    val parts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var done = false
    while (!done) {
      if (lvl >= maxRefineLevels) {
        // depth cap: accept residual dense cells rather than refine forever
        // (e.g. maxCellGeoms+ geometries sharing one tiny envelope)
        parts += exploded.withColumn("lvl", lit(lvl)); done = true
      } else {
        val dense = exploded.groupBy("cell").count()
          .where(col("count") > maxCellGeoms).select("cell")
        if (dense.isEmpty) {
          parts += exploded.withColumn("lvl", lit(lvl)); done = true
        } else {
          // materialize once so the three consumers below don't re-derive the
          // whole refinement chain (the Dedup connected-components shape)
          val mat = exploded.localCheckpoint(true)
          val matDense = mat.groupBy("cell").count()
            .where(col("count") > maxCellGeoms)
            .select(col("cell"), lit(true).as("__dense"))
          val marked = mat.join(matDense, Seq("cell"), "left")
          parts += marked.where(col("__dense").isNull).drop("__dense")
            .withColumn("lvl", lit(lvl))
          exploded = marked.where(col("__dense") === true)
            .select(col("g"), explode(GraftColumnBridge.column(WktEnvelopeSubCells(
              GraftColumnBridge.expression(col("g")),
              GraftColumnBridge.expression(col("cell")), size))).as("cell"))
          size /= 2
          lvl += 1
        }
      }
    }
    parts.reduce(_ unionByName _)
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
