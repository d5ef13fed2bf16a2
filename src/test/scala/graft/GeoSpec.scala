package graft

import graft.checks.GeoChecks
import graft.engine.DQEngine
import graft.geo._
import graft.rules._
import org.apache.spark.sql.functions._

/** WKT parser + computational geometry + geo check family (§2.1 #42-51, D16). */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ parser

  test("parses all seven WKT types and EMPTY forms") {
    assert(Wkt.parse("POINT (3 4)").get.typeName == "ST_Point")
    assert(Wkt.parse("POINT EMPTY").get.isEmpty)
    assert(Wkt.parse("LINESTRING (0 0, 1 1, 2 0)").get.numPoints == 3)
    assert(Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))").get.typeName == "ST_Polygon")
    assert(Wkt.parse("MULTIPOINT ((1 1), (2 2))").get.numPoints == 2)
    assert(Wkt.parse("MULTIPOINT (1 1, 2 2)").get.numPoints == 2) // unparenthesized form
    assert(Wkt.parse("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))").get.dimension == 1)
    assert(Wkt.parse("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))").get.dimension == 2)
    assert(Wkt.parse("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))").get.typeName == "ST_GeometryCollection")
    assert(Wkt.parse("GEOMETRYCOLLECTION EMPTY").get.isEmpty)
    assert(Wkt.parse("  point ( 1.5e1   -2.25 ) ").get.asInstanceOf[GPoint].p.get == Pt(15.0, -2.25))
    Seq("POINT (1)", "POINT (a b)", "POLYGON (0 0, 1 1)", "LINESTRING ((0 0))",
      "POINT (1 2) x", "TRIANGLE (0 0, 1 1, 2 0)", "POINT (1 2", "").foreach { bad =>
      assert(Wkt.parse(bad).isEmpty, s"should reject '$bad'")
    }
  }

  test("area, dimension, num_points, envelope") {
    val sqWithHole = Wkt.parse(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))").get
    assert(sqWithHole.area == 100.0 - 4.0)
    assert(sqWithHole.numPoints == 10)
    assert(sqWithHole.dimension == 2)
    assert(sqWithHole.envelope.contains((0.0, 0.0, 10.0, 10.0)))
    val coll = Wkt.parse("GEOMETRYCOLLECTION (POINT (1 1), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))").get
    assert(coll.dimension == 2 && coll.area == 4.0)
  }

  test("OGC validity: bowtie and unclosed rings invalid, square valid") {
    assert(GeomOps.ogcValid(Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))").get))
    assert(!GeomOps.ogcValid(Wkt.parse("POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))").get)) // bowtie
    assert(!GeomOps.ogcValid(Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4))").get)) // unclosed
    assert(!GeomOps.ogcValid(Wkt.parse("POLYGON ((0 0, 4 0, 0 0, 4 0, 0 0))").get)) // zero area
    // hole outside the shell
    assert(!GeomOps.ogcValid(Wkt.parse(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (10 10, 11 10, 11 11, 10 10))").get))
    assert(GeomOps.ogcValid(Wkt.parse("LINESTRING (0 0, 1 1)").get))
  }

  // ------------------------------------------------------------- relations

  private def g(w: String): Geom = Wkt.parse(w).get

  test("intersects / contains / covers / touches / within") {
    val square = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val inner = g("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    val overlapping = g("POLYGON ((8 8, 12 8, 12 12, 8 12, 8 8))")
    val disjoint = g("POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))")
    val adjacent = g("POLYGON ((10 0, 14 0, 14 4, 10 4, 10 0))") // shares edge x=10
    assert(GeomOps.intersects(square, inner))
    assert(GeomOps.intersects(square, overlapping))
    assert(!GeomOps.intersects(square, disjoint))
    assert(GeomOps.intersects(square, adjacent)) // boundary contact intersects
    assert(GeomOps.contains(square, inner))
    assert(!GeomOps.contains(square, overlapping))
    assert(GeomOps.covers(square, inner))
    assert(GeomOps.touches(square, adjacent))
    assert(!GeomOps.touches(square, overlapping)) // interiors overlap
    assert(!GeomOps.touches(square, inner))
    assert(GeomOps.relate("WITHIN", inner, square)) // inner within square
    // boundary point: covered but not contained
    val onEdge = g("POINT (10 5)")
    val interior = g("POINT (5 5)")
    assert(GeomOps.covers(square, onEdge) && !GeomOps.contains(square, onEdge))
    assert(GeomOps.contains(square, interior))
    assert(GeomOps.touches(square, onEdge))
    // point/line relations
    val line = g("LINESTRING (0 0, 10 10)")
    assert(GeomOps.intersects(line, g("POINT (5 5)")))
    assert(GeomOps.intersects(line, g("LINESTRING (0 10, 10 0)")))
    assert(!GeomOps.intersects(line, g("LINESTRING (20 20, 30 30)")))
    // line with endpoints on the boundary but interior inside: contained
    assert(GeomOps.contains(square, line))
    assert(GeomOps.covers(square, line))
  }

  // ---------------------------------------------------- checks via the engine

  private def errs(df: org.apache.spark.sql.DataFrame, rule: DQRule): Seq[Int] =
    DQEngine.applyChecks(df, Seq(rule))
      .where(col("_errors").isNotNull).select("id").as[Int].collect().toSeq.sorted

  test("type/property/relation checks through the engine") {
    val df = Seq(
      (1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"), // valid square area 16
      (2, "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"), // bowtie (invalid)
      (3, "LINESTRING (0 0, 1 1)"),
      (4, "not wkt"),
      (5, "POLYGON ((100 100, 101 100, 101 101, 100 101, 100 100))") // area 1, far away
    ).toDF("id", "wkt")
    assert(errs(df, DQRowRule(GeoChecks.isGeometry(col("wkt")), "is_geometry", Seq("wkt"))) == Seq(4))
    // type probes: unparseable passes (NULL semantics)
    assert(errs(df, DQRowRule(GeoChecks.isPolygon(col("wkt")), "is_polygon", Seq("wkt"))) == Seq(3))
    assert(errs(df, DQRowRule(GeoChecks.isOgcValid(col("wkt")), "is_ogc_valid", Seq("wkt"))) == Seq(2))
    assert(errs(df, DQRowRule(GeoChecks.hasDimension(col("wkt"), 2), "has_dimension", Seq("wkt"))) == Seq(3))
    assert(errs(df, DQRowRule(GeoChecks.isAreaNotGreaterThan(col("wkt"), 10.0), "is_area_not_greater_than", Seq("wkt"))) == Seq(1))
    assert(errs(df, DQRowRule(GeoChecks.isNumPointsNotLessThan(col("wkt"), 3), "is_num_points_not_less_than", Seq("wkt"))) == Seq(3))
    // relation vs literal reference: which rows are NOT covered by the big square
    val refSquare = "POLYGON ((-1 -1, 50 -1, 50 50, -1 50, -1 -1))"
    assert(errs(df, DQRowRule(GeoChecks.isGeoCovers(col("wkt"), refSquare), "is_geo_covers", Seq("wkt"))) == Seq(5))
    assert(errs(df, DQRowRule(GeoChecks.isGeoIntersects(col("wkt"), "POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))"),
      "is_geo_intersects", Seq("wkt"))) == Seq(3, 5)) // 1,2 intersect it; 3 (short line) and 5 do not; 4 unparseable passes
  }

  test("approximate relations: envelope-grid cell covers (H3-analog)") {
    val df = Seq(
      (1, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"),     // inside ref
      (2, "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))"), // far away
      (3, "POINT (5 5)"),                              // inside ref
      (4, "not wkt")                                   // unparseable passes
    ).toDF("id", "wkt")
    val ref = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert(errs(df, DQRowRule(GeoChecks.isGeoCoversApprox(col("wkt"), ref, cellSize = 1.0),
      "is_geo_covers", Seq("wkt"))) == Seq(2))
    assert(errs(df, DQRowRule(GeoChecks.isGeoIntersectsApprox(col("wkt"), ref, cellSize = 1.0),
      "is_geo_intersects", Seq("wkt"))) == Seq(2))
    // metadata path: approximate flag + cell_size
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_geo_intersects", "arguments" -> Map(
        "column" -> "wkt", "reference_geometry" -> ref,
        "approximate" -> true, "cell_size" -> 1.0)))))
    assert(out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("metadata path resolves the new geo functions") {
    val df = Seq((1, "POINT (1 2)"), (2, "LINESTRING (0 0, 1 1)")).toDF("id", "wkt")
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_linestring", "arguments" -> Map("column" -> "wkt")))))
    assert(out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSeq == Seq(1))
  }

  // ----------------------------------------------------------------- D16

  test("are_polygons_mutually_disjoint: bucketed join matches brute force") {
    // squares on a diagonal: consecutive ones overlap when step < side
    val wkts = (0 until 40).map { k =>
      val step = if (k % 2 == 0) 3 else 13 // even ones overlap their successor
      val x = k * step
      (k, s"POLYGON (($x $x, ${x + 5} $x, ${x + 5} ${x + 5}, $x ${x + 5}, $x $x))")
    } :+ (100, "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))") // duplicate of k=0
    val df = wkts.toDF("id", "wkt")
    val flagged = errs(df, DQDatasetRule(
      GeoChecks.arePolygonsMutuallyDisjoint("wkt", cellSize = 4.0),
      "are_polygons_mutually_disjoint", Seq("wkt")))
    // brute force oracle
    val geoms = wkts.map { case (k, w) => (k, Wkt.parse(w).get) }
    val expected = geoms.collect { case (k, ga) if geoms.exists { case (j, gb) =>
      (j != k || wkts.count(_._2 == wkts.find(_._1 == k).get._2) > 1) &&
        (j != k) && GeomOps.intersects(ga, gb) } => k }
    val dups = wkts.groupBy(_._2).filter(_._2.size > 1).values.flatten.map(_._1)
    val oracle = (expected ++ dups).distinct.sorted
    assert(flagged == oracle, s"flagged=$flagged oracle=$oracle")
  }

  test("are_polygons_mutually_disjoint: dense co-located clusters refine, stay correct") {
    // 1156 tiny disjoint squares tiled inside ONE level-0 grid cell (a dense
    // urban cluster): without the quadtree guard the in-cell self-join would
    // generate ~667k candidate pairs. Two overlapping intruders are planted.
    val n = 34
    val squares = (0 until n * n).map { k =>
      val x = (k % n) * 0.1; val y = (k / n) * 0.1
      (k, f"POLYGON (($x%.2f $y%.2f, ${x + 0.06}%.2f $y%.2f, " +
        f"${x + 0.06}%.2f ${y + 0.06}%.2f, $x%.2f ${y + 0.06}%.2f, $x%.2f $y%.2f))")
    }
    val intruders = Seq(
      (5000, "POLYGON ((0.01 0.01, 0.05 0.01, 0.05 0.05, 0.01 0.05, 0.01 0.01))"), // inside square 0
      (5001, "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")) // alone, outside tiling
    val df = (squares ++ intruders).toDF("id", "wkt")
    val flagged = errs(df, DQDatasetRule(
      GeoChecks.arePolygonsMutuallyDisjoint("wkt", cellSize = 4.0, maxCellGeoms = 64),
      "are_polygons_mutually_disjoint", Seq("wkt")))
    assert(flagged == Seq(0, 5000), s"flagged=$flagged")
    // the refinement bound holds: no bucket exceeds the cap
    val buckets = GeoChecks.disjointCandidateBuckets(
      df.select(col("wkt").as("g")), cellSize = 4.0, maxCellGeoms = 64, maxRefineLevels = 12)
    val worst = buckets.groupBy("lvl", "cell").count()
      .agg(max("count")).as[Long].head()
    assert(worst <= 64, s"worst bucket holds $worst geometries")
    // candidate pair work is bounded (vs ~667k unguarded)
    val candPairs = buckets.groupBy("lvl", "cell").count()
      .agg(sum(col("count") * (col("count") - 1)).cast("long") / 2)
      .first().getDouble(0).toLong
    assert(candPairs < 100000, s"candidate pairs $candPairs")
  }

  test("are_polygons_mutually_disjoint: depth cap accepts residual dense cells") {
    // 5 distinct polygons sharing one tiny envelope can never spread across
    // subcells; the loop must stop at maxRefineLevels and still be correct.
    val df = (0 until 5).map { k =>
      (k, s"POLYGON ((0 0, 0.001 0, 0.001 0.00${k + 1}, 0 0.00${k + 1}, 0 0))")
    }.toDF("id", "wkt")
    val flagged = errs(df, DQDatasetRule(
      GeoChecks.arePolygonsMutuallyDisjoint("wkt", maxCellGeoms = 2, maxRefineLevels = 3),
      "are_polygons_mutually_disjoint", Seq("wkt")))
    assert(flagged == Seq(0, 1, 2, 3, 4))
  }

  test("are_polygons_mutually_disjoint handles mixed geometry and skips empties") {
    val df = Seq(
      (1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      (2, "POINT (2 2)"), // inside polygon 1
      (3, "POINT (50 50)"), // alone
      (4, "POLYGON EMPTY"),
      (5, "POLYGON EMPTY") // empties never overlap
    ).toDF("id", "wkt")
    val flagged = errs(df, DQDatasetRule(
      GeoChecks.arePolygonsMutuallyDisjoint("wkt"), "are_polygons_mutually_disjoint", Seq("wkt")))
    assert(flagged == Seq(1, 2))
  }
}
