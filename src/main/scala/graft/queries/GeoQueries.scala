package graft.queries

import graft.checks.{GeoChecks => G}
import graft.queries.QueryDefs._
import org.apache.spark.sql.functions._

/** Driver-contract queries for the WKT geo family (SURVEY §2.1 #42-51, D16).
  * WKT values are derived deterministically from customer keys so the DuckDB
  * oracle can replicate the geometry semantics with plain arithmetic.
  */
object GeoQueries {

  val all: Seq[(String, QueryDef)] = Seq(

    "row_geo_is_geometry" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("wkt", when(col("c_custkey") % 17 === 0,
              format_string("NOTWKT(%d)", col("c_custkey")))
            .otherwise(format_string("POINT (%d %d)", col("c_custkey") % 90, col("c_custkey") % 45)))
        failing(df, row(G.isGeometry(col("wkt")), "is_geometry", "wkt"), Seq("c_custkey"))
      },
      Some("SELECT c_custkey FROM customer WHERE c_custkey % 17 = 0 ORDER BY 1")),

    "row_geo_is_geography" -> QueryDef(
      (s, dir) => {
        // x = c_custkey % 250 - 50 strays past 180 every so often
        val x = col("c_custkey") % 250 - 50
        val df = t(s, dir, "customer")
          .withColumn("wkt", format_string("POINT (%d %d)", x, col("c_custkey") % 45))
        failing(df, row(G.isGeography(col("wkt")), "is_geography", "wkt"), Seq("c_custkey"))
      },
      Some("SELECT c_custkey FROM customer WHERE c_custkey % 250 - 50 > 180 ORDER BY 1")),

    "row_geo_is_non_empty_geometry" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("wkt", when(col("c_custkey") % 31 === 0, lit("POLYGON EMPTY"))
            .otherwise(lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")))
        failing(df, row(G.isNonEmptyGeometry(col("wkt")), "is_non_empty_geometry", "wkt"),
          Seq("c_custkey"))
      },
      Some("SELECT c_custkey FROM customer WHERE c_custkey % 31 = 0 ORDER BY 1")),

    "row_geo_is_polygon" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("wkt", when(col("c_custkey") % 20 === 0, lit("LINESTRING (0 0, 2 2)"))
            .otherwise(lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")))
        failing(df, row(G.isPolygon(col("wkt")), "is_polygon", "wkt"), Seq("c_custkey"))
      },
      Some("SELECT c_custkey FROM customer WHERE c_custkey % 20 = 0 ORDER BY 1")),

    "row_geo_is_ogc_valid" -> QueryDef(
      (s, dir) => {
        // bowtie (self-intersecting ring) every 25th row
        val df = t(s, dir, "customer")
          .withColumn("wkt", when(col("c_custkey") % 25 === 0, lit("POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"))
            .otherwise(lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")))
        failing(df, row(G.isOgcValid(col("wkt")), "is_ogc_valid", "wkt"), Seq("c_custkey"))
      },
      Some("SELECT c_custkey FROM customer WHERE c_custkey % 25 = 0 ORDER BY 1")),

    "row_geo_has_dimension" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("wkt", when(col("c_custkey") % 10 === 0,
              format_string("POINT (%d %d)", col("c_custkey") % 90, col("c_custkey") % 45))
            .otherwise(lit("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))")))
        failing(df, row(G.hasDimension(col("wkt"), 2), "has_dimension", "wkt"), Seq("c_custkey"))
      },
      Some("SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0 ORDER BY 1")),

    "row_geo_area_not_greater_than" -> QueryDef(
      (s, dir) => {
        // square of side (c_custkey % 10): shoelace area = side^2, exact ints
        val side = col("c_custkey") % 10
        val df = t(s, dir, "customer")
          .withColumn("wkt", format_string("POLYGON ((0 0, %d 0, %d %d, 0 %d, 0 0))",
            side, side, side, side))
        failing(df, row(G.isAreaNotGreaterThan(col("wkt"), 25.0), "is_area_not_greater_than", "wkt"),
          Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE (c_custkey % 10) * (c_custkey % 10) > 25 ORDER BY 1""".stripMargin)),

    "row_geo_num_points_not_less_than" -> QueryDef(
      (s, dir) => {
        // triangle ring (4 vertices incl. closure) every 9th row, else square (5)
        val df = t(s, dir, "customer")
          .withColumn("wkt", when(col("c_custkey") % 9 === 0, lit("POLYGON ((0 0, 4 0, 4 4, 0 0))"))
            .otherwise(lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")))
        failing(df, row(G.isNumPointsNotLessThan(col("wkt"), 5), "is_num_points_not_less_than", "wkt"),
          Seq("c_custkey"))
      },
      Some("SELECT c_custkey FROM customer WHERE c_custkey % 9 = 0 ORDER BY 1")),

    "row_geo_covers" -> QueryDef(
      (s, dir) => {
        // side-2 square anchored at x = c_custkey % 60; reference covers x in [10, 40]
        val x = col("c_custkey") % 60
        val df = t(s, dir, "customer")
          .withColumn("wkt", format_string("POLYGON ((%d 0, %d 0, %d 2, %d 2, %d 0))",
            x, x + 2, x + 2, x, x))
        failing(df, row(G.isGeoCovers(col("wkt"), "POLYGON ((10 -1, 40 -1, 40 3, 10 3, 10 -1))"),
          "is_geo_covers", "wkt"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT (c_custkey % 60 >= 10 AND c_custkey % 60 + 2 <= 40) ORDER BY 1""".stripMargin)),

    "ds_polygons_mutually_disjoint" -> QueryDef(
      (s, dir) => {
        // side-5 squares on a sparse lattice; steps of 3 => overlap iff both
        // lattice residues differ by <= 1 (|dx| in {0,3} <= 5)
        val x = col("c_custkey") * 7 % 97 * 3
        val y = col("c_custkey") * 13 % 89 * 3
        val df = t(s, dir, "customer")
          .withColumn("wkt", format_string("POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
            x, y, x + 5, y, x + 5, y + 5, x, y + 5, x, y))
        failing(df, ds(G.arePolygonsMutuallyDisjoint("wkt", cellSize = 8.0),
          "are_polygons_mutually_disjoint", "wkt"), Seq("c_custkey"))
      },
      Some("""WITH d AS (SELECT c_custkey, (c_custkey*7 % 97)*3 AS x, (c_custkey*13 % 89)*3 AS y FROM customer)
             |SELECT a.c_custkey FROM d a WHERE EXISTS (
             |  SELECT 1 FROM d b WHERE b.c_custkey <> a.c_custkey
             |  AND abs(a.x - b.x) <= 5 AND abs(a.y - b.y) <= 5)
             |ORDER BY 1""".stripMargin))
  )
}
