package graft

import graft.engine.DQEngine
import graft.rules.ChecksSerializer
import org.apache.spark.sql.functions._

/** Conformance: the all_checks.yaml corpus (every registered check function,
  * row + dataset, incl for_each_column) deserializes, validates, and applies
  * in one engine pass over a literal frame designed so every check PASSES —
  * asserting the full metadata surface is wired and none of the checks
  * misfires on clean data.
  */
class ConformanceSpec extends SparkSpec {
  import spark.implicits._

  test("all_checks.yaml: every registered check applies cleanly end-to-end") {
    val yaml = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/all_checks.yaml")).mkString
    val checks = ChecksSerializer.parseYaml(yaml)
    assert(ChecksSerializer.validateChecks(checks).isEmpty)

    val df = Seq(1, 2, 3).toDF("id")
      .withColumn("name", concat(lit("row"), col("id")))
      .withColumn("always_null", lit(null).cast("string"))
      .withColumn("empty_str", lit(""))
      .withColumn("upper_str", lit("HELLO"))
      .withColumn("flag", when(col("id") % 2 === 0, "A").otherwise("B"))
      .withColumn("amount", col("id") * 10)
      .withColumn("one", lit(1))
      .withColumn("d1", lit("2020-01-01").cast("date"))
      .withColumn("d2", lit("2024-06-01").cast("date"))
      .withColumn("ts", lit("2024-01-01 10:00:00").cast("timestamp"))
      .withColumn("arr", array(lit("x")))
      .withColumn("date_str", lit("2024-01-02"))
      .withColumn("ts_str", lit("2024-01-02 03:04:05"))
      .withColumn("ip4", lit("10.1.2.3"))
      .withColumn("ip6", lit("2001:db8::1"))
      .withColumn("email", lit("user@example.com"))
      .withColumn("ssn", lit("123-45-6789"))
      .withColumn("country", lit("US"))
      .withColumn("currency", lit("USD"))
      .withColumn("subdiv", lit("US-CA"))
      .withColumn("langc", lit("en"))
      .withColumn("js", lit("""{"k": 1}"""))
      .withColumn("lat", lit(45.0))
      .withColumn("lon", lit(-120.0))
      .withColumn("wkt", lit("POINT (10 20)"))
      .withColumn("poly", format_string("POLYGON ((%d 0, %d 0, %d 5, %d 5, %d 0))",
        col("id") * 20, col("id") * 20 + 5, col("id") * 20 + 5, col("id") * 20, col("id") * 20))
      .withColumn("line", lit("LINESTRING (0 0, 1 1)"))
      .withColumn("mpoint", lit("MULTIPOINT ((1 1), (2 2))"))
      .withColumn("mline", lit("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"))
      .withColumn("mpoly", lit("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"))
      .withColumn("gcol", lit("GEOMETRYCOLLECTION (POINT (1 1))"))
      .withColumn("numcc", lit("840"))
      .withColumn("es_id", lit("12345678Z"))
      .withColumn("fr_sub", lit("FR-13"))
      // r9 sweep columns (reference all_row_checks.yaml argument coverage)
      .withColumn("stct", struct(lit(1).as("field1")))
      .withColumn("mp", map(lit("key1"), lit(7)))
      .withColumn("num_arr", array(lit(2), lit(3)))
      .withColumn("js2", lit("""{"a": 1, "b": 2}"""))
      .withColumn("lang3", lit("eng"))
      .withColumn("curnum", lit("840"))
      .withColumn("c3", lit("USA"))

    val ref = Seq("A", "B").toDF("rflag")
    val ref2 = Seq(1, 2, 3).toDF("rid")
      .withColumn("name", concat(lit("row"), col("rid"))) // matching-name col for compare

    val out = DQEngine.applyChecksByMetadata(df, checks, refDfs = Map("ref" -> ref, "ref2" -> ref2))
    val errRows = out.where(col("_errors").isNotNull)
    val warnRows = out.where(col("_warnings").isNotNull)
    if (errRows.count() > 0) {
      errRows.select(explode(col("_errors"))).select("col.name", "col.message")
        .collect().foreach(r => info(s"unexpected error: ${r.getString(0)} -> ${r.getString(1)}"))
    }
    assert(errRows.count() == 0, "clean data must produce no errors")
    assert(warnRows.count() == 0, "clean data must produce no warnings")
    assert(out.count() == 3)
  }
}
