package graft

import graft.engine.DQRunner
import graft.io.FileChecksStorage
import graft.rules.ChecksSerializer

import java.nio.file.Files

class PatternsSpec extends SparkSpec {
  import spark.implicits._

  test("pattern fan-out discovers tables, loads per-table checks, writes outputs") {
    Seq("pat_sales", "pat_costs", "other_tbl", "pat_sales_checked", "pat_costs_checked")
      .foreach(dropTableFully)
    Seq((1, "a"), (2, null)).toDF("id", "v").write.mode("overwrite").saveAsTable("pat_sales")
    Seq((3, "c")).toDF("id", "v").write.mode("overwrite").saveAsTable("pat_costs")
    Seq((4, "d")).toDF("id", "v").write.mode("overwrite").saveAsTable("other_tbl")
    val checksDir = Files.createTempDirectory("pat_checks").toString
    val checks = Seq(Map("criticality" -> "error",
      "check" -> Map("function" -> "is_not_null", "arguments" -> Map("column" -> "v"))))
    FileChecksStorage.save(checks, s"$checksDir/pat_sales.yml")
    FileChecksStorage.save(checks, s"$checksDir/pat_costs.yml")
    // no checks file for other_tbl -> skipped even if it matched

    val processed = DQRunner.applyChecksAndSaveInTablesForPatterns(
      spark, "pat_%", checksDir, maxParallelism = 2)
    assert(processed.toSet == Set("pat_sales", "pat_costs"))
    assert(spark.table("pat_sales_checked").where("_errors is not null").count() == 1)
    assert(spark.table("pat_costs_checked").count() == 1)
  }

  test("special characters in table names: quoting, detection, fan-out round trip") {
    import graft.io.IO
    // unit surface (reference 0.15.0 "Allow special characters in catalog
    // and schema names", io.py:17: backquoted parts are legal table names)
    assert(IO.isTableLocation("`my-catalog`.`my schema`.tbl"))
    assert(IO.isTableLocation("`dash-db`.tbl"))
    assert(!IO.isTableLocation("/path/to/data"))
    assert(!IO.isTableLocation("my-schema.tbl")) // raw specials need backticks, like the reference
    assert(IO.quoteTableName("a.b.c") == "a.b.c")
    assert(IO.quoteTableName("`my-db`.tbl") == "`my-db`.tbl")
    assert(IO.quotePart("my-tbl") == "`my-tbl`")
    assert(IO.quotePart("a`b") == "`a``b`")
    // ADVICE r11: a backquoted single-part PATH is still a path (the `/`
    // guard); ADVICE r12: the guard applies ONLY to single-part locations —
    // a MULTI-part name may carry '/' inside backquotes, matching the
    // reference TABLE_PATTERN (io.py:17). Doubled interior backticks stay
    // legal table parts.
    assert(!IO.isTableLocation("`/tmp/data`"))
    assert(IO.isTableLocation("`my-cat`.`sub/dir`.tbl"))
    assert(IO.isTableLocation("`we``ird`.tbl"))
    // malformed pass-through (interior unescaped backtick) re-quotes to
    // VALID SQL instead of flowing through unchanged
    assert(IO.quoteTableName("`a``b`.tbl") == "`a``b`.tbl") // well-formed: untouched
    assert(!IO.quoteTableName("`a`b`").contains("`a`b`"))   // malformed: re-quoted
    assert(IO.quoteTableName("`a`b`").count(_ == '`') % 2 == 0)

    // plumbing: a backquoted hyphenated name must reach the CATALOG as a
    // parsed identifier (TABLE_OR_VIEW_NOT_FOUND), not fall through to a
    // path load or die in the parser. Spark's V1 in-memory SessionCatalog
    // rejects special-character names at CREATE (validateName), so the
    // full round trip needs a V2 catalog (Unity on Databricks) — the OSS
    // boundary; reads/writes of such names are exercised to the catalog
    // lookup here.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      IO.readInputData(spark, graft.io.InputConfig("`no-such-schema`.`no-such-tbl`"))
    }
    assert(e.getCondition != null && e.getCondition.contains("NOT_FOUND"),
      s"expected a catalog NOT_FOUND, got: ${e.getCondition}: ${e.getMessage}")
  }

  test("semantic validation flags duplicate names and definitions") {
    val dup = Map("name" -> "r1", "criticality" -> "error",
      "check" -> Map("function" -> "is_not_null", "arguments" -> Map("column" -> "a")))
    val errs = ChecksSerializer.validateChecksSemantics(Seq(dup, dup))
    assert(errs.exists(_.contains("duplicate rule name")))
    assert(errs.exists(_.contains("duplicate check definition")))
    assert(ChecksSerializer.validateChecksSemantics(Seq(dup)).isEmpty)
  }
}
