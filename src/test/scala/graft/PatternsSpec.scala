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

  test("semantic validation flags duplicate names and definitions") {
    val dup = Map("name" -> "r1", "criticality" -> "error",
      "check" -> Map("function" -> "is_not_null", "arguments" -> Map("column" -> "a")))
    val errs = ChecksSerializer.validateChecksSemantics(Seq(dup, dup))
    assert(errs.exists(_.contains("duplicate rule name")))
    assert(errs.exists(_.contains("duplicate check definition")))
    assert(ChecksSerializer.validateChecksSemantics(Seq(dup)).isEmpty)
  }
}
