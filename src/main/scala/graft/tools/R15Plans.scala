package graft.tools

import graft.BenchRef
import graft.checks.{NetChecks, RowChecks}
import graft.engine.DQEngine
import graft.pipeline.TextAnalysis
import graft.rules.DQRowRule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes `plans/r15/<name>_{before,after}.txt`: `explain("formatted")` of
  * every computation this round touched, with each BEFORE variant
  * reconstructed inline from the pre-change formulation (original code in
  * git history at bab50f8), so both plans come from the same Spark session
  * and fixture. The all_row_checks pair additionally records the
  * whole-stage-codegen method size that motivated the hugeMethodLimit
  * fallback (explain output cannot show it).
  *
  * Run: sbt "runMain graft.tools.R15Plans"
  */
object R15Plans {
  private def explainStr(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString("UTF-8")
  }

  private def codegenNote(df: DataFrame): String = {
    df.collect() // materialize AQE final stages so codegen subtrees exist
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    code.split("\n").filter(l => l.contains("maxMethodCodeSize") || l.startsWith("Found"))
      .mkString("\n")
  }

  private def write(name: String, header: String, body: String): Unit = {
    val p = java.nio.file.Paths.get("plans/r15", s"$name.txt")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (header + "\n\n" + body)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $p")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def session(hugeLimit: Int): SparkSession = {
      val existing = SparkSession.getActiveSession
      existing.foreach(_.stop())
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.codegen.hugeMethodLimit", hugeLimit.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }

    // ---- ref10m_all_row_checks: BEFORE (r14 formulations + default limit) --
    val sparkBefore = session(65535)
    sparkBefore.sparkContext.setLogLevel("ERROR")
    locally {
      val df = BenchRef.generatedDf(sparkBefore, 100000L)
      // full 24-rule suite with the r14 regex ipv4 rule swapped back in
      // (the WKT change is inside GeoOps — plan-identical either way)
      val suiteBefore = DQEngine.applyChecks(df, rulesOfSuiteWithRegexIpv4(df))
      val agg = suiteBefore.select(sum(when(col("_errors").isNotNull ||
        col("_warnings").isNotNull, 1L).otherwise(0L)).as("n"))
      write("ref10m_all_row_checks_before",
        "== ref10m_all_row_checks BEFORE (r14 code: rlike ipv4 rule; default hugeMethodLimit=65535) ==\n" +
          "The 24-rule fused result projection whole-stage-compiles into a method ABOVE\n" +
          "HotSpot's 8000-byte JIT ceiling (-XX:HugeMethodLimit) — it executes as\n" +
          "INTERPRETED bytecode. Codegen stats of the executed aggregation:\n" +
          codegenNote(agg) +
          "\nMeasured (10M rows, interleaved probe medians): suite 18.38 s; is_valid_ipv4 cell 1.05 s.",
        explainStr(agg))
    }

    // ---- AFTER: kernels + hugeMethodLimit=8000 ----------------------------
    val sparkAfter = session(8000)
    sparkAfter.sparkContext.setLogLevel("ERROR")
    locally {
      val df = BenchRef.generatedDf(sparkAfter, 100000L)
      val suiteAfter = BenchRef.allRowChecks(df)
      val agg = suiteAfter.select(sum(when(col("_errors").isNotNull ||
        col("_warnings").isNotNull, 1L).otherwise(0L)).as("n"))
      write("ref10m_all_row_checks_after",
        "== ref10m_all_row_checks AFTER (Ipv4Valid byte-scan kernel; hugeMethodLimit=8000) ==\n" +
          "ipv4valid(...) replaces RLIKE in the condition projection. The codegen stats\n" +
          "below still show the oversized subtree — the hugeMethodLimit fallback is a\n" +
          "RUNTIME decision inside WholeStageCodegenExec.doExecute (it compiles, sees\n" +
          "maxMethodCodeSize > 8000, logs 'Found too long generated codes' and executes\n" +
          "child.execute() instead), so the plan/debugCodegen shape is unchanged while\n" +
          "execution uses the operators' own split, JIT-able UnsafeProjections.\n" +
          "Codegen stats of the executed aggregation (11664 > 8000 = the trigger):\n" +
          codegenNote(agg) +
          "\nMeasured: suite 18.38 -> 7.22 s; is_valid_ipv4 cell 1.05 -> 0.34 s;\n" +
          "geo cells 1.62/1.68 -> 0.82/0.92 s (WktInfo envelope/type-name/point fast path).",
        explainStr(agg))

      // ---- pipe_text_c4: BEFORE = per-line lambda formulation -------------
      val docs = graft.queries.QueryDefs.t(sparkAfter, sfDir, "documents").limit(500)
      def lineKept(l: org.apache.spark.sql.Column) =
        l.rlike("[.!?][\"'”’)]*\\s*$") &&
          size(split(trim(l), "\\s+")) >= 3 &&
          !lower(l).contains("javascript")
      val t0 = coalesce(col("text"), lit(""))
      val lines = split(t0, "\n")
      val kept = filter(lines, lineKept(_))
      val cleaned = array_join(kept, "\n")
      val sigBefore = struct(
        size(lines).as("n_lines"),
        size(kept).as("n_kept_lines"),
        size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0))).as("n_sentences"),
        lower(t0).contains("lorem ipsum").as("has_lorem_ipsum"),
        t0.contains("{").as("has_curly_brace"),
        exists(lines, l => lower(l).contains("javascript")).as("has_javascript_line"))
      write("pipe_text_c4_before",
        "== pipe_text_c4 BEFORE (bab50f8 formulation, reconstructed inline) ==\n" +
          "Per-line lambdas: filter(lines, kept) + exists(lines, ...) — interpreted\n" +
          "HOFs re-walking the line array once per signal; the Project is OUTSIDE\n" +
          "whole-stage codegen. 1M-doc KernelBench c4_scan (r14 worktree): 0.46 s.",
        explainStr(docs.select(col("doc_id"), sigBefore.as("sig"))))
      write("pipe_text_c4_after",
        "== pipe_text_c4 AFTER (one-pass C4Stats kernel) ==\n" +
          "c4stats(coalesce(text, )) computed once; all signals are field reads of the\n" +
          "single kernel eval (CSE), inside whole-stage codegen (* Project).\n" +
          "1M-doc KernelBench c4_scan: 0.46 -> 0.17 s (2.7x).",
        explainStr(docs.select(col("doc_id"),
          TextAnalysis.c4Signals(col("text")).as("sig"))))

      // ---- row_is_valid_ipv4_address: the kernel swap in isolation --------
      val events = graft.queries.QueryDefs.t(sparkAfter, sfDir, "events").limit(1000)
        .withColumn("ip", format_string("10.%d.0.%d", col("user_id") % 256, col("event_id") % 256))
      val beforeRule = {
        val c = col("ip")
        when(c.isNotNull && !c.cast("string").rlike(RowChecks.Ipv4Regex), lit("bad"))
      }
      write("row_is_valid_ipv4_address_before",
        "== row_is_valid_ipv4_address BEFORE (rlike(Ipv4Regex)) ==",
        explainStr(events.select(col("event_id"), beforeRule.as("err"))))
      write("row_is_valid_ipv4_address_after",
        "== row_is_valid_ipv4_address AFTER (Ipv4Valid byte-scan kernel) ==",
        explainStr(events.select(col("event_id"),
          RowChecks.isValidIpv4Address(col("ip")).as("err"))))
    }
    sparkAfter.stop()
  }

  /** The 24-rule BenchRef suite with the ipv4 rule swapped back to the r14
    * regex formulation (everything else identical to HEAD's builder).
    */
  private def rulesOfSuiteWithRegexIpv4(df: DataFrame): Seq[graft.rules.DQRule] = {
    val R = RowChecks
    val ipv4Before = {
      val c = col("col_ipv4")
      when(c.isNotNull && !c.cast("string").rlike(RowChecks.Ipv4Regex),
        concat(lit("Value '"), coalesce(c.cast("string"), lit("null")),
          lit(s"' in column '${c.toString}' is not a valid IPv4 address")))
        .otherwise(lit(null).cast("string"))
    }
    Seq(
      DQRowRule(R.isNotNull(col("col1")), "is_not_null", Seq("col1")),
      DQRowRule(R.isNotNullAndNotEmpty(col("col2")), "is_not_null_and_not_empty", Seq("col2")),
      DQRowRule(R.isNotEmpty(col("col2")), "is_not_empty", Seq("col2")),
      DQRowRule(R.isInList(col("col3"), (0 until 97).map(_.asInstanceOf[Any])), "is_in_list", Seq("col3")),
      DQRowRule(R.isNotInList(col("col3"), Seq(1000)), "is_not_in_list", Seq("col3")),
      DQRowRule(R.isInRange(col("col2"), 0, 4000000), "is_in_range", Seq("col2")),
      DQRowRule(R.isNotInRange(col("col2"), -10, -1), "is_not_in_range", Seq("col2")),
      DQRowRule(R.isNotLessThan(col("col2"), 0), "is_not_less_than", Seq("col2")),
      DQRowRule(R.isNotGreaterThan(col("col2"), 4000000), "is_not_greater_than", Seq("col2")),
      DQRowRule(R.isEqualTo(col("col3"), col("col3").as("col3_self")), "is_equal_to", Seq("col3")),
      DQRowRule(R.sqlExpression("col2 >= 0"), "sql_expression"),
      DQRowRule(R.isOlderThanNDays(col("col5"), 0, Some(lit("2026-01-01").cast("date"))), "is_older_than_n_days", Seq("col5")),
      DQRowRule(R.isNotInFuture(col("col6"), 0, Some(lit("2026-01-01 00:00:00").cast("timestamp"))), "is_not_in_future", Seq("col6")),
      DQRowRule(R.isNotNullAndNotEmptyArray(col("col4")), "is_not_null_and_not_empty_array", Seq("col4")),
      DQRowRule(R.isValidDate(col("col5").cast("string")), "is_valid_date", Seq("col5")),
      DQRowRule(R.isValidTimestamp(col("col6").cast("string")), "is_valid_timestamp", Seq("col6")),
      DQRowRule(ipv4Before, "is_valid_ipv4_address", Seq("col_ipv4")),
      DQRowRule(NetChecks.isValidIpv6Address(col("col_ipv6")), "is_valid_ipv6_address", Seq("col_ipv6")),
      DQRowRule(NetChecks.isIpv4AddressInCidr(col("col_ipv4"), "10.0.0.0/8"), "is_ipv4_address_in_cidr", Seq("col_ipv4")),
      DQRowRule(R.isValidJson(col("col_json_str")), "is_valid_json", Seq("col_json_str")),
      DQRowRule(R.hasJsonKeys(col("col_json_str"), Seq("key1", "key2")), "has_json_keys", Seq("col_json_str")),
      DQRowRule(R.regexMatch(col("col_json_str"), "^\\{.*\\}$"), "regex_match", Seq("col_json_str")),
      DQRowRule(graft.checks.GeoChecks.isPoint(col("col_geo_point")), "is_point", Seq("col_geo_point")),
      DQRowRule(graft.checks.GeoChecks.isNotNullIsland(col("col_geo_point")), "is_not_null_island", Seq("col_geo_point")))
  }
}
