package graft

import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.functions._

/** Metadata (YAML) path: parse -> validate -> expand -> apply. */
class MetadataSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, Some("a"), 10), (2, None, 20), (2, Some("c"), 30), (3, Some("d"), -5)
  ).toDF("id", "name", "amount")

  test("yaml checks with for_each_column expansion apply end-to-end") {
    val yaml =
      """
        |- criticality: error
        |  check:
        |    function: is_not_null
        |    for_each_column: [id, name]
        |- name: amount_range
        |  criticality: warn
        |  check:
        |    function: is_in_range
        |    arguments: { column: amount, min_limit: 0, max_limit: 25 }
        |""".stripMargin
    val out = DQEngine.applyChecksByMetadataYaml(df, yaml)
    val errs = out.where(col("_errors").isNotNull).select("id").as[Int].collect()
    assert(errs.toSeq == Seq(2)) // null name
    val warns = out.where(col("_warnings").isNotNull).select("amount").as[Int].collect().sorted
    assert(warns.toSeq == Seq(-5, 30))
  }

  test("dataset check via metadata with ref_df_name") {
    val ref = Seq(1, 3).toDF("rid")
    val checks = Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "foreign_key",
        "arguments" -> Map("columns" -> Seq("id"), "ref_columns" -> Seq("rid"), "ref_df_name" -> "ref"))))
    val out = DQEngine.applyChecksByMetadata(df, checks, refDfs = Map("ref" -> ref))
    val bad = out.where(col("_errors").isNotNull).select("id").as[Int].collect().sorted
    assert(bad.toSeq == Seq(2, 2))
  }

  test("validation rejects unknown function and bad criticality") {
    val errs = ChecksSerializer.validateChecks(Seq(
      Map("criticality" -> "fatal", "check" -> Map("function" -> "nope")),
      Map("check" -> Map.empty[String, Any]),
      Map("bogus" -> 1, "check" -> Map("function" -> "is_not_null"))))
    assert(errs.exists(_.contains("unknown function")))
    assert(errs.exists(_.contains("invalid criticality")))
    assert(errs.exists(_.contains("function is required")))
    assert(errs.exists(_.contains("unknown keys")))
  }

  test("serialize -> parse round trip") {
    val rules = ChecksSerializer.deserialize(Seq(
      Map("name" -> "r1", "criticality" -> "warn",
        "check" -> Map("function" -> "is_not_null", "arguments" -> Map("column" -> "id")),
        "filter" -> "id > 0")), ResolveCtx(spark))
    val yaml = ChecksSerializer.toYaml(ChecksSerializer.serialize(rules))
    val back = ChecksSerializer.deserialize(ChecksSerializer.parseYaml(yaml), ResolveCtx(spark))
    assert(back.head.resolvedName == "r1")
    assert(back.head.criticality == graft.core.Criticality.Warn)
    assert(back.head.filter.contains("id > 0"))
  }

  test("custom check function registration") {
    CheckRegistry.register("my_custom_positive", RowCheckFn(a =>
      graft.core.CheckUtils.makeCondition(a.column() <= 0, "not positive")))
    val out = DQEngine.applyChecksByMetadataYaml(df,
      "- check: { function: my_custom_positive, arguments: { column: amount } }")
    val bad = out.where(col("_errors").isNotNull).select("amount").as[Int].collect()
    assert(bad.toSeq == Seq(-5))
  }

  test("custom checks load by fully-qualified provider class name") {
    // explicit bulk registration
    val names = CheckRegistry.registerFromClass("graft.SampleCheckProvider")
    assert(names.contains("sample_is_even"))
    val out = DQEngine.applyChecksByMetadataYaml(df,
      "- check: { function: sample_is_even, arguments: { column: amount } }")
    assert(out.where(col("_errors").isNotNull).select("amount").as[Int].collect().toSet == Set(-5))
    // inline qualified reference without prior registration
    val out2 = DQEngine.applyChecksByMetadataYaml(df,
      "- check: { function: 'graft.SampleCheckProvider#sample_is_even', arguments: { column: amount } }")
    assert(out2.where(col("_errors").isNotNull).count() == 1)
    // bad class / non-provider fail loudly
    intercept[IllegalArgumentException](CheckRegistry.registerFromClass("graft.NoSuchProvider"))
    intercept[IllegalArgumentException](CheckRegistry.registerFromClass("graft.MetadataSpec"))
  }

  test("message_expr overrides the failure message; invalid expr skips the check") {
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error", "message_expr" -> "concat('bad amount: ', amount)",
      "check" -> Map("function" -> "is_not_greater_than",
        "arguments" -> Map("column" -> "amount", "limit" -> 25)))))
    val msgs = out.where(col("_errors").isNotNull)
      .selectExpr("_errors[0].message").as[String].collect().toSeq
    assert(msgs == Seq("bad amount: 30"))
    // unresolvable message_expr -> skipped result, not failure
    val skipped = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error", "message_expr" -> "concat('x', no_such_col)",
      "check" -> Map("function" -> "is_not_greater_than",
        "arguments" -> Map("column" -> "amount", "limit" -> 25)))))
    assert(skipped.selectExpr("_errors[0].skipped").as[Boolean].collect().forall(identity))
  }

  test("column arguments: raw hyphenated names resolve via col, calls via expr") {
    // "first-name" is a legal raw column name — it must NOT parse as the
    // subtraction first - name (r9 expression-column support regression)
    val hy = Seq((1, "x"), (2, null.asInstanceOf[String])).toDF("id", "first-name")
    val out = DQEngine.applyChecksByMetadata(hy, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_not_null",
        "arguments" -> Map("column" -> "first-name")))))
    assert(out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSeq == Seq(2))
    // function-call columns still route through expr
    val arr = Seq((1, Seq(1, 2)), (2, Seq.empty[Int])).toDF("id", "xs")
    val out2 = DQEngine.applyChecksByMetadata(arr, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_not_null",
        "arguments" -> Map("column" -> "try_element_at(xs, 1)")))))
    assert(out2.where(col("_errors").isNotNull).select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("column arguments: paren-free expressions (arithmetic, :: cast) route through expr") {
    // r10 ADVICE regression: the reference resolves string columns via
    // F.expr unconditionally, so "a + b" and "a::int" are legal column
    // arguments even without a function-call parenthesis
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_not_greater_than",
        "arguments" -> Map("column" -> "amount + id", "limit" -> 31)))))
    val bad = out.where(col("_errors").isNotNull).select("amount").as[Int].collect()
    assert(bad.toSeq == Seq(30)) // 30 + 2 = 32 > 31
    val out2 = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_not_less_than",
        "arguments" -> Map("column" -> "amount::long", "limit" -> 0)))))
    val bad2 = out2.where(col("_errors").isNotNull).select("amount").as[Int].collect()
    assert(bad2.toSeq == Seq(-5))
    // a string that parses to a bare attribute still routes through col
    assert(CheckArgs.resolveColumn("amount").toString == col("amount").toString)
    // a name with a space parses as Alias(attr) — kept as a raw column name,
    // not silently resolved to the prefix column (ADVICE r10 #4)
    assert(CheckArgs.resolveColumn("amount usd").toString == col("amount usd").toString)
    val dfSpace = spark.range(3).toDF("id").withColumn("amount usd", col("id") * 10)
    val outSpace = DQEngine.applyChecksByMetadata(dfSpace, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_not_less_than",
        "arguments" -> Map("column" -> "amount usd", "limit" -> 10)))))
    assert(outSpace.where(col("_errors").isNotNull).count() == 1) // only id=0
  }

  test("unquoted YAML date limits become naive DATE literals, not shifted instants") {
    // snakeyaml parses 2019-01-01 to a java.util.Date at UTC midnight; the
    // literal must be a DATE (timezone-free), so a row exactly at the bound
    // passes in ANY session timezone
    val parsed = ChecksSerializer.parseYaml("v: 2019-01-01").head("v")
    assert(parsed.isInstanceOf[java.util.Date])
    val d1 = spark.range(1).select(graft.core.CheckUtils.limitExpr(parsed).as("d"))
    assert(d1.schema("d").dataType == org.apache.spark.sql.types.DateType)
    assert(d1.head().get(0).toString == "2019-01-01")
    // a time-of-day keeps timestamp semantics with the text's own fields
    val ts = ChecksSerializer.parseYaml("v: 2019-01-01 01:30:00").head("v")
    val d2 = spark.range(1).select(graft.core.CheckUtils.limitExpr(ts).as("t"))
    assert(d2.schema("t").dataType == org.apache.spark.sql.types.TimestampType)
    assert(d2.head().get(0).toString.contains("01:30:00"), d2.head().get(0))
  }

  test("YAML timestamps: explicit midnight stays TIMESTAMP; tz offsets keep the instant") {
    // r10 ADVICE regression (typed !!timestamp construct): an explicit
    // 00:00:00 must NOT be demoted to a DATE literal...
    val mid = ChecksSerializer.parseYaml("v: 2019-01-01 00:00:00").head("v")
    assert(mid.isInstanceOf[java.sql.Timestamp], mid.getClass)
    val d1 = spark.range(1).select(graft.core.CheckUtils.limitExpr(mid).as("t"))
    assert(d1.schema("t").dataType == org.apache.spark.sql.types.TimestampType)
    // ...and a tz-suffixed scalar denotes its EXACT instant (PyYAML applies
    // the offset the same way): 01:00 at +05:00 is 2024-12-31T20:00:00Z
    val tz = ChecksSerializer.parseYaml("v: 2025-01-01T01:00:00+05:00").head("v")
    assert(tz.isInstanceOf[java.sql.Timestamp], tz.getClass)
    assert(tz.asInstanceOf[java.sql.Timestamp].toInstant ==
      java.time.Instant.parse("2024-12-31T20:00:00Z"))
    // Z and compact-offset spellings parse too
    assert(graft.core.CheckUtils.parseYamlTimestampScalar("2025-01-01T01:00:00Z")
      .asInstanceOf[java.sql.Timestamp].toInstant ==
      java.time.Instant.parse("2025-01-01T01:00:00Z"))
    assert(graft.core.CheckUtils.parseYamlTimestampScalar("2025-01-01 01:00:00 -0530")
      .asInstanceOf[java.sql.Timestamp].toInstant ==
      java.time.Instant.parse("2025-01-01T06:30:00Z"))
    // fractional seconds survive
    assert(graft.core.CheckUtils.parseYamlTimestampScalar("2025-01-01 01:00:00.25")
      .asInstanceOf[java.sql.Timestamp].getNanos == 250000000)
  }

  test("resolveVariables: {{ placeholder }} syntax, all eight scalar types, rejection") {
    import ChecksSerializer.{resolveVariables, scalarVariableText}
    // r10 parity sweep (reference utils.py:779-820, #1078): str / int / float /
    // bool / Decimal / date / datetime / time, stringified like Python str()
    assert(scalarVariableText("k", "txt") == "txt")
    assert(scalarVariableText("k", 42) == "42")
    assert(scalarVariableText("k", 42L) == "42")
    assert(scalarVariableText("k", 0.5) == "0.5")
    assert(scalarVariableText("k", true) == "True")
    assert(scalarVariableText("k", false) == "False")
    assert(scalarVariableText("k", new java.math.BigDecimal("1.50")) == "1.50")
    assert(scalarVariableText("k", BigDecimal("0.00001")) == "0.00001") // no sci notation
    assert(scalarVariableText("k", java.time.LocalDate.of(2025, 1, 2)) == "2025-01-02")
    assert(scalarVariableText("k", java.time.LocalDateTime.of(2025, 1, 2, 3, 4, 5)) ==
      "2025-01-02 03:04:05")
    assert(scalarVariableText("k", java.time.LocalDateTime.of(2025, 1, 2, 3, 4, 5, 500000000)) ==
      "2025-01-02 03:04:05.500000") // micros printed only when nonzero
    assert(scalarVariableText("k", java.sql.Timestamp.valueOf("2025-01-02 03:04:05")) ==
      "2025-01-02 03:04:05")
    assert(scalarVariableText("k", java.time.LocalTime.of(12, 30, 0)) == "12:30:00")
    intercept[IllegalArgumentException](scalarVariableText("k", Seq(1, 2)))
    intercept[IllegalArgumentException](scalarVariableText("k", Map("a" -> 1)))
    // Python repr() float conventions at extreme magnitudes (ADVICE r10 #5):
    // scientific form uses lowercase e, explicit sign, >= 2 exponent digits;
    // the fixed/sci threshold is Python's [-4, 16) decimal-exponent window
    assert(scalarVariableText("k", 1e20) == "1e+20")
    assert(scalarVariableText("k", 1e-5) == "1e-05")
    assert(scalarVariableText("k", 1.5e-7) == "1.5e-07")
    assert(scalarVariableText("k", -2.5e20) == "-2.5e+20")
    assert(scalarVariableText("k", 1e15) == "1000000000000000.0")
    assert(scalarVariableText("k", 1e16) == "1e+16")
    assert(scalarVariableText("k", 1e-4) == "0.0001")
    assert(scalarVariableText("k", 123.456) == "123.456")
    assert(scalarVariableText("k", 1.0) == "1.0")
    assert(scalarVariableText("k", -0.0) == "-0.0")
    assert(scalarVariableText("k", 0.0) == "0.0")
    assert(scalarVariableText("k", Double.NaN) == "nan")
    assert(scalarVariableText("k", Double.PositiveInfinity) == "inf")
    assert(scalarVariableText("k", 1e-5f) == "1e-05") // float keeps its shortest form

    // whitespace-tolerant {{ key }} resolution; unresolved left verbatim;
    // dict keys untouched
    val checks = Seq(Map(
      "criticality" -> "error",
      "filter" -> "amount < {{max}}",
      "check" -> Map("function" -> "is_in_range",
        "arguments" -> Map("column" -> "{{ target_col }}", "min_limit" -> "{{min}}",
          "max_limit" -> "{{ missing }}"))))
    val r = resolveVariables(checks, Map("target_col" -> "amount", "min" -> 0, "max" -> 25))
    val args = r.head("check").asInstanceOf[Map[String, Any]]("arguments").asInstanceOf[Map[String, Any]]
    assert(args("column") == "amount")
    assert(args("min_limit") == "0")
    assert(args("max_limit") == "{{ missing }}") // unresolved stays verbatim
    assert(r.head("filter") == "amount < 25")
    // end-to-end through the engine (numeric limits substituted as strings
    // route through expr, the reference contract)
    val out = DQEngine.applyChecksByMetadata(df, resolveVariables(Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_in_range",
        "arguments" -> Map("column" -> "{{ target_col }}", "min_limit" -> "{{min}}",
          "max_limit" -> "{{ max }}")))),
      Map("target_col" -> "amount", "min" -> 0, "max" -> 25)))
    val bad = out.where(col("_errors").isNotNull).select("amount").as[Int].collect().sorted
    assert(bad.toSeq == Seq(-5, 30))
  }

  test("variable substitution in metadata") {
    val checks = Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_in_range",
        "arguments" -> Map("column" -> "${target_col}", "min_limit" -> 0, "max_limit" -> 25))))
    val substituted = ChecksSerializer.substituteVariables(checks, Map("target_col" -> "amount"))
    val out = DQEngine.applyChecksByMetadata(df, substituted)
    val bad = out.where(col("_errors").isNotNull).select("amount").as[Int].collect().sorted
    assert(bad.toSeq == Seq(-5, 30))
  }
}
