package graft

import graft.checks.JsonInfoExpr
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Semantics-parity gate for the unified JsonInfo parse: `valid` must agree
  * with try_parse_json IS NOT NULL and `keys` with json_object_keys on every
  * corpus entry — including the built-ins' own divergences (duplicate keys,
  * trailing garbage). The corpus is adversarial on purpose; any future
  * Jackson/variant behavior change surfaces here, not in production.
  */
class JsonInfoSpec extends SparkSpec {
  import spark.implicits._

  private val corpus: Seq[String] = Seq(
    // plain valid values
    """{"a":1,"b":"x"}""", """[]""", """{}""", """[1,2,3]""", "null", "true",
    "false", "123", "-4.5e2", "\"str\"", """{"a":{"b":{"c":[1,2,{"d":null}]}}}""",
    "  {\"a\" : 1}  ", "\t\n{\"k\":[]}\r\n", """{"":1}""", """{"a":[],"b":{}}""",
    """{"é":"café"}""", """{"a b":1}""", "\"\\ud83d\\ude00\"",
    "1e308", "-1e-308", "0.0", "-0.0", "0", "-0",
    """{"deep":""" + "[" * 100 + "]" * 100 + "}",
    // duplicate keys: variant rejects, json_object_keys lists both
    """{"a":1,"a":2}""", """{"x":{"a":1,"a":2}}""", """[{"a":1,"a":2}]""",
    """{"a":1,"b":2,"a":3}""",
    // trailing content after a complete root
    """{"a":1} """, """{"a":1} {"b":2}""", """{"a":1} x""", """[1] 2""",
    """{"a":1}]""", "1 2", "null null",
    // malformed
    "", "   ", "{", "}", "[", "]", "{\"a\"", "{\"a\":", "{\"a\":1",
    "{\"a\":1,", "{\"a\":1,}", "[1,", "[1,]", "[,1]", "{,}", "{:1}",
    "{\"a\"}", "{\"a\" 1}", "{a:1}", "{'a':1}", "'str'", "[1 2]",
    "{\"a\":1 \"b\":2}", "unquoted", "NaN", "Infinity", "-Infinity",
    "+1", ".5", "5.", "01", "0x10", "1e", "1e+", "--1", "\"unterminated",
    "\"bad\\escape\"", "\"bad\\u12 4\"", " ", "{\"a\":\"b\"}",
    "\"raw\tcontrol\"", "/*c*/{}", "{} //c", "{\"a\":1}//",
    "﻿{\"a\":1}", // UTF-8 BOM prefix
    // big numerals
    "123456789012345678901234567890",
    """{"n":9999999999999999999999999999.999999}""",
    "1" + "0" * 200, "1e99999", "-1e99999",
    """{"a":""" + "9" * 500 + "}"
  ) ++ Seq(
    // raw (unescaped) control chars: json_object_keys' Hive-compat factory
    // tolerates them, the variant parser does not
    "{\"a\u0000b\":1}", "{\"k\":\"x\u0001y\"}", "\"nul\u0000\"",
    "{\"t\":\"tab\there\"}",
    // escaped control chars are plain legal JSON for both
    "{\"a\\u0000b\":1}", "\"\\u0001\"",
    // single quotes: keys side tolerates, variant side rejects
    "{'q':1}", "{'q':1,\"r\":2}", "['a','b']", "{\"k\":'v'}",
    // legal whitespace BETWEEN tokens (incl. tab before the colon) must not
    // trip the raw-control-char span probe
    "{\"a\"\t: 1}", "[\"x\" ,\t\"y\"\r\n]", "{\"a\"\n:\n\"b\"\t}",
    // deep nesting beyond Jackson's default 1000-depth constraint: both
    // built-ins and the kernel ride the same parser limit
    "[" * 1500 + "]" * 1500,
    "[" * 900 + "]" * 900,
    "{\"a\":" * 1500 + "1" + "}" * 1500,
    "{\"a\":" * 900 + "1" + "}" * 900
  )

  test("valid/keys agree with try_parse_json and json_object_keys on the corpus") {
    val df = (corpus :+ null.asInstanceOf[String]).zipWithIndex
      .map { case (s, i) => (i, s) }.toDF("i", "s")
    val info = GraftColumnBridge.column(JsonInfoExpr(
      GraftColumnBridge.expression(col("s"))))
    val rows = df.select(col("i"), col("s"),
      try_parse_json(col("s")).isNull.as("builtin_invalid"),
      json_object_keys(col("s")).as("builtin_keys"),
      info.getField("valid").as("got_valid"),
      info.getField("keys").as("got_keys"))
      .collect()
    rows.foreach { r =>
      val s = Option(r.getAs[String]("s"))
      val show = r.getAs[Int]("i") + ":" + s.map(x =>
        (if (x.length > 60) x.take(60) + "..." else x)
          .flatMap(c => if (c < ' ' || c > '~') f"\\u${c.toInt}%04x" else c.toString))
        .getOrElse("NULL")
      if (s.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("got_valid")), s"null input validity: $show")
        assert(r.isNullAt(r.fieldIndex("got_keys")), s"null input keys: $show")
        assert(r.isNullAt(r.fieldIndex("builtin_keys")))
      } else {
        val builtinValid = !r.getAs[Boolean]("builtin_invalid")
        val gotValid = r.getAs[Boolean]("got_valid")
        assert(gotValid == builtinValid,
          s"validity mismatch on <$show>: builtin=$builtinValid got=$gotValid")
        val builtinKeys = Option(r.getAs[Seq[String]]("builtin_keys"))
        val gotKeys = Option(r.getAs[Seq[String]]("got_keys"))
        assert(gotKeys == builtinKeys,
          s"keys mismatch on <$show>: builtin=$builtinKeys got=$gotKeys")
      }
    }
  }

  test("fuzz: 3000 seeded random JSON-ish strings agree with both built-ins") {
    // deterministic generator biased toward structural tokens so a useful
    // fraction parses; covers quote styles, control chars, deep nesting,
    // duplicate keys, trailing junk by construction
    val rnd = new scala.util.Random(20260815)
    val atoms = Array("{", "}", "[", "]", ":", ",", "\"a\"", "\"b\"", "'c'",
      "\"a\":1", "\"a\":", "1", "-2.5", "1e3", "true", "false", "null",
      " ", "\t", "\n", "\"x\\u0041y\"", "\"x\\qy\"", "", "\"", "x",
      "{\"k\":[1,2]}", "[{\"a\":1,\"a\":2}]", "0", "01", "\"長い\"")
    def gen(): String = {
      val n = 1 + rnd.nextInt(12)
      (0 until n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }
    val corpus = (0 until 3000).map(_ => gen())
    val df = corpus.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    val info = GraftColumnBridge.column(JsonInfoExpr(
      GraftColumnBridge.expression(col("s"))))
    val bad = df.select(col("i"), col("s"),
      try_parse_json(col("s")).isNull.as("bi"),
      json_object_keys(col("s")).as("bk"),
      info.getField("valid").as("gv"),
      info.getField("keys").as("gk"))
      .where(col("bi") === col("gv") || // validity mismatch (bi == !valid)
        !(col("bk") <=> col("gk")))
      .collect()
    assert(bad.isEmpty, bad.take(5).map { r =>
      val s = r.getAs[String]("s").flatMap(c =>
        if (c < ' ' || c > '~') f"\\u${c.toInt}%04x" else c.toString)
      s"<$s> builtin_invalid=${r.getAs[Boolean]("bi")} got_valid=${r.getAs[Boolean]("gv")} " +
        s"builtin_keys=${Option(r.getAs[Seq[String]]("bk"))} got_keys=${Option(r.getAs[Seq[String]]("gk"))}"
    }.mkString("; "))
  }

  test("the fused parse stays inside whole-stage codegen") {
    val df = spark.range(100).select(
      concat(lit("{\"k\":"), col("id").cast("string"), lit("}")).as("s"))
    val info = GraftColumnBridge.column(JsonInfoExpr(
      GraftColumnBridge.expression(col("s"))))
    val q = df.select(info.getField("valid").as("v"), info.getField("keys").as("k"))
      .where(col("v"))
    val codegen = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.nonEmpty, q.queryExecution.executedPlan.toString)
    assert(q.count() == 100)
  }
}
