package graft

import graft.checks.RowChecks
import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.functions._

/** graft_* SQL functions registered through GraftExtensions: reachable from
  * plain SQL and from sql_expression rules (no UDF round-trip).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("registered functions evaluate from plain SQL") {
    val row = spark.sql(
      """SELECT graft_ipv6_valid('2001:db8::1') AS a,
        |       graft_ipv6_valid('nope') AS b,
        |       graft_contains_luhn('pay 4111 1111 1111 1111 now') AS c,
        |       graft_wkt_info('POINT (3 4)').x AS x,
        |       graft_wkt_intersects('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 'POINT (2 2)') AS i
        |""".stripMargin).head()
    assert(row.getBoolean(0) && !row.getBoolean(1) && row.getBoolean(2))
    assert(row.getDouble(3) == 3.0 && row.getBoolean(4))
  }

  test("graft_exact_median aggregates from plain SQL") {
    val med = Seq(1.0, 2.0, 3.0, 100.0).toDF("v").createOrReplaceTempView("mview")
    assert(spark.sql("SELECT graft_exact_median(v) FROM mview").head().getDouble(0) == 2.5)
  }

  test("sql_expression rules can call graft_* functions") {
    val df = Seq((1, "2001:db8::1"), (2, "not-an-ip")).toDF("id", "addr")
    val out = DQEngine.applyChecks(df, Seq(
      DQRowRule(RowChecks.sqlExpression("graft_ipv6_valid(addr)"), "sql_expression", Seq("addr"))))
    val bad = out.where(col("_errors").isNotNull).select("id").as[Int].collect()
    assert(bad.toSeq == Seq(2))
  }

  test("pipeline sketch/quality functions evaluate from plain SQL") {
    Seq((1L, "the quick brown fox the quick brown cat"))
      .toDF("id", "text").createOrReplaceTempView("sqv")
    // 8 tokens -> 6 trigram windows, 5 DISTINCT grams ("the quick brown" repeats)
    val row = spark.sql(
      """SELECT size(graft_shingle_hashes(text, 3)) AS n_sh,
        |  graft_quality_score(text, '{"bias": 0.0, "weights": {"quick": 4.0}}') AS q
        |FROM sqv""".stripMargin).head()
    assert(row.getInt(0) == 5)
    // two 'quick' in 8 tokens: sigmoid(0 + (4+4)/8) = sigmoid(1)
    assert(math.abs(row.getDouble(1) - 1.0 / (1.0 + math.exp(-1.0))) < 1e-12)
    val pos = spark.sql(
      """SELECT p.pos FROM sqv
        |LATERAL VIEW graft_shingle_positions(text, 3) p AS pos, gramhash
        |""".stripMargin).collect().map(_.getInt(0)).toSeq
    assert(pos == (1 to 6))
    // model JSON round-trip
    val m = graft.pipeline.QualityModel(-0.5, Map("a" -> 1.0, "b" -> -2.0))
    assert(graft.pipeline.QualityModelJson.parse(
      graft.pipeline.QualityModelJson.render(m)) == m)
  }

  test("unigram functions evaluate from plain SQL") {
    Seq((1L, "abcd abq")).toDF("id", "text").createOrReplaceTempView("unv")
    val model =
      """{"unk": -20.0, "pieces": {"ab": -1.0, "cd": -1.2, "abc": -2.5, "d": -3.0}}"""
    val row = spark.sql(
      s"""SELECT graft_unigram_encode(text, '$model') AS toks,
         |  graft_unigram_count(text, '$model') AS n FROM unv""".stripMargin).head()
    // Viterbi: abcd -> ab+cd (beats greedy abc+d); abq -> ab + unk q
    assert(row.getSeq[String](0) == Seq("ab", "cd", "ab", "q"))
    assert(row.getInt(1) == 4)
    // non-literal model and non-string text fail at analysis, not runtime
    val e = intercept[Exception] {
      spark.sql("SELECT graft_unigram_count(text, text) FROM unv").collect()
    }
    assert(e.getMessage.contains("literal"))
    // langid from SQL with a literal count model
    val lm = """{"n": 3, "docs": {"en": 50, "de": 50},
                |"grams": {"en": {"aaa": 10}, "de": {"bbb": 10}}}""".stripMargin
    val langs = spark.sql(
      s"SELECT graft_langid('aaab', '$lm'), graft_langid('bbbb', '$lm')").head()
    assert(langs.getString(0) == "en" && langs.getString(1) == "de")
  }

  test("wordpiece functions evaluate from plain SQL") {
    Seq((1L, "theme unable zz9")).toDF("id", "text").createOrReplaceTempView("wpv")
    val model =
      """{"vocab": ["the","##me","un","##able","z","##z"],
        |"unk": "[UNK]", "prefix": "##", "max_chars": 200}""".stripMargin
    val r = spark.sql(
      s"""SELECT graft_wordpiece_encode(text, '$model') AS toks,
         |  graft_wordpiece_count(text, '$model') AS n FROM wpv""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("the", "##me", "un", "##able", "[UNK]"))
    assert(r.getInt(1) == 5)
    intercept[Exception] {
      spark.sql("SELECT graft_wordpiece_count(text, text) FROM wpv").collect()
    }
  }

  test("pq functions evaluate from plain SQL") {
    Seq((1L, Seq(0.9, 0.1, 0.1, 0.9)), (2L, Seq(1.0, 2.0)))
      .toDF("id", "v").createOrReplaceTempView("pqv")
    val model =
      """{"block_dim": 2, "codebooks": [[[1.0,0.0],[0.0,1.0]],
        |[[1.0,0.0],[0.0,1.0]]]}""".stripMargin
    val r = spark.sql(
      s"""SELECT id, graft_pq_encode(v, '$model') AS codes FROM pqv ORDER BY id""")
      .collect()
    assert(r(0).getSeq[Int](1) == Seq(0, 1))
    assert(r(1).isNullAt(1)) // wrong dim -> null
    val dot = spark.sql(
      s"""SELECT graft_pq_sdc_dot(array(0, 1), array(0, 1), '$model') AS s,
         |  graft_pq_sdc_dot(array(0, 1), array(1, 0), '$model') AS z""".stripMargin).head()
    assert(dot.getDouble(0) == 2.0 && dot.getDouble(1) == 0.0)
    intercept[Exception] {
      spark.sql("SELECT graft_pq_encode(v, cast(id AS STRING)) FROM pqv").collect()
    }
  }

  test("bpe and ner functions evaluate from plain SQL") {
    Seq((1L, "abc xabd plain"), (2L, "Dear James Smith, hello"), (3L, "nothing here"))
      .toDF("id", "text").createOrReplaceTempView("bnv")
    // hierarchical 3-merge model: rank order (b,c) < (a,b) < (x,ab)
    val model = """{"merges": [["b","c"], ["a","b"], ["x","ab"]]}"""
    val enc = spark.sql(
      s"""SELECT id, graft_bpe_encode(text, '$model') AS toks,
         |  graft_bpe_count(text, '$model') AS n FROM bnv WHERE id = 1""".stripMargin).head()
    // 'abc' -> [a, bc] (rank over position), 'xabd' -> [xab, d] (chained
    // merge), 'plain' -> single chars (no merge applies)
    assert(enc.getSeq[String](1) ==
      Seq("a", "bc", "xab", "d", "p", "l", "a", "i", "n"))
    assert(enc.getInt(2) == 9)
    val ner = spark.sql(
      "SELECT id, graft_ner_entities(text) AS ents FROM bnv ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(ner(1)._2.contains("PERSON") && ner(0)._2.isEmpty && ner(2)._2.isEmpty)
    // FQCN plug-in path from SQL
    val toy = spark.sql(
      "SELECT graft_ner_entities('met alice johnson today', 'graft.ToyPersonNer')")
      .head().getSeq[String](0)
    assert(toy == Seq("PERSON"))
    // model JSON round-trip
    val bm = graft.pipeline.BpeModel(Vector(("b", "c"), ("a", "b"), ("x", "ab")))
    assert(graft.pipeline.BpeModelJson.parse(graft.pipeline.BpeModelJson.render(bm)) == bm)
  }

  test("lm perplexity and markup stripping evaluate from plain SQL") {
    Seq((1L, "the table z"), (2L, "x"), (3L, "<p>hello &amp; <b>world</b></p>"))
      .toDF("id", "text").createOrReplaceTempView("lmv")
    val model = """{"k": 0.5, "unigrams": {"the": 100, "table": 40, "<unk>": 850},
                   |"bigrams": {"the table": 20, "<unk> the": 60}}""".stripMargin
    val rows = spark.sql(
      s"""SELECT id, graft_lm_perplexity(text, '$model') AS ppl FROM lmv ORDER BY id""")
      .collect()
    // hand computation: bigrams (the,table), (table,<unk>); V = 3
    val want = math.exp(-(
      math.log((20 + 0.5) / (100 + 0.5 * 3)) +
        math.log((0 + 0.5) / (40 + 0.5 * 3))) / 2)
    assert(math.abs(rows(0).getDouble(1) - want) < 1e-12)
    assert(rows(1).isNullAt(1)) // 1 token -> no bigram evidence
    val clean = spark.sql(
      "SELECT graft_strip_markup(text) FROM lmv WHERE id = 3").head().getString(0)
    assert(clean == "hello & world")
    val h = spark.sql("SELECT graft_char_entropy('abab')").head().getDouble(0)
    assert(math.abs(h - math.log(2)) < 1e-12)
    // model JSON round-trip
    val lm = graft.pipeline.LmModel(0.5,
      Map("a" -> 2L, graft.pipeline.LmModel.Unk -> 1L),
      Map(graft.pipeline.LmModel.key("a", "a") -> 1L))
    assert(graft.pipeline.LmModelJson.parse(graft.pipeline.LmModelJson.render(lm)) == lm)
  }

  test("extensions class injects the same registry entries") {
    // the SparkSessionExtensions path shares the builder list; spot-check shape
    assert(GraftExtensions.functions.map(_._1).distinct.size == GraftExtensions.functions.size)
    assert(GraftExtensions.functions.nonEmpty)
  }
}
