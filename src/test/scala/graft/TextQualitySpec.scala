package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** Gopher-complete quality rules (gopherSignals/gopherFilter) and the
  * blocklist token signals: closed-form counts, threshold behavior, edge
  * cases, and codegen.
  */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String): org.apache.spark.sql.Row =
    Seq(Option(text)).toDF("t")
      .select(TextAnalysis.gopherSignals(col("t")).as("s"))
      .select("s.*").head()

  test("repetitionSignals kernel is value-identical to the HOF formulation") {
    val fixtures = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (1L, "the cat sat on the mat the cat"),
      (2L, "a a a a"),
      (3L, "all distinct words here"),
      (4L, "double  space keeps  empty segments"),
      (5L, ""),                       // split("") = [""] -> top_word_frac 1.0
      (6L, null: String),             // null -> all-zero struct
      (7L, "one"),                    // < 2 tokens -> ngram fracs 0.0
      (8L, "x y x y x y x y")
    ), 2)).toDF("id", "text")
    // the formulation RepetitionStats replaced — kept as semantic reference
    val t = split(col("text"), " ")
    def dupFrac(arr: org.apache.spark.sql.Column) =
      when(size(arr) > 0,
        lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr))
        .otherwise(lit(0.0))
    val topWordFrac =
      when(size(t) > 0,
        array_max(transform(array_distinct(t),
          w => size(filter(t, x => x === w)))).cast("double") / size(t))
        .otherwise(lit(0.0))
    val hof = struct(
      dupFrac(t).as("dup_word_frac"), topWordFrac.as("top_word_frac"),
      dupFrac(TextAnalysis.wordNgrams(col("text"), 2)).as("dup_2gram_frac"),
      dupFrac(TextAnalysis.wordNgrams(col("text"), 3)).as("dup_3gram_frac"))
    val rows = fixtures.select(col("id"),
      TextAnalysis.repetitionSignals(col("text")).as("k"), hof.as("h")).collect()
    rows.foreach { r =>
      val k = r.getStruct(1); val h = r.getStruct(2)
      (0 until 4).foreach { i =>
        assert(k.getDouble(i) == h.getDouble(i),
          s"id=${r.getLong(0)} field=$i kernel=${k.getDouble(i)} hof=${h.getDouble(i)}")
      }
    }
  }

  test("qualitysignals kernel is value-identical to the regex/HOF formulation") {
    val fixtures = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (1L, "The quick brown fox, it jumped over 3 lazy DOGS!"),
      (2L, " leading space"),            // regex \s+ split keeps a leading empty token
      (3L, "trailing space "),           // ...and a trailing empty token
      (4L, ""),                          // "" -> [""]: 1 token
      (5L, null: String),                // null text -> struct of nulls
      (6L, "tabs\tand\nnewlines are separators"),
      (7L, "The AND Of tO iN"),          // stopwords matched on lowercase
      (8L, "ÄØÇ Straße 42 {brackets} [and] #punct~"),
      (9L, "   ")                        // all-whitespace: ["",""] -> 2 tokens
    ), 2)).toDF("id", "text")
    // the formulation QualitySignals replaced — kept as semantic reference
    val nChars = length(col("text"))
    val toks = split(col("text"), "\\s+")
    val nTokens = size(toks)
    val nPunct = size(regexp_extract_all(col("text"), lit("[\\p{Punct}]"), lit(0)))
    val nDigits = size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
    val nUpper = size(regexp_extract_all(col("text"), lit("[A-Z]"), lit(0)))
    val nStop = size(filter(toks, t => lower(t).isin(TextAnalysis.EnglishStopwords: _*)))
    val hof = struct(
      nChars.as("n_chars"), nTokens.as("n_tokens"), nPunct.as("n_punct"),
      nDigits.as("n_digits"), nUpper.as("n_upper"), nStop.as("n_stopwords"),
      (nPunct.cast("double") / greatest(nChars, lit(1))).as("punct_ratio"),
      (nStop.cast("double") / greatest(nTokens, lit(1))).as("stopword_ratio"),
      (nChars.cast("double") / greatest(nTokens, lit(1))).as("mean_word_len"))
    val rows = fixtures.select(col("id"),
      TextAnalysis.qualitysignals(col("text")).as("k"), hof.as("h")).collect()
    rows.foreach { r =>
      val k = r.getStruct(1); val h = r.getStruct(2)
      (0 until 9).foreach { i =>
        assert((k.isNullAt(i) && h.isNullAt(i)) ||
          (!k.isNullAt(i) && !h.isNullAt(i) && k.get(i) == h.get(i)),
          s"id=${r.getLong(0)} field=$i kernel=${if (k.isNullAt(i)) null else k.get(i)} " +
            s"hof=${if (h.isNullAt(i)) null else h.get(i)}")
      }
    }
  }

  test("languageId kernel is value-identical to the array_intersect fold") {
    val fixtures = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (1L, "the cat and the dog went to the market"),           // en
      (2L, "der Hund und die Katze sind nicht im Haus"),        // de
      (3L, "le chat est dans la maison avec le chien"),         // fr
      (4L, "xyzzy plugh qwerty"),                               // no hits -> und
      (5L, null: String),                                       // null -> und
      (6L, ""),                                                 // empty -> und
      (7L, "THE AND OF TO IN IS THAT"),                         // uppercase en
      (8L, "de la le"),                                         // cross-lang tie -> registry order
      (9L, "das für straße"),                                   // unicode de words
      (10L, "the the the und und und")                          // distinct counts, not occurrences
    ), 2)).toDF("id", "text")
    // the formulation LangIdScore replaced — kept as semantic reference
    val toks = array_distinct(split(lower(col("text")), "\\s+"))
    val scores = TextAnalysis.LanguageStopwords.map { case (lang, words) =>
      (lang, size(array_intersect(toks, array(words.map(lit): _*))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val hof = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, score)) =>
      when(score > 0 && score === best, lit(lang)).otherwise(acc)
    }
    val rows = fixtures.select(col("id"),
      TextAnalysis.languageId(col("text")).as("k"), hof.as("h")).collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"id=${r.getLong(0)} kernel=${r.getString(1)} hof=${r.getString(2)}")
    }
  }

  test("c4 kernel is value-identical to the per-line lambda formulation") {
    val fixtures = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (1L, "A good sentence here.\nshort.\nno punctuation at all\nAnother fine sentence!"),
      (2L, "Enable JavaScript to view this page.\nA real sentence stays here."),
      (3L, "lorem ipsum dolor sit amet.\nfunction() { return 1; }"),
      (4L, ""),                                  // one empty line
      (5L, null: String),                        // coalesce -> ""
      (6L, "Ends with closers.\"'”’)\nEnds with spaces.   \nTab\tsplit still three words."),
      (7L, "Trailing newline keeps an empty line.\n"),
      (8L, "Carriage return line.\r\nNext line here too."), // \r survives the \n split
      (9L, "  leading spaces trim.\nuntrimmed\ttab words here."),
      (10L, "One? Two! Three. Four... and more sentences on one line."),
      (11L, "JAVASCRIPT uppercase warning sentence here.\nclean line stays put."),
      (12L, "quick brown fox.\nquick brown fox.\nquick brown fox.")
    ), 2)).toDF("id", "text")
    // the formulation C4Stats replaced — kept inline as semantic reference
    val t = coalesce(col("text"), lit(""))
    def lineKept(l: org.apache.spark.sql.Column) =
      l.rlike("[.!?][\"'”’)]*\\s*$") &&
        size(split(trim(l), "\\s+")) >= 3 &&
        !lower(l).contains("javascript")
    val lines = split(t, "\n")
    val kept = filter(lines, lineKept(_))
    val cleaned = array_join(kept, "\n")
    val hof = struct(
      size(lines).as("n_lines"),
      size(kept).as("n_kept_lines"),
      size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0))).as("n_sentences"),
      lower(t).contains("lorem ipsum").as("has_lorem_ipsum"),
      t.contains("{").as("has_curly_brace"),
      exists(lines, l => lower(l).contains("javascript")).as("has_javascript_line"))
    val rows = fixtures.select(col("id"),
      TextAnalysis.c4Signals(col("text")).as("k"), hof.as("h"),
      TextAnalysis.c4CleanedText(col("text")).as("kc"), cleaned.as("hc"),
      TextAnalysis.c4Keep(col("text")).as("kk"),
      (size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0))) >= 5 &&
        !lower(t).contains("lorem ipsum") && !t.contains("{")).as("hk")).collect()
    rows.foreach { r =>
      val k = r.getStruct(1); val h = r.getStruct(2)
      (0 until 6).foreach { i =>
        assert(k.get(i) == h.get(i),
          s"id=${r.getLong(0)} field=$i kernel=${k.get(i)} hof=${h.get(i)}")
      }
      assert(r.getString(3) == r.getString(4), s"id=${r.getLong(0)} cleaned text differs")
      assert(r.getBoolean(5) == r.getBoolean(6), s"id=${r.getLong(0)} keep differs")
    }
  }

  test("c4 projection stays inside whole-stage codegen") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Tuple1("A sentence that stays.\nshort")), 1)).toDF("text")
      .select(TextAnalysis.c4Signals(col("text")).as("s"),
        TextAnalysis.c4CleanedText(col("text")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected whole-stage codegen:\n$plan")
  }

  test("gopherSignals: closed-form counts on a hand-built page") {
    // 3 lines: prose / bullet / ellipsis-ended with symbols
    val text = "the cat and dog sat\n- item one\nto be continued... #tag …"
    val r = sig(text)
    // words: 5 + 3 + 5 = 13
    assert(r.getAs[Int]("n_words") == 13)
    // alpha words: 5 + 2 (item, one) + 4 (to be continued... #tag; "…" has no letter) = 11
    assert(r.getAs[Int]("n_alpha_words") == 11)
    // symbols: "..." + "#" + "…" = 3
    assert(math.abs(r.getAs[Double]("symbol_word_ratio") - 3.0 / 13) < 1e-12)
    assert(r.getAs[Int]("n_lines") == 3)
    assert(math.abs(r.getAs[Double]("bullet_line_frac") - 1.0 / 3) < 1e-12)
    // the "…" sits at end of line 3 -> ellipsis-ended; "..." is mid-line
    assert(math.abs(r.getAs[Double]("ellipsis_line_frac") - 1.0 / 3) < 1e-12)
    // required words present: the, and, to, be -> 4
    assert(r.getAs[Int]("n_required_words") == 4)
    val nonSpace = text.replaceAll("\\s+", "").length
    assert(math.abs(r.getAs[Double]("mean_word_len") - nonSpace / 13.0) < 1e-12)
  }

  test("gopherSignals: empty, null, and no-letter docs") {
    val e = sig("")
    assert(e.getAs[Int]("n_words") == 0)
    assert(e.getAs[Double]("alpha_word_frac") == 0.0)
    val n = sig(null)
    assert(n.getAs[Int]("n_words") == 0) // null coalesces to empty
    val d = sig("123 456 ###")
    assert(d.getAs[Int]("n_words") == 3)
    assert(d.getAs[Int]("n_alpha_words") == 0)
  }

  test("gopherFilter: clean prose passes, each violation trips its rule") {
    val prose = Array.fill(10)("the quick brown dogs jump with that energy").mkString(" ")
    def keep(t: String, minWords: Int = 50): Boolean =
      Seq(t).toDF("t").select(TextAnalysis.gopherFilter(col("t"), minWords = minWords)).head().getBoolean(0)
    assert(keep(prose)) // 80 words, all alpha, required words present
    assert(!keep("the cat and dog")) // too few words
    // symbol-heavy: > 10% of words are # / ellipsis hits
    assert(!keep(prose + " " + Array.fill(10)("#").mkString(" ")))
    // bullet-heavy page: every line is a bullet -> frac 1.0 > 0.9
    val bullets = Array.fill(12)("- the thing and that have with of to be").mkString("\n")
    assert(!keep(bullets, minWords = 5))
    // required words absent
    assert(!keep(Array.fill(60)("wordy").mkString(" "), minWords = 5))
  }

  test("gopherSignals kernel edges: astral letters, dot runs, trailing newline") {
    // astral letter (non-BMP, surrogate pair): one word, one alpha word,
    // TWO non-space chars by code-point count (parity with length())
    val astral = sig("𝐀a") // 𝐀a
    assert(astral.getAs[Int]("n_words") == 1)
    assert(astral.getAs[Int]("n_alpha_words") == 1)
    assert(math.abs(astral.getAs[Double]("mean_word_len") - 2.0) < 1e-12)
    // '....' = one leftmost '...' match; '......' = two
    assert(math.abs(sig("....").getAs[Double]("symbol_word_ratio") - 1.0) < 1e-12)
    assert(math.abs(sig("......").getAs[Double]("symbol_word_ratio") - 2.0) < 1e-12)
    // trailing newline yields a final empty line (split parity)
    assert(sig("a\n").getAs[Int]("n_lines") == 2)
    // '...' ending mid-doc line counts; '…' alone on a line counts
    val e = sig("stop here...\n…")
    assert(math.abs(e.getAs[Double]("ellipsis_line_frac") - 1.0) < 1e-12)
    // bullet char at end of line (no following space) is NOT a bullet line
    assert(math.abs(sig("-\n- x").getAs[Double]("bullet_line_frac") - 0.5) < 1e-12)
    // required words are matched ASCII case-insensitively as whole tokens
    assert(sig("THE With thatch").getAs[Int]("n_required_words") == 2)
  }

  test("blocklistCount: occurrences, case-insensitive, null semantics") {
    val list = Seq("Bad", "spam")
    val df = Seq(
      (1L, "bad BAD good spam"), // 3 hits (occurrences, both cases)
      (2L, "clean text only"),
      (3L, null)).toDF("id", "t")
    // full-\s tokenization: badwords on their own lines / after tabs match
    val nl = Seq("intro\nbad\tspam\nmore").toDF("t")
      .select(TextAnalysis.blocklistCount(col("t"), list)).head().getInt(0)
    assert(nl == 2)
    // multi-word entries can never match per-token -> rejected up front
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.blocklistCount(col("t"), Seq("bad phrase"))
    }
    assert(e.getMessage.contains("whitespace"))
    val out = df.select(col("id"), TextAnalysis.blocklistCount(col("t"), list).as("n"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 3)
    assert(out(1).getInt(1) == 0)
    assert(out(2).isNullAt(1)) // null-intolerant like built-ins
    // filter: null text keeps, any hit drops at maxRatio 0
    val kept = df.where(TextAnalysis.blocklistFilter(col("t"), list))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("blocklistSignals ratio over the shared whitespace tokenizer") {
    val r = Seq("a spam b spam").toDF("t")
      .select(TextAnalysis.blocklistSignals(col("t"), Seq("spam")).as("s"))
      .select("s.*").head()
    assert(r.getAs[Int]("n_blocked") == 2)
    assert(math.abs(r.getAs[Double]("blocked_ratio") - 0.5) < 1e-12)
  }

  test("blocklistCount stays inside whole-stage codegen") {
    val df = spark.range(3)
      .select(concat(lit("spam word "), col("id")).as("t"))
      .select(TextAnalysis.blocklistCount(col("t"), Seq("spam")).as("n"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.head().getInt(0) == 1)
  }

  test("corpus sketch: split-merge equals whole-corpus sketch, estimate accurate") {
    val docs = spark.range(0, 5000)
      .select(col("id").as("doc_id"),
        concat(lit("doc "), (col("id") % 3000).cast("string")).as("text"))
    val whole = TextAnalysis.corpusSketchStats(
      TextAnalysis.corpusStatsSketch(docs, col("text"))).head()
    // split into two snapshots, sketch each, merge — the incremental path
    val a = TextAnalysis.corpusStatsSketch(docs.where(col("doc_id") < 2000), col("text"))
    val b = TextAnalysis.corpusStatsSketch(docs.where(col("doc_id") >= 2000), col("text"))
    val merged = TextAnalysis.corpusSketchStats(
      TextAnalysis.mergeCorpusSketches(a.unionByName(b))).head()
    // HLL union is register-wise max, but the union path may promote the
    // sketch target type (HLL_4 -> HLL_8), so estimates agree only to well
    // within the configured error, not bit-for-bit
    val wholeEst = whole.getAs[Double]("distinct_texts_est")
    assert(math.abs(merged.getAs[Double]("distinct_texts_est") - wholeEst)
      / wholeEst < 0.01)
    assert(merged.getAs[Long]("n_docs") == 5000L)
    assert(merged.getAs[Long]("n_empty") == 0L)
    // empty-string docs COUNT as a distinct value (prefix injection: raw
    // DataSketches update('') is a no-op and would drop them)
    val withEmpty = TextAnalysis.corpusSketchStats(TextAnalysis.corpusStatsSketch(
      Seq("", "", "a").toDF("text"), col("text"))).head()
    assert(withEmpty.getAs[Double]("distinct_texts_est") == 2.0)
    assert(withEmpty.getAs[Long]("n_empty") == 2L)
    // DataSketches HLL at lgK=14: ~1.6% standard error on 3000 distincts
    val est = merged.getAs[Double]("distinct_texts_est")
    assert(math.abs(est - 3000.0) / 3000.0 < 0.05, est)
    val dup = merged.getAs[Double]("dup_rate_est")
    assert(math.abs(dup - 0.4) < 0.05, dup) // 2000/5000 dups
    // counters stay exact under the split
    assert(merged.getAs[Long]("total_tokens")
      == whole.getAs[Long]("total_tokens"))
  }

  test("corpus sketch ops are gated batch-only under readStream") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("CAST(value AS STRING) AS text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.corpusStatsSketch(stream, col("text"))
    }
    assert(e.getMessage.contains("batch-only"))
  }

  test("gopherSignals stays inside whole-stage codegen") {
    val df = spark.range(4)
      .select(concat(lit("the doc "), col("id")).as("t"))
      .select(TextAnalysis.gopherSignals(col("t")).as("s"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.select("s.n_words").head().getInt(0) == 3)
  }
}
