package graft

import graft.checks.{ContainsIban, ContainsLuhnNumber, Ipv6Valid}
import graft.geo.{WktInfo, WktPairIntersects}
import graft.pipeline.SimHash64
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Exposes graft's custom Catalyst expressions as SQL functions, so
  * `sql_expression` rules (and plain `spark.sql`) can reach them without the
  * Scala API:
  *
  *   spark.sql("SELECT graft_ipv6_valid(addr) FROM t")
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (spark-submit / connect) — the idiomatic SparkSessionExtensions hook;
  *  - `GraftExtensions.register(spark)` on a live session (tests, notebooks).
  *
  * All functions are pure expressions (no UDF round-trip): they stay inside
  * the JVM row pipeline and behave like built-ins under Catalyst.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int, args: Seq[Expression]): Seq[Expression] = {
    require(args.length == n, s"$name expects $n argument(s), got ${args.length}")
    args
  }

  /** (name, info, builder) triples — single source for both registration paths. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_ipv6_valid",
      info("graft_ipv6_valid", "graft_ipv6_valid(str) - true when str is a valid IPv6 address"),
      args => Ipv6Valid(arity("graft_ipv6_valid", 1, args).head)),
    ("graft_simhash64",
      info("graft_simhash64", "graft_simhash64(array<string>) - 64-bit SimHash of the token array"),
      args => SimHash64(arity("graft_simhash64", 1, args).head)),
    ("graft_contains_luhn",
      info("graft_contains_luhn",
        "graft_contains_luhn(str) - true when str contains a Luhn-valid card number"),
      args => ContainsLuhnNumber(arity("graft_contains_luhn", 1, args).head)),
    ("graft_contains_iban",
      info("graft_contains_iban",
        "graft_contains_iban(str) - true when str contains a mod-97-valid IBAN"),
      args => ContainsIban(arity("graft_contains_iban", 1, args).head)),
    ("graft_wkt_info",
      info("graft_wkt_info",
        "graft_wkt_info(wkt) - struct of parsed WKT properties (type, validity, bounds, ...)"),
      args => WktInfo(arity("graft_wkt_info", 1, args).head)),
    ("graft_wkt_intersects",
      info("graft_wkt_intersects",
        "graft_wkt_intersects(wkt_a, wkt_b) - true when the two WKT geometries intersect"),
      args => { val a = arity("graft_wkt_intersects", 2, args); WktPairIntersects(a(0), a(1)) }),
    ("graft_exact_median",
      info("graft_exact_median",
        "graft_exact_median(col[, max_values]) - exact interpolating median " +
          "(primitive-array aggregate, ~5x faster than percentile(col, 0.5) at scale). " +
          "Buffers 8 bytes/value; fails past max_values buffered values per group " +
          s"(default ${graft.checks.ExactMedian.DefaultMaxValues}) - use " +
          "percentile_approx for unbounded groups"),
      args => {
        require(args.length == 1 || args.length == 2,
          s"graft_exact_median expects 1 or 2 argument(s), got ${args.length}")
        val maxValues = if (args.length == 2) {
          val f = args(1)
          require(f.foldable, "graft_exact_median: max_values must be a literal")
          String.valueOf(f.eval()).toLong
        } else graft.checks.ExactMedian.DefaultMaxValues
        graft.checks.ExactMedian(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.DoubleType),
          maxValues).toAggregateExpression()
      }),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes",
        "graft_shingle_hashes(text, n) - distinct 64-bit hashes of the word " +
          "n-gram shingles (fused tokenize+hash; the MinHash sketch input)"),
      args => {
        val a = arity("graft_shingle_hashes", 2, args)
        graft.pipeline.HashedShingles(a(0), foldableInt("graft_shingle_hashes", a(1)))
      }),
    ("graft_shingle_positions",
      info("graft_shingle_positions",
        "graft_shingle_positions(text, n) - generator of (pos, gramhash) rows, " +
          "one per n-word window in document order (exact-substring span dedup input); " +
          "use in LATERAL VIEW"),
      args => {
        val a = arity("graft_shingle_positions", 2, args)
        graft.pipeline.ShinglePositionsExplode(a(0), foldableInt("graft_shingle_positions", a(1)))
      }),
    ("graft_quality_score",
      info("graft_quality_score",
        """graft_quality_score(text, model_json) - sigmoid(bias + sum(weight(token))/n) """ +
          """quality score; model_json is a literal like """ +
          """'{"bias": -0.1, "weights": {"spark": 2.0}}'"""),
      args => {
        val a = arity("graft_quality_score", 2, args)
        require(a(1).foldable, "graft_quality_score: model_json must be a literal")
        graft.pipeline.DictScore(a(0),
          graft.pipeline.QualityModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_bpe_encode",
      info("graft_bpe_encode",
        """graft_bpe_encode(text, model_json) - BPE tokens (array<string>) of the """ +
          """whitespace-lowercased words, merges applied lowest-rank-first; """ +
          """model_json is a literal like '{"merges": [["a","b"], ["ab","c"]]}'"""),
      args => {
        val a = arity("graft_bpe_encode", 2, args)
        require(a(1).foldable, "graft_bpe_encode: model_json must be a literal")
        graft.pipeline.BpeEncode(a(0),
          graft.pipeline.BpeModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_bpe_count",
      info("graft_bpe_count",
        "graft_bpe_count(text, model_json) - BPE token count without materializing the tokens"),
      args => {
        val a = arity("graft_bpe_count", 2, args)
        require(a(1).foldable, "graft_bpe_count: model_json must be a literal")
        graft.pipeline.BpeCount(a(0),
          graft.pipeline.BpeModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_unigram_encode",
      info("graft_unigram_encode",
        """graft_unigram_encode(text, model_json) - unigram-LM (SentencePiece) tokens """ +
          """(array<string>): Viterbi best segmentation per whitespace-lowercased word; """ +
          """model_json is a literal like '{"unk": -20.0, "pieces": {"ab": -1.0}}'"""),
      args => {
        val a = arity("graft_unigram_encode", 2, args)
        require(a(1).foldable, "graft_unigram_encode: model_json must be a literal")
        graft.pipeline.UnigramEncode(a(0),
          graft.pipeline.UnigramModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_unigram_count",
      info("graft_unigram_count",
        "graft_unigram_count(text, model_json) - unigram-LM token count without materializing the tokens"),
      args => {
        val a = arity("graft_unigram_count", 2, args)
        require(a(1).foldable, "graft_unigram_count: model_json must be a literal")
        graft.pipeline.UnigramCount(a(0),
          graft.pipeline.UnigramModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_wordpiece_encode",
      info("graft_wordpiece_encode",
        """graft_wordpiece_encode(text, model_json) - WordPiece tokens (array<string>): """ +
          """greedy longest-match per whitespace-lowercased word, ## continuations, """ +
          """whole-word [UNK]; model_json is a literal like """ +
          """'{"vocab": ["the","##me"], "unk": "[UNK]", "prefix": "##", "max_chars": 200}'"""),
      args => {
        val a = arity("graft_wordpiece_encode", 2, args)
        require(a(1).foldable, "graft_wordpiece_encode: model_json must be a literal")
        graft.pipeline.WordPieceEncode(a(0),
          graft.pipeline.WordPieceModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_wordpiece_count",
      info("graft_wordpiece_count",
        "graft_wordpiece_count(text, model_json) - WordPiece token count without materializing the tokens"),
      args => {
        val a = arity("graft_wordpiece_count", 2, args)
        require(a(1).foldable, "graft_wordpiece_count: model_json must be a literal")
        graft.pipeline.WordPieceCount(a(0),
          graft.pipeline.WordPieceModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_pq_encode",
      info("graft_pq_encode",
        """graft_pq_encode(vec, model_json) - product-quantization codes """ +
          """(array<int>, one per block) of a double-array column; NULL for """ +
          """null/mis-sized input; model_json is a literal like """ +
          """'{"block_dim": 2, "codebooks": [[[1.0,0.0],[0.0,1.0]]]}' (PqModelJson)"""),
      args => {
        val a = arity("graft_pq_encode", 2, args)
        require(a(1).foldable, "graft_pq_encode: model_json must be a literal")
        graft.pipeline.PqEncode(a(0),
          graft.pipeline.PqModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_pq_sdc_dot",
      info("graft_pq_sdc_dot",
        """graft_pq_sdc_dot(codes_a, codes_b, model_json) - symmetric-distance """ +
          """approximate dot product of two PQ code arrays via per-block """ +
          """code-code tables; NULL when either side is malformed"""),
      args => {
        val a = arity("graft_pq_sdc_dot", 3, args)
        require(a(2).foldable, "graft_pq_sdc_dot: model_json must be a literal")
        graft.pipeline.PqSdcDot(a(0), a(1), graft.pipeline.Pq.sdcTables(
          graft.pipeline.PqModelJson.parse(String.valueOf(a(2).eval()))))
      }),
    ("graft_langid",
      info("graft_langid",
        """graft_langid(text, model_json) - predicted language code under a trained """ +
          """char-n-gram NB model; model_json is a literal like """ +
          """'{"n": 3, "docs": {"en": 100}, "grams": {"en": {"the": 40}}}'"""),
      args => {
        val a = arity("graft_langid", 2, args)
        require(a(1).foldable, "graft_langid: model_json must be a literal")
        graft.pipeline.LangIdPredict(a(0),
          graft.pipeline.LangIdModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_lm_perplexity",
      info("graft_lm_perplexity",
        """graft_lm_perplexity(text, model_json) - add-k bigram LM perplexity """ +
          """exp(-mean ln P(w|v)) (null below 2 tokens); model_json is a literal like """ +
          """'{"k": 0.5, "unigrams": {"the": 100, "<unk>": 850}, "bigrams": {"the table": 20}}'"""),
      args => {
        val a = arity("graft_lm_perplexity", 2, args)
        require(a(1).foldable, "graft_lm_perplexity: model_json must be a literal")
        graft.pipeline.LmPerplexity(a(0),
          graft.pipeline.LmModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_dsir_score",
      info("graft_dsir_score",
        """graft_dsir_score(text, model_json) - DSIR mean log importance ratio """ +
          """of the text's word bigrams (null below 2 tokens); model_json is a literal like """ +
          """'{"k": 1.0, "target_counts": {"the table": 30}, "raw_counts": {"the table": 10}, """ +
          """"target_total": 40, "raw_total": 1000, "target_oov": 8, "raw_oov": 950}'"""),
      args => {
        val a = arity("graft_dsir_score", 2, args)
        require(a(1).foldable, "graft_dsir_score: model_json must be a literal")
        graft.pipeline.DsirScore(a(0),
          graft.pipeline.DsirModelJson.parse(String.valueOf(a(1).eval())))
      }),
    ("graft_strip_markup",
      info("graft_strip_markup",
        "graft_strip_markup(html) - visible text: script/style/comment blocks and tags " +
          "removed, common entities decoded, whitespace collapsed"),
      args => graft.pipeline.StripMarkup(
        org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
          arity("graft_strip_markup", 1, args).head,
          org.apache.spark.sql.catalyst.expressions.Literal(""))))),
    ("graft_char_entropy",
      info("graft_char_entropy",
        "graft_char_entropy(str) - Shannon entropy (nats) of the code-point " +
          "distribution (repeated-char spam ~0, encoded junk high)"),
      args => graft.pipeline.CharEntropy(arity("graft_char_entropy", 1, args).head)),
    ("graft_ner_entities",
      info("graft_ner_entities",
        "graft_ner_entities(text[, engine_fqcn]) - entity types the NER engine finds " +
          "(array<string>, empty = clean); default engine is the shipped gazetteer " +
          "(PERSON/ORG/LOC/ADDRESS, cased + uncased passes); pass a literal FQCN with " +
          "a zero-arg constructor to plug a model-backed NerEngine"),
      args => {
        require(args.length == 1 || args.length == 2,
          s"graft_ner_entities expects 1 or 2 argument(s), got ${args.length}")
        val engine: graft.checks.NerEngine = if (args.length == 2) {
          require(args(1).foldable, "graft_ner_entities: engine_fqcn must be a literal")
          Class.forName(String.valueOf(args(1).eval()))
            .getDeclaredConstructor().newInstance().asInstanceOf[graft.checks.NerEngine]
        } else new graft.checks.GazetteerNerEngine()
        graft.checks.NerDetect(args.head, engine)
      })
  )

  private def foldableInt(fn: String, e: Expression): Int = {
    require(e.foldable, s"$fn: n must be a literal")
    String.valueOf(e.eval()).toInt
  }

  /** Register on a live session (same registry the extensions path fills). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
