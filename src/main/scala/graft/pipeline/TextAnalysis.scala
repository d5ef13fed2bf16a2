package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, and document fingerprinting.
  * All pure Catalyst expressions — row-local, codegen'd, no shuffle.
  */
object TextAnalysis {

  /** Whitespace-delimited token count. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish token estimate: GPT-2-style pre-tokenizer regex (contractions,
    * letter runs, digit runs, punctuation runs, whitespace). A deterministic
    * upper-ish bound on BPE token count without a merges table.
    */
  def bpeTokenEstimate(text: Column): Column =
    size(regexp_extract_all(text,
      lit("'(?:s|d|m|t|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"), lit(0)))

  /** Quality-signal struct: char/token counts plus punctuation, digit,
    * uppercase, whitespace and stopword ratios, mean word length — the usual
    * Gopher/C4-style filters' raw inputs.
    */
  def qualitysignals(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    // One codegen'd pass (QualitySignals kernel) replacing four
    // regexp_extract_all match-array materializations plus a CodegenFallback
    // stopword-filter HOF per row. Value parity with that formulation
    // (incl. the regex split's kept leading/trailing empty segments and the
    // null-text struct-of-nulls contract) is pinned in TextQualitySpec.
    val k = GraftColumnBridge.column(QualitySignals(GraftColumnBridge.expression(text)))
    val nullStruct = struct(
      lit(null).cast("int").as("n_chars"), lit(null).cast("int").as("n_tokens"),
      lit(null).cast("int").as("n_punct"), lit(null).cast("int").as("n_digits"),
      lit(null).cast("int").as("n_upper"), lit(null).cast("int").as("n_stopwords"),
      lit(null).cast("double").as("punct_ratio"),
      lit(null).cast("double").as("stopword_ratio"),
      lit(null).cast("double").as("mean_word_len"))
    when(text.isNull, nullStruct).otherwise(k)
  }

  /** Gopher-style keep/drop quality decision from the raw signals. */
  def qualityFilter(text: Column, minTokens: Int = 5, maxTokens: Int = 100000,
                    maxPunctRatio: Double = 0.3, minStopwordRatio: Double = 0.0): Column = {
    val s = qualitysignals(text)
    s.getField("n_tokens").between(minTokens, maxTokens) &&
      s.getField("punct_ratio") <= maxPunctRatio &&
      s.getField("stopword_ratio") >= minStopwordRatio
  }

  /** Stopword-ratio language identification over a small registry of
    * high-frequency function words. Returns the ISO 639-1 code of the language
    * with the highest distinct-stopword hit count, 'und' (undetermined) when no
    * stopwords hit. Deterministic tie-break: registry order.
    */
  def languageId(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    // One codegen'd pass (LangIdScore kernel): distinct lowercased tokens
    // checked against every language's stopword set in one token loop. The
    // Column formulation it replaces allocated one array_intersect result
    // per LANGUAGE per row (~90 µs/row measured). Semantics preserved:
    // distinct-stopword hit counts, winner = first registry language with
    // the maximal positive score, 'und' otherwise (incl. null text).
    val k = GraftColumnBridge.column(StopwordLangId(GraftColumnBridge.expression(text)))
    when(text.isNull, lit("und")).otherwise(k)
  }

  /** Word n-grams (all occurrences, not distinct) — the unit the repetition
    * fractions count over. Empty array below n tokens. Row-local.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val t = split(text, " ")
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition signals: fraction of words/n-grams that are
    * repeat occurrences, and the share of the single most frequent word.
    * High values = boilerplate/spam/generated text. All row-local expressions.
    */
  def repetitionSignals(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    // One codegen'd pass (RepetitionStats kernel). The HOF formulation it
    // replaces was worse than CodegenFallback: top_word_frac evaluated
    // `size(filter(t, _ === w))` for EVERY distinct word — O(distinct x
    // tokens) interpreted lambda calls per document, quadratic on long docs
    // (a 1k-token page paid ~1M interpreted evals). Value parity incl. the
    // empty-segment tokenization of split(text, " ") is pinned in
    // TextQualitySpec. Null text keeps the old when/otherwise contract:
    // all-zero signals.
    val zero = struct(
      lit(0.0).as("dup_word_frac"), lit(0.0).as("top_word_frac"),
      lit(0.0).as("dup_2gram_frac"), lit(0.0).as("dup_3gram_frac"))
    val k = GraftColumnBridge.column(RepetitionStats(GraftColumnBridge.expression(text)))
    when(text.isNull, zero).otherwise(k)
  }

  /** Keep/drop decision from the repetition signals (Gopher table A1-style
    * thresholds as defaults).
    */
  def repetitionFilter(text: Column, maxDupWordFrac: Double = 0.63,
                       maxTopWordFrac: Double = 0.3,
                       maxDup2GramFrac: Double = 0.2,
                       maxDup3GramFrac: Double = 0.18): Column = {
    val s = repetitionSignals(text)
    s.getField("dup_word_frac") <= maxDupWordFrac &&
      s.getField("top_word_frac") <= maxTopWordFrac &&
      s.getField("dup_2gram_frac") <= maxDup2GramFrac &&
      s.getField("dup_3gram_frac") <= maxDup3GramFrac
  }

  /** One [[C4Stats]] kernel eval per row computes every C4 signal AND the
    * cleaned page (CSE shares it across [[c4Signals]]/[[c4Keep]]/
    * [[c4CleanedText]] in one projection). Replaces the per-line interpreted
    * lambdas (`filter(lines, kept)` / `exists(lines, ...)`) that re-walked
    * the line array once per signal — value parity with the replaced Column
    * formulation (incl. the `rlike` `$`-before-final-terminator subtlety,
    * Spark `trim`'s space-only semantics, and `\s+`-split empty-segment
    * counting) is pinned in TextQualitySpec.
    */
  private def c4Stats(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(C4Stats(
      GraftColumnBridge.expression(coalesce(text, lit("")))))
  }

  /** C4-style row-local page/line heuristics (the public C4 cleaning rules:
    * keep lines ending in terminal punctuation with >= 3 words, drop
    * javascript-warning lines, flag lorem-ipsum placeholder text and code
    * braces, require a minimum sentence count per page). Returns a struct of
    * the signals; [[c4Keep]] folds them into the keep/drop decision and
    * [[c4CleanedText]] rebuilds the page from surviving lines. All row-local
    * — free riders on the scan at any scale. (The remaining C4 rule,
    * corpus-global three-sentence-span dedup, is [[Dedup.dedupLines]]'
    * territory.)
    */
  def c4Signals(text: Column): Column = {
    val k = c4Stats(text)
    struct(
      k.getField("n_lines").as("n_lines"),
      k.getField("n_kept_lines").as("n_kept_lines"),
      k.getField("n_sentences").as("n_sentences"),
      k.getField("has_lorem_ipsum").as("has_lorem_ipsum"),
      k.getField("has_curly_brace").as("has_curly_brace"),
      k.getField("has_javascript_line").as("has_javascript_line"))
  }

  /** C4 page keep/drop: enough sentences after line cleaning, no placeholder
    * text, no code braces.
    */
  def c4Keep(text: Column, minSentences: Int = 5): Column = {
    val k = c4Stats(text)
    k.getField("n_sentences") >= minSentences &&
      !k.getField("has_lorem_ipsum") && !k.getField("has_curly_brace")
  }

  /** The page rebuilt from only the lines that survive C4 line cleaning. */
  def c4CleanedText(text: Column): Column =
    c4Stats(text).getField("cleaned")

  /** Strip HTML/markup down to visible text: script/style blocks and
    * comments removed whole, remaining tags replaced by spaces (so adjacent
    * words never fuse), the six common entities decoded AFTER tag removal
    * (decoded `&lt;b&gt;` is content, not markup), whitespace collapsed and
    * trimmed. Pure regexp/replace chain — row-local, codegen'd, a free rider
    * on the scan at any scale. Patterns stay inside the RE2 subset (no
    * backreferences) so the DuckDB oracle replays them verbatim.
    */
  def stripMarkup(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(StripMarkup(
      GraftColumnBridge.expression(coalesce(text, lit("")))))
  }

  /** Canonical text normalization: lowercase, control chars to spaces,
    * whitespace collapsed, trimmed. Row-local; the standard first step before
    * fingerprinting/sharding a raw crawl.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[\\p{Cntrl}]", " "), "\\s+", " "))

  /** Split documents into fixed-size token chunks with overlap (training-
    * sequence packing). Output: one row per chunk with `chunk_id` (0-based
    * position) and `chunk_text`. Chunk starts step by chunkSize - overlap;
    * a document shorter than chunkSize yields exactly one chunk. Row-local
    * explode — no shuffle; downstream repartition is the caller's choice.
    */
  def chunkDocuments(df: DataFrame, textCol: String, chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize > 0 and 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val t = split(col(textCol), " ")
    // k-th start = 1 + k*stride for k = 0..K, K = ceil((#tokens - chunkSize)/stride):
    // the last chunk reaches the final token and no chunk is a suffix of the
    // previous one (the tail chunk may be shorter than chunkSize)
    val steps = when(size(t) > chunkSize,
      ceil((size(t) - lit(chunkSize)).cast("double") / stride).cast("int"))
      .otherwise(lit(0))
    val chunks = transform(
      sequence(lit(1), lit(1) + steps * stride, lit(stride)),
      s => concat_ws(" ", slice(t, s, lit(chunkSize))))
    df.select(col("*"), posexplode(chunks).as(Seq("chunk_id", "chunk_text")))
  }

  /** Corpus document frequency: for each word, the number of documents
    * containing it. One shuffle (partial-aggregated groupBy on the word);
    * per-doc distinct is row-local, so a word repeated in one doc contributes
    * once. The input to IDF weighting and stopword discovery.
    */
  def documentFrequency(df: DataFrame, text: Column): DataFrame = {
    PipelineGuards.requireBatch(df, "documentFrequency")
    df.select(explode(array_distinct(split(text, " "))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("doc_freq"))
  }

  /** Lowercased whitespace word tokens, empty tokens dropped — the SINGLE
    * Column-side tokenizer shared by Search.bm25TopK, QualityClassifier's
    * vocabulary, and corpusStats (and mirrored byte-for-byte by the JVM-side
    * QualityClassifier.tokenize), so scoring/vocab/oracle parity cannot
    * drift between call sites.
    */
  def wsTokens(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WsTokens(
      GraftColumnBridge.expression(coalesce(text, lit("")))))
  }

  /** Word bigrams ("v w") over a token array in one codegen'd pass: the
    * `transform(sequence(1, size-1), i => concat_ws(" ", t[i], t[i+1]))`
    * formulation it replaces was CodegenFallback twice over (transform +
    * element_at lambdas), measured ~5 µs/bigram interpreted — the dominant
    * CPU of Dsir.train's raw-corpus pass. Fewer than 2 tokens → empty array
    * (the when/otherwise contract of the old formulation).
    */
  def wordBigrams(tokens: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordBigrams(GraftColumnBridge.expression(tokens)))
  }

  /** One-row corpus summary — the first look at a new text corpus: document
    * and token counts, exact token-length percentiles, empty-doc and exact-
    * duplicate rates. ONE aggregation pass (token counting is row-local); the
    * distinct-text count is the only term carrying text into the shuffle —
    * swap `approx_count_distinct` in for it at the 100 TB scale where exact
    * distinct is not worth a text-keyed shuffle.
    */
  def corpusStats(df: DataFrame, text: Column): DataFrame = {
    PipelineGuards.requireBatch(df, "corpusStats")
    val toks = wsTokens(text)
    df.select(size(toks).as("__nt"),
        (text.isNull || length(text) === 0).as("__empty"),
        text.as("__text"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__nt").as("total_tokens"),
        round(avg("__nt"), 4).as("avg_tokens"),
        expr("percentile(__nt, 0.5)").as("p50_tokens"),
        round(expr("percentile(__nt, 0.95)"), 4).as("p95_tokens"),
        sum(when(col("__empty"), 1L).otherwise(0L)).as("n_empty"),
        count_distinct(col("__text")).as("n_distinct_texts"))
  }

  /** MERGEABLE corpus-stats sketch — the incremental/cross-snapshot form of
    * [[corpusStats]]. One output row per call: exact additive counters
    * (docs, tokens, chars, empties) plus an Apache DataSketches HLL sketch
    * of the distinct texts (`hll_sketch_agg`, Spark built-in). Store one row
    * per snapshot/shard/day; [[mergeCorpusSketches]] collapses ANY window of
    * rows back into the same schema and [[corpusSketchStats]] renders the
    * readable stats (distinct-text estimate, dup rate).
    *
    * Why it matters at 100 TB: [[corpusStats]]' `count_distinct(text)` is a
    * full text-keyed shuffle of the corpus, re-paid per report. Here
    * yesterday's corpus is ONE ROW — the daily report unions k sketch rows
    * (HLL register-wise max: associative, order-insensitive; the union path may
    * promote the sketch target type, so estimates can differ from a
    * single-pass sketch by far less than the configured error),
    * and the only corpus-sized work is the day's own one-pass scan.
    * Estimates carry DataSketches' standard ~1.6%/sqrt(2^lgK) error.
    */
  def corpusStatsSketch(df: DataFrame, text: Column, lgK: Int = 14): DataFrame = {
    PipelineGuards.requireBatch(df, "corpusStatsSketch")
    val toks = wsTokens(text)
    df.select(size(toks).as("__nt"),
        (text.isNull || length(text) === 0).as("__empty"),
        text.as("__text"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__nt").as("total_tokens"),
        sum(length(coalesce(col("__text"), lit("")))).as("total_chars"),
        sum(when(col("__empty"), 1L).otherwise(0L)).as("n_empty"),
        // fixed-prefix injection: DataSketches' update is a NO-OP on the
        // empty string, which would silently exclude empty docs from the
        // distinct estimate (corpusStats' count_distinct counts ''). The
        // prefix keeps every value non-empty and distinct-preserving;
        // null stays null (count_distinct skips nulls too).
        hll_sketch_agg(concat(lit("\u0001"), col("__text")), lit(lgK)).as("text_sketch"))
  }

  /** Union any number of [[corpusStatsSketch]] rows into one row of the same
    * schema: counters add, sketches union register-wise. Associative and
    * order-insensitive, so daily rows roll up into weekly/monthly rows that
    * keep merging.
    */
  def mergeCorpusSketches(sketches: DataFrame): DataFrame =
    sketches.agg(
      sum("n_docs").as("n_docs"),
      sum("total_tokens").as("total_tokens"),
      sum("total_chars").as("total_chars"),
      sum("n_empty").as("n_empty"),
      hll_union_agg(col("text_sketch"), true).as("text_sketch"))

  /** Render a sketch row (from [[corpusStatsSketch]] or
    * [[mergeCorpusSketches]]) into readable stats; `dup_rate_est` is the
    * exact-duplicate share implied by the distinct-text estimate.
    */
  def corpusSketchStats(sketchRow: DataFrame): DataFrame =
    sketchRow.select(
      col("n_docs"), col("total_tokens"), col("total_chars"), col("n_empty"),
      hll_sketch_estimate(col("text_sketch")).cast("double").as("distinct_texts_est"),
      round(lit(1.0) - hll_sketch_estimate(col("text_sketch")).cast("double") /
        greatest(col("n_docs"), lit(1L)).cast("double"), 6).as("dup_rate_est"))

  /** 64-bit content fingerprint over normalized text (lowercase, collapsed
    * whitespace, punctuation stripped) — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(regexp_replace(lower(text), "[\\p{Punct}]", ""), "\\s+", " "))

  /** MinHash-based fuzzy fingerprint: min of seeded hashes over word 3-grams
    * (equal fingerprints => likely near-identical prefix content).
    *
    * NULL text yields NULL (intentional since the r5 codegen rewrite; the
    * pre-r5 expression degenerated NULL to `xxhash64("")`, silently matching
    * NULL-text docs with each other). `coalesce(text, lit(""))` upstream
    * restores the old behavior if a non-null fingerprint is required.
    */
  def fuzzyFingerprint(text: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    // codegen'd single-pass shingle hashing; min over the (distinct) hash set
    // equals min over transform(shingles, xxhash64) — dedupe can't change it
    array_min(GraftColumnBridge.column(graft.pipeline.HashedShingles(
      GraftColumnBridge.expression(text), n)))
  }

  /** Flesch readability signals: word/sentence/syllable counts (syllables ≈
    * vowel groups — the standard public heuristic) plus Flesch-Kincaid grade
    * and Flesch reading-ease. Three `regexp_extract_all` passes over the
    * whole text — no per-word HOF loop, so the projection stays inside
    * whole-stage codegen. Sentence and word floors of 1 keep empty docs
    * finite. Ratios rounded to 4 dp (oracle parity).
    */
  def readabilitySignals(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val words = size(regexp_extract_all(t, lit("\\S+"), lit(0)))
    val sentences = greatest(size(regexp_extract_all(t, lit("[.!?]+"), lit(0))), lit(1))
    val syllables = size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
    val w = greatest(words, lit(1)).cast("double")
    val wps = words.cast("double") / sentences.cast("double")
    val spw = syllables.cast("double") / w
    struct(
      words.as("n_words"),
      sentences.as("n_sentences"),
      syllables.as("n_syllables"),
      round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4).as("fk_grade"),
      round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4).as("flesch_ease"))
  }

  /** Top-`k` TF-IDF keywords per document: `score = tf * ln(N / df)`,
    * deterministic ordering (score desc, term asc). Output
    * (`idCol`, rank, term, tf, df); docs with no tokens emit no rows.
    *
    * Scale shape: the (doc, term) tf aggregation (partial-agg), document
    * frequency as a `groupBy(term)` + join-back — NOT a term-partition
    * window: stop-word terms make the window's hot partitions un-splittable,
    * while the join's agg side partial-aggregates to one row per term per
    * partition and AQE's skew-join splits any hot term on the probe side —
    * then the per-doc top-k window (doc-keyed, naturally balanced). N rides
    * in as a broadcast 1-row aggregate.
    */
  def tfIdfKeywords(df: DataFrame, idCol: String, text: Column, k: Int = 3): DataFrame = {
    PipelineGuards.requireBatch(df, "tfIdfKeywords")
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol), explode(wsTokens(text)).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val termDf = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val withDf = tf.join(termDf, Seq("term"))
    val n = broadcast(df.agg(count(lit(1)).as("__n")))
    val scored = withDf.crossJoin(n)
      .withColumn("__score", col("tf") * log(col("__n").cast("double") / col("df")))
    val ranked = scored.withColumn("rank",
      row_number().over(Window.partitionBy(idCol)
        .orderBy(col("__score").desc, col("term"))).cast("int"))
    ranked.where(col("rank") <= k).select(col(idCol), col("rank"), col("term"),
      col("tf"), col("df"))
  }

  /** Shannon entropy (nats) of the character distribution — the Dolma/
    * RefinedWeb-style "compressibility" quality signal: near-zero entropy
    * flags repeated-character spam, unusually high entropy flags binary/
    * encoded junk. Codegen'd row-local custom expression ([[CharEntropy]]);
    * terms summed over code points in ASCENDING code-point order so the
    * DuckDB oracle's sorted-list replay is bit-compatible. Empty text scores
    * 0.0; null stays null.
    */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(CharEntropy(GraftColumnBridge.expression(text)))
  }

  /** Number of whitespace-delimited tokens (case-folded, Locale.ROOT) that
    * appear in `words` — occurrences, not distinct hits. Tokens split on the
    * FULL `\\s` set (newlines/tabs included — a badword on its own line must
    * still match, Gopher-kernel word convention). The blocklist ships as a
    * codegen reference object ([[Blocklist]]), so a large word list neither
    * bloats the generated code nor de-codegens the projection (the
    * `size(filter(...))` HOF alternative is CodegenFallback). Row-local.
    */
  def blocklistCount(text: Column, words: Seq[String]): Column =
    blocklistSignals(text, words).getField("n_blocked")

  /** Blocklist signals: occurrence count and token-share of blocklisted
    * words (the C4 "bad words" page-filter inputs). BOTH fields come from
    * one [[BlocklistCounts]] kernel scan — no second tokenize pass, no HOF
    * in the denominator.
    */
  def blocklistSignals(text: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val c = GraftColumnBridge.column(BlocklistCounts(
      GraftColumnBridge.expression(text), Blocklist.of(words)))
    struct(
      c.getField("n_blocked").as("n_blocked"),
      (c.getField("n_blocked").cast("double") /
        greatest(c.getField("n_tokens"), lit(1))).as("blocked_ratio"))
  }

  /** Keep rows whose blocklisted-token share is at most `maxRatio`
    * (C4 drops any page containing one — the default). Null text keeps
    * (no tokens, no blocked tokens).
    */
  def blocklistFilter(text: Column, words: Seq[String], maxRatio: Double = 0.0): Column =
    blocklistSignals(coalesce(text, lit("")), words).getField("blocked_ratio") <= maxRatio

  /** The Gopher "required word" set (Rae et al. 2021, Appendix A1): a page
    * must contain at least 2 of these to count as natural English prose.
    */
  val GopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-quality signals (Rae et al. 2021, Appendix A1) that
    * [[qualitysignals]] does not already carry: symbol-to-word ratio (`#` and
    * ellipsis), bullet-line and ellipsis-ending-line fractions, the fraction
    * of words containing at least one alphabetic character, and the
    * required-word presence count. All nine fields come from ONE codegen'd,
    * allocation-free text scan ([[GopherCounts]]) — the declarative
    * formulation (six `regexp_extract_all` passes each materializing a match
    * array) measured ~8x slower at 1M docs for identical semantics.
    *
    * Words are whitespace runs (`\S+`), lines are `\n`-separated — the same
    * conventions as the rest of this module. Ratios are raw doubles; gate
    * queries round them. (The duplicate-n-gram half of Gopher's table is
    * [[repetitionSignals]]; word-count and mean-word-length bounds fold into
    * [[gopherFilter]] below.)
    */
  def gopherSignals(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(GopherCounts(
      GraftColumnBridge.expression(coalesce(text, lit("")))))
  }

  /** The full published Gopher keep/drop rule (Rae et al. 2021 Appendix A1
    * thresholds as defaults): word-count and mean-word-length bounds,
    * symbol-to-word ratio, bullet/ellipsis line fractions, alpha-word
    * fraction, and the required-word minimum. AND this with
    * [[repetitionFilter]] for the complete Gopher table (the duplicate-n-gram
    * rules live there). Row-local boolean — usable as a filter predicate or a
    * [[graft.rules.DQRowRule]] check column.
    */
  def gopherFilter(text: Column, minWords: Int = 50, maxWords: Int = 100000,
                   minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                   maxSymbolWordRatio: Double = 0.1,
                   maxBulletLineFrac: Double = 0.9,
                   maxEllipsisLineFrac: Double = 0.3,
                   minAlphaWordFrac: Double = 0.8,
                   minRequiredWords: Int = 2): Column = {
    // ONE boolean kernel, not a 7-conjunct And over getFields: FilterExec
    // splits conjuncts and codegens each independently (no cross-conjunct
    // subexpression elimination), which would re-run the counting scan per
    // rule — up to 7 text scans per row
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(GopherKeep(
      GraftColumnBridge.expression(coalesce(text, lit(""))),
      GopherThresholds(minWords, maxWords, minMeanWordLen, maxMeanWordLen,
        maxSymbolWordRatio, maxBulletLineFrac, maxEllipsisLineFrac,
        minAlphaWordFrac, minRequiredWords)))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "but", "if", "of", "to", "in", "on", "at", "by", "for",
    "with", "about", "as", "is", "are", "was", "were", "be", "been", "being", "it", "its",
    "this", "that", "these", "those", "he", "she", "they", "we", "you", "i", "not", "no",
    "do", "does", "did", "have", "has", "had", "will", "would", "can", "could", "from")

  /** lang -> high-frequency function words (public linguistic data). */
  val LanguageStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "on", "are", "with", "as", "at"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf", "für", "von", "zu", "den", "im"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "dans", "pour", "que", "qui", "sur", "avec"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "en", "que", "por", "para", "con", "no"),
    "it" -> Seq("il", "la", "le", "e", "è", "un", "una", "di", "che", "per", "con", "non", "sono", "della", "nel"),
    "pt" -> Seq("o", "a", "os", "as", "e", "é", "um", "uma", "de", "em", "que", "por", "para", "com", "não"),
    "nl" -> Seq("de", "het", "een", "en", "is", "van", "op", "dat", "met", "voor", "niet", "zijn", "aan", "bij", "ook"))
}

/** Static kernel for [[GopherCounts]]: every Gopher signal in one
  * allocation-free scan, reproducing EXACTLY the declarative semantics the
  * oracle replays closed-form:
  *
  *  - words = `\S+` runs; alpha words = runs containing a Unicode letter
  *  - symbols = leftmost-first non-overlapping `#` / `...` / `…` occurrences
  *  - lines = `\n`-separated (a trailing `\n` yields a final empty line,
  *    matching `split`); bullet lines match `^[ \t]*[-*•‣▪][ \t]`; ellipsis
  *    lines end with `...` or `…` before optional trailing blanks
  *  - required words = DISTINCT whitespace tokens equal (ASCII
  *    case-insensitively) to one of [[TextAnalysis.GopherRequiredWords]]
  *  - mean word length = non-whitespace CODE POINTS / max(words, 1)
  *    (code points, not UTF-16 units — `length()` parity)
  *
  * Whitespace is the Java regex `\s` set. Ratios divide by max(n, 1).
  */
object GopherOps {
  private val Required: Array[String] = TextAnalysis.GopherRequiredWords.toArray

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isBulletChar(c: Char): Boolean =
    c == '-' || c == '*' || c == '•' || c == '‣' || c == '▪'

  def counts(u: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = u.toString
    val len = s.length
    var nWords = 0
    var nAlpha = 0
    var nonSpaceCp = 0
    var requiredMask = 0
    // ---- words / alpha words / required words / non-space code points
    var i = 0
    var inWord = false
    var wordHasLetter = false
    val tokBuf = new Array[Char](5)
    var tokLen = 0 // -1 = token longer than any required word
    def endWord(): Unit = if (inWord) {
      nWords += 1
      if (wordHasLetter) nAlpha += 1
      if (tokLen > 0) {
        var w = 0
        while (w < Required.length) {
          val r = Required(w)
          if (r.length == tokLen) {
            var k = 0
            var ok = true
            while (ok && k < tokLen) {
              val c = Character.toLowerCase(tokBuf(k))
              if (c != r.charAt(k)) ok = false
              k += 1
            }
            if (ok) requiredMask |= 1 << w
          }
          w += 1
        }
      }
      inWord = false; wordHasLetter = false; tokLen = 0
    }
    while (i < len) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      if (cc == 1 && isWs(s.charAt(i))) endWord()
      else {
        nonSpaceCp += 1
        if (!inWord) { inWord = true; wordHasLetter = false; tokLen = 0 }
        if (!wordHasLetter && Character.isLetter(cp)) wordHasLetter = true
        if (tokLen >= 0) {
          if (tokLen >= 4 || cc > 1) tokLen = -1
          else { tokBuf(tokLen) = s.charAt(i); tokLen += 1 }
        }
      }
      i += cc
    }
    endWord()
    // ---- symbols: leftmost-first '#' | '...' | '…'
    var nSymbols = 0
    i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c == '#' || c == '…') { nSymbols += 1; i += 1 }
      else if (c == '.' && i + 2 < len && s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') {
        nSymbols += 1; i += 3
      } else i += 1
    }
    // ---- lines / bullet lines / ellipsis-ending lines
    var nLines = 0
    var nBullet = 0
    var nEllipsis = 0
    var lineStart = 0
    def scanLine(from: Int, to: Int): Unit = {
      nLines += 1
      var p = from
      while (p < to && (s.charAt(p) == ' ' || s.charAt(p) == '\t')) p += 1
      if (p + 1 < to && isBulletChar(s.charAt(p)) &&
        (s.charAt(p + 1) == ' ' || s.charAt(p + 1) == '\t')) nBullet += 1
      var q = to
      while (q > from && (s.charAt(q - 1) == ' ' || s.charAt(q - 1) == '\t')) q -= 1
      if (q > from && s.charAt(q - 1) == '…') nEllipsis += 1
      else if (q - from >= 3 && s.charAt(q - 1) == '.' && s.charAt(q - 2) == '.' &&
        s.charAt(q - 3) == '.') nEllipsis += 1
    }
    i = 0
    while (i < len) {
      if (s.charAt(i) == '\n') { scanLine(lineStart, i); lineStart = i + 1 }
      i += 1
    }
    scanLine(lineStart, len)
    val wDen = math.max(nWords, 1).toDouble
    val lDen = math.max(nLines, 1).toDouble
    org.apache.spark.sql.catalyst.InternalRow(
      nWords, nAlpha,
      nAlpha / wDen,
      nonSpaceCp / wDen,
      nSymbols / wDen,
      nLines,
      nBullet / lDen,
      nEllipsis / lDen,
      java.lang.Integer.bitCount(requiredMask))
  }

  /** One-scan keep decision: the counting kernel once, then the threshold
    * comparisons on its fields (identical arithmetic to the struct path).
    */
  def keep(t: GopherThresholds, u: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val r = counts(u)
    val nWords = r.getInt(0)
    nWords >= t.minWords && nWords <= t.maxWords &&
      r.getDouble(3) >= t.minMeanWordLen && r.getDouble(3) <= t.maxMeanWordLen &&
      r.getDouble(4) <= t.maxSymbolWordRatio &&
      r.getDouble(6) <= t.maxBulletLineFrac &&
      r.getDouble(7) <= t.maxEllipsisLineFrac &&
      r.getDouble(2) >= t.minAlphaWordFrac &&
      r.getInt(8) >= t.minRequiredWords
  }
}

/** All Gopher signals as one struct from one scan — see
  * [[TextAnalysis.gopherSignals]].
  */
case class GopherCounts(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType = GopherCounts.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gopher_signals requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    GopherOps.counts(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.GopherOps.counts($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): GopherCounts = copy(child = c)
}

object GopherCounts {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_alpha_words", IntegerType, nullable = false),
    StructField("alpha_word_frac", DoubleType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_word_ratio", DoubleType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("n_required_words", IntegerType, nullable = false)))
}

/** Threshold bundle for [[GopherKeep]] — a codegen reference object so the
  * generated call site stays a single static invocation.
  */
final case class GopherThresholds(minWords: Int, maxWords: Int,
                                  minMeanWordLen: Double, maxMeanWordLen: Double,
                                  maxSymbolWordRatio: Double,
                                  maxBulletLineFrac: Double,
                                  maxEllipsisLineFrac: Double,
                                  minAlphaWordFrac: Double,
                                  minRequiredWords: Int)

/** The whole Gopher keep/drop decision as ONE boolean kernel call — the
  * counting scan runs once per row no matter how Catalyst splits the
  * filter. Threshold comparisons replicate [[TextAnalysis.gopherFilter]]'s
  * documented arithmetic exactly (same ratio expressions, inclusive
  * bounds).
  */
case class GopherKeep(child: org.apache.spark.sql.catalyst.expressions.Expression,
                      thresholds: GopherThresholds)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gopher_keep requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    GopherOps.keep(thresholds, v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("gopherThresholds", thresholds,
      classOf[GopherThresholds].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.GopherOps.keep($ref, $c)")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): GopherKeep = copy(child = c)
}

/** A blocklist as a codegen reference object. Words are stored case-folded
  * (Locale.ROOT) so matching is case-insensitive regardless of how the
  * caller spelled the list. Matching is PER TOKEN — multi-word entries can
  * never match and are rejected up front rather than silently ignored.
  * (Top-level class: it rides into generated code.)
  */
final case class Blocklist(words: Set[String])

object Blocklist {
  def of(words: Seq[String]): Blocklist = {
    val bad = words.filter(_.exists(Character.isWhitespace))
    require(bad.isEmpty,
      s"blocklist entries are matched per whitespace token; these contain " +
        s"whitespace and could never match: ${bad.take(5).mkString("'", "', '", "'")}" +
        " — split phrases into single-token entries or use a regex filter")
    Blocklist(words.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
  }
}

/** Static kernel for [[BlocklistCounts]]: ONE scan over the text splitting
  * on the full `\\s` whitespace set (the Gopher-kernel word convention —
  * newline- and tab-delimited badwords match), each token case-folded
  * (Locale.ROOT) and probed against the set. Emits (n_blocked, n_tokens)
  * so the ratio needs no second tokenize pass.
  */
object BlocklistOps {
  def counts(list: Blocklist, u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val s = u.toString
    var nTokens = 0
    var nBlocked = 0
    var i = 0
    val len = s.length
    while (i < len) {
      // skip whitespace (the Java regex \\s set)
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        nTokens += 1
        val tok = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
        if (list.words.contains(tok)) nBlocked += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(nBlocked, nTokens)
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

/** Blocklisted-token and total-token counts in one scan — see
  * [[TextAnalysis.blocklistSignals]].
  */
case class BlocklistCounts(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    list: Blocklist)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType = BlocklistCounts.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"blocklist_counts requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    BlocklistOps.counts(list, v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("blocklist", list, classOf[Blocklist].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.BlocklistOps.counts($ref, $c)")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): BlocklistCounts = copy(child = c)
}

object BlocklistCounts {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("n_blocked", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))
}

/** Static kernel for [[CharEntropy]]: code-point counts via a sorted map,
  * -Σ p ln p accumulated in ascending code-point order (the defined order the
  * oracle replays with a sorted list).
  */
object CharEntropyOps {
  def entropy(u: org.apache.spark.unsafe.types.UTF8String): Double = {
    val s = u.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * math.log(p)
    }
    h
  }
}

/** Character-distribution Shannon entropy in nats — see
  * [[TextAnalysis.charEntropy]].
  */
case class CharEntropy(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    CharEntropyOps.entropy(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.CharEntropyOps.entropy($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): CharEntropy = copy(child = c)
}

/** Static kernel for [[StripMarkup]]: the same regex chain the DuckDB oracle
  * expects (RE2-subset patterns, entities decoded after tag removal with
  * `&amp;` last), precompiled once per JVM.
  */
object StripMarkupOps {
  private val Script =
    java.util.regex.Pattern.compile("(?is)<script\\b[^>]*>.*?</script\\s*>")
  private val Style =
    java.util.regex.Pattern.compile("(?is)<style\\b[^>]*>.*?</style\\s*>")
  private val Comment = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  private val Tag = java.util.regex.Pattern.compile("(?s)<[^>]*>")
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def strip(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    var s = u.toString
    s = Script.matcher(s).replaceAll(" ")
    s = Style.matcher(s).replaceAll(" ")
    s = Comment.matcher(s).replaceAll(" ")
    s = Tag.matcher(s).replaceAll(" ")
    // &amp; decoded LAST so '&amp;lt;' stays the literal text '&lt;'
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Ws.matcher(s).replaceAll(" ").trim)
  }
}

/** Markup-to-visible-text stripping — see [[TextAnalysis.stripMarkup]].
  * Null-intolerant like the built-ins; wrap in coalesce for a non-null
  * contract (the Column wrapper does).
  */
case class StripMarkup(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_strip_markup requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    StripMarkupOps.strip(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.StripMarkupOps.strip($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): StripMarkup = copy(child = c)
}

/** Static kernel for [[WsTokens]]: lowercase (UTF8String.toLowerCase — the
  * exact primitive Spark's `lower()` calls), split on the literal space
  * byte (0x20 never occurs inside a UTF-8 multibyte sequence), drop empty
  * segments. Output strings are byte-identical to
  * `filter(split(lower(s), " "), t => t =!= "")`.
  */
object WsTokensOps {
  def tokens(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = u.toLowerCase.getBytes // byte-offset slicing (substring is char-indexed)
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        if (i > start) out += org.apache.spark.unsafe.types.UTF8String.fromBytes(b, start, i - start)
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Lowercased whitespace tokens, empties dropped — see
  * [[TextAnalysis.wsTokens]]. One codegen'd pass; the
  * `filter(split(lower(...)))` formulation it replaces put TWO
  * CodegenFallback nodes (the filter HOF, and everything sharing its
  * projection) into every tokenizing operator's hot loop.
  */
case class WsTokens(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    WsTokensOps.tokens(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.WsTokensOps.tokens($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): WsTokens = copy(child = c)
}

/** Static kernel for [[WordBigrams]]: n-1 space-joined adjacent-token pairs;
  * fewer than 2 tokens yields the empty array. Byte-identical to
  * `concat_ws(" ", t[i], t[i+1])` over non-null tokens.
  */
object WordBigramsOps {
  def bigrams(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i)
      out(i - 1) = org.apache.spark.unsafe.types.UTF8String.concatWs(
        org.apache.spark.unsafe.types.UTF8String.fromString(" "), prev, cur)
      prev = cur
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Adjacent word-bigram strings over a token array — see
  * [[TextAnalysis.wordBigrams]].
  */
case class WordBigrams(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_bigrams requires an ARRAY<STRING> argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    WordBigramsOps.bigrams(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.WordBigramsOps.bigrams($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): WordBigrams = copy(child = c)
}

/** Static kernel for [[RepetitionStats]]: all four Gopher repetition signals
  * in one pass over the space-split tokens (empty segments KEPT — the exact
  * `split(text, " ")` tokenization the HOF formulation used, distinct from
  * wsTokens). dup fracs = 1 - distinct/total; top_word_frac = max word
  * count / total; n-gram strings are the same single-space joins
  * `concat_ws(" ", slice(t, i, n))` produced (empty segments join as empty).
  */
object RepetitionStatsOps {
  private def splitKeepEmpty(u: org.apache.spark.unsafe.types.UTF8String)
      : Array[org.apache.spark.unsafe.types.UTF8String] = {
    val b = u.getBytes
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.unsafe.types.UTF8String](8)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        out += org.apache.spark.unsafe.types.UTF8String.fromBytes(b, start, i - start)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  private def dupFracNgrams(
      toks: Array[org.apache.spark.unsafe.types.UTF8String], n: Int): Double = {
    val total = toks.length - (n - 1)
    if (total <= 0) return 0.0
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](total * 2)
    var i = 0
    while (i < total) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    1.0 - seen.size.toDouble / total
  }

  def stats(u: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = splitKeepEmpty(u)
    val total = toks.length // split always yields >= 1 segment
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](total * 2)
    var maxCount = 0
    var i = 0
    while (i < total) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      i += 1
    }
    val dupWord = 1.0 - counts.size.toDouble / total
    val topWord = maxCount.toDouble / total
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dupWord, topWord, dupFracNgrams(toks, 2), dupFracNgrams(toks, 3)))
  }
}

/** Gopher repetition signals in one pass — see
  * [[TextAnalysis.repetitionSignals]].
  */
case class RepetitionStats(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("dup_word_frac",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("top_word_frac",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("dup_2gram_frac",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("dup_3gram_frac",
        org.apache.spark.sql.types.DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    RepetitionStatsOps.stats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.RepetitionStatsOps.stats($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): RepetitionStats = copy(child = c)
}

/** Static kernel for [[QualitySignals]]: every raw quality signal in one
  * pass over the text. Semantics replay the Column formulation exactly:
  * n_chars = character (not byte) count; tokens = Java-regex `\s+` split
  * with limit -1 (leading empty kept when the text starts with whitespace,
  * trailing empty kept when it ends with one; "" -> [""]); punct = the
  * POSIX ASCII `\p{Punct}` set; digits/upper = ASCII [0-9]/[A-Z]; stopword
  * membership on the lowercased token.
  */
object QualitySignalsOps {
  private val PunctSet: Array[Boolean] = {
    val a = new Array[Boolean](128)
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => a(c.toInt) = true)
    a
  }
  private val Stopwords: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    TextAnalysis.EnglishStopwords.foreach(w =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  def stats(u: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val nChars = u.numChars()
    val b = u.getBytes
    val n = b.length
    var nPunct = 0; var nDigits = 0; var nUpper = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c >= 0) { // ASCII byte — the only bytes the char classes can match
        if (PunctSet(c)) nPunct += 1
        else if (c >= '0' && c <= '9') nDigits += 1
        else if (c >= 'A' && c <= 'Z') nUpper += 1
      }
      i += 1
    }
    // regex \s+ split, limit -1: runs of whitespace separate tokens; a
    // leading run yields one empty first token, a trailing run one empty
    // last token; "" yields [""]
    var nTokens = 0; var nStop = 0
    var pos = 0
    var tokStart = 0
    var inWs = false
    def closeToken(endExclusive: Int): Unit = {
      nTokens += 1
      if (endExclusive > tokStart) {
        val tok = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(b, tokStart, endExclusive - tokStart).toLowerCase
        if (Stopwords.contains(tok)) nStop += 1
      }
    }
    while (pos < n) {
      if (isWs(b(pos))) {
        if (!inWs) { closeToken(pos); inWs = true }
      } else if (inWs) { tokStart = pos; inWs = false }
      pos += 1
    }
    if (inWs) tokStart = n // a trailing ws run yields one EMPTY last token
    closeToken(n)
    val pr = nPunct.toDouble / math.max(nChars, 1)
    val sr = nStop.toDouble / math.max(nTokens, 1)
    val mwl = nChars.toDouble / math.max(nTokens, 1)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nTokens, nPunct, nDigits, nUpper, nStop, pr, sr, mwl))
  }
}

/** Raw quality signals in one pass — see [[TextAnalysis.qualitysignals]]. */
case class QualitySignals(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digits", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"quality_signals requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    QualitySignalsOps.stats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.QualitySignalsOps.stats($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): QualitySignals = copy(child = c)
}

/** Static kernel for [[LangIdScore]]: distinct `\s+`-split tokens of the
  * lowercased text, each probed against every registry language's stopword
  * set; returns the first registry language holding the maximal positive
  * distinct-hit count, else "und" — exactly the
  * `array_intersect`-per-language fold it replaces.
  */
object StopwordLangIdOps {
  private val Langs: Array[String] = TextAnalysis.LanguageStopwords.map(_._1).toArray
  // word -> bitmask of languages containing it (7 langs, fits an Int)
  private val WordMask: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    // the Int bitmask below silently wraps past 32 languages (ADVICE r14):
    // fail loudly at init if the registry ever grows that far
    require(Langs.length <= 32,
      s"StopwordLangId packs language membership into an Int bitmask; " +
        s"registry has ${Langs.length} languages (max 32) — widen to Long/Array")
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    TextAnalysis.LanguageStopwords.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = org.apache.spark.unsafe.types.UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }
  private val Und = org.apache.spark.unsafe.types.UTF8String.fromString("und")
  private val LangU8: Array[org.apache.spark.unsafe.types.UTF8String] =
    Langs.map(org.apache.spark.unsafe.types.UTF8String.fromString)

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  def lang(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val b = u.toLowerCase.getBytes
    val n = b.length
    val counts = new Array[Int](Langs.length)
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](32)
    var start = 0
    var i = 0
    // distinct tokens only (array_distinct semantics): count each stopword
    // once per document no matter how often it repeats. Empty segments from
    // the \s+ split are skipped outright — they match no stopword, so the
    // counts are identical to the array_intersect formulation's.
    while (i <= n) {
      if (i == n || isWs(b(i))) {
        if (i > start) {
          val tok = org.apache.spark.unsafe.types.UTF8String.fromBytes(b, start, i - start)
          if (seen.add(tok)) {
            val mask = WordMask.get(tok)
            if (mask != null) {
              val mv = mask.intValue()
              var l = 0
              while (l < counts.length) {
                if ((mv & (1 << l)) != 0) counts(l) += 1
                l += 1
              }
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    var best = 0
    var l = 0
    while (l < counts.length) { if (counts(l) > best) best = counts(l); l += 1 }
    if (best == 0) return Und
    l = 0
    while (l < counts.length) { if (counts(l) == best) return LangU8(l); l += 1 }
    Und
  }
}

/** Stopword-ratio language id (heuristic registry path, distinct from the
  * trained [[LangIdScore]] model expression) — see [[TextAnalysis.languageId]]. */
case class StopwordLangId(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lang_id requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    StopwordLangIdOps.lang(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.StopwordLangIdOps.lang($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): StopwordLangId = copy(child = c)
}

/** Static kernel for [[C4Stats]]: every C4 signal plus the cleaned page in
  * ONE pass over the lines — replaces the per-line interpreted lambdas
  * (`filter(lines, c4LineKept)`, `exists(lines, ...)`) that re-walked the
  * line array per signal (the last acknowledged CodegenFallback hot-path
  * class, OPTIMIZATION_r14 "Not yet optimized" #2).
  *
  * Semantics replay the Column formulation exactly (pinned in
  * TextQualitySpec's differential corpus):
  * - lines = `split(t, "\n")` with limit -1 (trailing empties kept; "" is
  *   one empty line);
  * - a line is kept iff `rlike("[.!?][\"'”’)]*\\s*$")` (java.util.regex
  *   `find`; `$` also matches before one final line terminator — CR, NEL,
  *   LS, PS can survive inside a \n-split line), its space-trimmed form
  *   (Spark `trim` strips 0x20 ONLY) has >= 3 `\s+`-split segments (leading/
  *   trailing empty segments count, limit -1), and its default-locale
  *   lowercase does not contain "javascript" (String.toLowerCase — the
  *   exact primitive `lower()` rides);
  * - cleaned = kept lines joined by "\n"; n_sentences = count of [.!?]
  *   chars in cleaned;
  * - has_lorem_ipsum / has_javascript_line on the lowercased text (a case
  *   mapping never spans a newline, so whole-text search == per-line).
  */
object C4StatsOps {
  private def isJavaWs(c: Char): Boolean = // java regex \s = [ \t\n\x0B\f\r]
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
  private def isCloser(c: Char): Boolean =
    c == '"' || c == '\'' || c == '”' || c == '’' || c == ')'
  private def isTerminator(c: Char): Boolean = // java regex line terminators sans \n (the split char)
    c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  /** `rlike("[.!?][\"'”’)]*\\s*$")`: the char classes are disjoint, so the
    * suffix decomposition from the end is unique — scan backwards.
    */
  private def endsInSentencePunct(line: String, from: Int, until: Int): Boolean = {
    var e = until
    if (e > from && isTerminator(line.charAt(e - 1))) e -= 1 // `$` before one final terminator
    while (e > from && isJavaWs(line.charAt(e - 1))) e -= 1
    while (e > from && isCloser(line.charAt(e - 1))) e -= 1
    if (e == from) return false
    val c = line.charAt(e - 1)
    c == '.' || c == '!' || c == '?'
  }

  /** `size(split(trim(l), "\\s+")) >= 3` — token count = (\s+ runs) + 1. */
  private def hasThreeWords(line: String, from: Int, until: Int): Boolean = {
    var lo = from
    var hi = until
    while (lo < hi && line.charAt(lo) == ' ') lo += 1   // Spark trim: 0x20 only
    while (hi > lo && line.charAt(hi - 1) == ' ') hi -= 1
    var runs = 0
    var inWs = false
    var i = lo
    while (i < hi) {
      if (isJavaWs(line.charAt(i))) { if (!inWs) { runs += 1; inWs = true } }
      else inWs = false
      i += 1
    }
    runs + 1 >= 3
  }

  def stats(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val t = u.toString
    val lowerT = t.toLowerCase // same default-locale call lower() makes
    var nLines = 0
    var nKept = 0
    var nSentences = 0
    val cleaned = new java.lang.StringBuilder
    var start = 0
    val n = t.length
    var i = 0
    while (i <= n) {
      if (i == n || t.charAt(i) == '\n') {
        nLines += 1
        // per-line lowercase would be correct too, but contains() on the
        // whole-text lowercase is offset-unsafe (1->many case mappings
        // shift positions), so the javascript test lowercases the line
        val line = t.substring(start, i)
        val kept = endsInSentencePunct(t, start, i) &&
          hasThreeWords(t, start, i) &&
          !line.toLowerCase.contains("javascript")
        if (kept) {
          if (nKept > 0) cleaned.append('\n')
          cleaned.append(t, start, i)
          nKept += 1
          var j = start
          while (j < i) {
            val c = t.charAt(j)
            if (c == '.' || c == '!' || c == '?') nSentences += 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nLines, nKept, nSentences,
      lowerT.contains("lorem ipsum"),
      t.contains("{"),
      lowerT.contains("javascript"),
      org.apache.spark.unsafe.types.UTF8String.fromString(cleaned.toString)))
  }
}

/** One-pass C4 page signals + cleaned text — see [[TextAnalysis.c4Signals]]. */
case class C4Stats(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept_lines", IntegerType, nullable = false),
    StructField("n_sentences", IntegerType, nullable = false),
    StructField("has_lorem_ipsum", BooleanType, nullable = false),
    StructField("has_curly_brace", BooleanType, nullable = false),
    StructField("has_javascript_line", BooleanType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"c4_stats requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    C4StatsOps.stats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.C4StatsOps.stats($c)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): C4Stats = copy(child = c)
}
