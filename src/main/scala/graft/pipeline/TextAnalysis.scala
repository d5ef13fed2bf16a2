package graft.pipeline

import org.apache.spark.sql.Column
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
    val nChars = length(text)
    val toks = split(text, "\\s+")
    val nTokens = size(toks)
    val nPunct = size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0)))
    val nDigits = size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
    val nUpper = size(regexp_extract_all(text, lit("[A-Z]"), lit(0)))
    val nStop = size(filter(toks, t => lower(t).isin(EnglishStopwords: _*)))
    struct(
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      nPunct.as("n_punct"),
      nDigits.as("n_digits"),
      nUpper.as("n_upper"),
      nStop.as("n_stopwords"),
      (nPunct.cast("double") / greatest(nChars, lit(1))).as("punct_ratio"),
      (nStop.cast("double") / greatest(nTokens, lit(1))).as("stopword_ratio"),
      (nChars.cast("double") / greatest(nTokens, lit(1))).as("mean_word_len"))
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
    val toks = array_distinct(split(lower(text), "\\s+"))
    val scores = LanguageStopwords.map { case (lang, words) =>
      (lang, size(array_intersect(toks, array(words.map(lit): _*))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, score)) =>
      when(score > 0 && score === best, lit(lang)).otherwise(acc)
    }
  }

  /** 64-bit content fingerprint over normalized text (lowercase, collapsed
    * whitespace, punctuation stripped) — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(regexp_replace(lower(text), "[\\p{Punct}]", ""), "\\s+", " "))

  /** MinHash-based fuzzy fingerprint: min of seeded hashes over word 3-grams
    * (equal fingerprints => likely near-identical prefix content).
    */
  def fuzzyFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(Dedup.shingles(text, n), s => xxhash64(s)))

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
