package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained character-n-gram language-ID model (fastText-langid shape,
  * multinomial Naive Bayes): per-language document counts (the priors) and
  * capped per-language n-gram counts. COUNTS, not probabilities, are the
  * stored form — integers survive (de)serialization exactly, and the
  * smoothing arithmetic stays replayable (same convention as [[LmModel]]).
  * (Top-level class: it rides into generated code as a reference object.)
  */
final case class LangIdModel(n: Int, docCounts: Map[String, Long],
                             gramCounts: Map[String, Map[String, Long]]) {
  require(n >= 1, "n-gram order must be >= 1")

  /** Deterministic label order: ties in scoring resolve to the first. */
  @transient lazy val langs: IndexedSeq[String] = docCounts.keys.toIndexedSeq.sorted

  /** Per-language add-1-smoothing state: (log prior, gram -> logprob,
    * OOV logprob). Computed once per JVM from the counts. The smoothing
    * denominator uses the SHARED vocabulary size (distinct grams across all
    * languages), not the per-language table size — standard multinomial-NB
    * add-1 over a common event space. (Per-language V would hand a language
    * with doc counts but NO gram table an OOV logprob of ln(1/1) = 0, making
    * it dominate every prediction.)
    */
  @transient lazy val scorers: IndexedSeq[(String, Double, Map[String, Double], Double)] = {
    val totalDocs = langs.iterator.map(docCounts).sum.toDouble
    val sharedV = gramCounts.valuesIterator.flatMap(_.keysIterator).toSet.size
    langs.map { l =>
      val grams = gramCounts.getOrElse(l, Map.empty)
      val total = grams.valuesIterator.sum.toDouble
      val denom = math.log(total + sharedV + 1.0)
      val lp = grams.map { case (g, c) => g -> (math.log(c + 1.0) - denom) }
      (l, math.log(docCounts(l) / totalDocs), lp, -denom) // ln(1/(C+V+1)) = -denom
    }
  }
}

/** Trainable character-n-gram language identifier — the model-backed upgrade
  * of the [[TextAnalysis.languageId]] stopword heuristic (which needs no
  * training but only covers bundled languages and whole-word evidence).
  * Multinomial Naive Bayes over sliding character n-grams:
  * `score(lang) = ln P(lang) + sum_g ln P(g | lang)` with add-1 smoothing.
  *
  *  - **train**: the labeled corpus contributes exactly ONE aggregation pass
  *    — each row explodes to its distinct-position char n-grams plus one doc
  *    marker, partial-aggregated into (label, gram) counts, capped per
  *    language by the deterministic (count desc, gram) window before the
  *    bounded `langs x (vocab+1)` collect. Doc counts (the priors) read off
  *    the SAME aggregated frame via the marker row — no second corpus scan.
  *  - **predict/score**: row-local codegen'd expressions; the model ships as
  *    a reference object (same convention as BpeEncode/DictScore).
  */
object LangId {

  /** The synthetic per-document marker gram: real grams all have length
    * `n` >= 1, so the empty string can never collide.
    */
  private[pipeline] val DocMarker = ""

  /** Sliding character n-grams of the case-folded text, in text order. */
  private[graft] def charGrams(text: Column, n: Int): Column = {
    val t = lower(coalesce(text, lit("")))
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)), i => t.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Train on a labeled frame: `label` must be a non-null string column
    * (null-label rows are dropped). `vocabPerLang` caps each language's
    * n-gram table; the cap boundary is deterministic (count desc, gram).
    */
  def train(df: DataFrame, text: Column, label: Column, n: Int = 3,
            vocabPerLang: Int = 5000, maxLangs: Int = 256): LangIdModel = {
    PipelineGuards.requireBatch(df, "LangId.train")
    require(n >= 1, "n must be >= 1")
    require(vocabPerLang >= 1, "vocabPerLang must be >= 1")
    val grams = concat(array(lit(DocMarker)), charGrams(text, n))
    val counts = df
      .select(label.cast("string").as("__l"), explode(grams).as("__g"))
      .where(col("__l").isNotNull)
      .groupBy("__l", "__g").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("__l").orderBy(col("__c").desc, col("__g"))
    // the collect is HARD-bounded: at most (vocab+2) rows survive per label,
    // and the limit caps the total at maxLangs labels' worth + 1 — a
    // label-explosion bug (e.g. the text column passed as the label) fails
    // fast below instead of OOMing the driver here
    val collectCap = maxLangs * (vocabPerLang + 2) + 1
    val rows = counts
      .withColumn("__rn", row_number().over(w))
      .where(col("__g") === DocMarker || col("__rn") <= vocabPerLang + 1)
      .select("__l", "__g", "__c")
      .limit(collectCap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(rows.nonEmpty, "LangId.train needs at least one labeled row")

    val docCounts = rows.collect { case (l, DocMarker, c) => l -> c }.toMap
    require(rows.length < collectCap && docCounts.size <= maxLangs,
      s"LangId.train saw more than $maxLangs distinct labels (maxLangs=$maxLangs); " +
        "a label column this wide is usually a bug, raise maxLangs to override")
    // the marker may occupy a window slot; re-apply the cap exactly per lang
    val gramCounts = rows.filter(_._2 != DocMarker)
      .groupBy(_._1).map { case (l, rs) =>
        l -> rs.sortBy { case (_, g, c) => (-c, g) }.take(vocabPerLang)
          .map { case (_, g, c) => g -> c }.toMap
      }
    LangIdModel(n, docCounts, gramCounts)
  }

  /** Predicted language code — row-local, codegen'd. */
  def predictColumn(text: Column, model: LangIdModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(LangIdPredict(GraftColumnBridge.expression(text), model))
  }

  /** NB log-score of `lang` — row-local, codegen'd (prior first, then grams
    * left-to-right in text order; the defined order the oracle replays).
    */
  def scoreColumn(text: Column, model: LangIdModel, lang: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    require(model.docCounts.contains(lang), s"unknown language '$lang'")
    GraftColumnBridge.column(LangIdScore(GraftColumnBridge.expression(text), model, lang))
  }

  /** Keep rows predicted to be one of `langs`. */
  def filterByLanguage(df: DataFrame, text: Column, model: LangIdModel,
                       langs: Seq[String]): DataFrame =
    df.where(predictColumn(text, model).isin(langs: _*))
}

/** JSON (de)serialization for [[LangIdModel]]:
  * `{"n": 3, "docs": {"en": 100}, "grams": {"en": {"the": 40}}}`.
  */
object LangIdModelJson {
  def parse(json: String): LangIdModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    LangIdModel(
      (j \ "n").extract[Int],
      (j \ "docs").extract[Map[String, Long]],
      (j \ "grams").extract[Map[String, Map[String, Long]]])
  }

  def render(model: LangIdModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("n" -> model.n) ~ ("docs" -> model.docCounts) ~
          ("grams" -> model.gramCounts)))
  }
}

/** Static kernels for the language-ID expressions. Case fold matches the
  * Column-side `lower()` (Locale.ROOT).
  */
object LangIdOps {
  /** Grams slide over CODE POINTS (parity with the Column side's
    * `substr`/`length`, which count code points, never splitting a surrogate
    * pair) and case-fold via UTF8String.toLowerCase — the exact fold
    * `lower()` applies at train time, so trained and scored grams agree on
    * every input, astral or not.
    */
  private def gramsOf(model: LangIdModel, u: UTF8String): Array[String] = {
    val s = u.toLowerCase.toString
    val n = model.n
    val cpCount = s.codePointCount(0, s.length)
    if (cpCount < n) return Array.empty
    // char offsets of each code point start (+ end sentinel)
    val starts = new Array[Int](cpCount + 1)
    var i = 0
    var k = 0
    while (i < s.length) {
      starts(k) = i
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    starts(cpCount) = s.length
    Array.tabulate(cpCount - n + 1)(j => s.substring(starts(j), starts(j + n)))
  }

  def scoreByIdx(model: LangIdModel, idx: Int, u: UTF8String): Double =
    scoreAt(model, idx, gramsOf(model, u))

  private def scoreAt(model: LangIdModel, idx: Int, grams: Array[String]): Double = {
    val (_, prior, lp, unk) = model.scorers(idx)
    var s = prior
    var i = 0
    while (i < grams.length) {
      s += lp.getOrElse(grams(i), unk)
      i += 1
    }
    s
  }

  def predict(model: LangIdModel, u: UTF8String): UTF8String = {
    val grams = gramsOf(model, u)
    var bestIdx = 0
    var best = Double.NegativeInfinity
    var i = 0
    while (i < model.langs.length) {
      val s = scoreAt(model, i, grams)
      if (s > best) { best = s; bestIdx = i } // ties: first (sorted) label
      i += 1
    }
    UTF8String.fromString(model.langs(bestIdx))
  }
}

/** Predicted language of the text under a trained [[LangIdModel]]. */
case class LangIdPredict(child: Expression, model: LangIdModel) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_langid requires a STRING text argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    LangIdOps.predict(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdModel", model, classOf[LangIdModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.LangIdOps.predict($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): LangIdPredict = copy(child = c)
}

/** NB log-score of one language under a trained [[LangIdModel]]. */
case class LangIdScore(child: Expression, model: LangIdModel, lang: String)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType

  // resolved once per expression, not per row (and validated at analysis)
  @transient private lazy val langIdx: Int = model.langs.indexOf(lang)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_langid_score requires a STRING text argument, got ${child.dataType.sql}")
    else if (langIdx < 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_langid_score: unknown language '$lang'; model has ${model.langs.mkString(", ")}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    LangIdOps.scoreByIdx(model, langIdx, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdModel", model, classOf[LangIdModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.LangIdOps.scoreByIdx($ref, $langIdx, $c)")
  }

  override protected def withNewChildInternal(c: Expression): LangIdScore = copy(child = c)
}
