package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained unigram language-model vocabulary: `pieces` maps each
  * subword piece to its log probability; characters absent from the
  * vocabulary segment as single-character pieces at `unkLogProb` (so every
  * word has at least one segmentation). Plain data so models serialize and
  * inspect trivially. (Top-level class: it rides into generated code as a
  * reference object.)
  */
final case class UnigramModel(pieces: Map[String, Double], unkLogProb: Double) {
  @transient lazy val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else math.max(1, pieces.keysIterator.map(_.length).max)
}

/** SentencePiece-style unigram-LM tokenizer (Kudo 2018) over whitespace
  * words — the OTHER major published tokenizer family next to [[Bpe]], and
  * unlike BPE's greedy merge order its encode is a global optimum: Viterbi
  * picks the segmentation maximizing the summed piece log-probabilities
  * (`abcd` -> `ab cd` even when the greedy longest prefix `abc` exists).
  *
  *  - **train**: the corpus contributes exactly ONE aggregation pass (word
  *    counts, partial-aggregated shuffle, capped at `maxVocabWords` rows to
  *    the driver — the same scale-correct shape as [[Bpe.train]]); seeding,
  *    EM (lattice forward-backward expectations), and pruning are driver-side
  *    computations over that capped dictionary: O(dict x maxPieceLen^2), not
  *    O(corpus x iters).
  *  - **encode/count**: row-local codegen'd expressions; the model ships as a
  *    reference object (same convention as BpeEncode/DictScore/NerDetect).
  */
object Unigram {

  /** Train a unigram vocabulary of (at most) `vocabSize` pieces.
    *
    * Driver-side algorithm on the capped word-frequency dictionary:
    *  1. seed = every single character plus the top multi-character
    *     substrings (length <= `maxPieceLen`) by corpus-weighted frequency,
    *     `seedMultiplier * vocabSize` of them (ties: lexicographic — training
    *     is deterministic end to end);
    *  2. `emIters` rounds of EM: E-step accumulates expected piece counts by
    *     lattice forward-backward over each dictionary word, M-step
    *     re-normalizes log-probs (lightly smoothed so no piece hits -inf);
    *  3. prune the lowest-expected-count multi-character pieces (20% of the
    *     survivors per round, never single characters — the cover set), re-run
    *     EM, repeat until `vocabSize` holds.
    *
    * Single characters are always kept even when that exceeds `vocabSize`
    * (they are what makes every word encodable).
    */
  def train(df: DataFrame, text: Column, vocabSize: Int, maxPieceLen: Int = 8,
            emIters: Int = 2, maxVocabWords: Int = 100000,
            seedMultiplier: Int = 4, unkLogProb: Double = -20.0): UnigramModel = {
    PipelineGuards.requireBatch(df, "Unigram.train")
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    require(emIters >= 1, "emIters must be >= 1")
    require(seedMultiplier >= 1, "seedMultiplier must be >= 1")
    val wordCounts = df
      .select(explode(TextAnalysis.wsTokens(text)).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(wordCounts.nonEmpty, "Unigram.train needs at least one token")

    // seed substring counts (corpus-weighted), driver-side over the capped
    // dict; substrings that would split a surrogate pair are skipped so no
    // vocab piece can ever emit a malformed unpaired-surrogate token
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        if (!(Character.isLowSurrogate(w.charAt(i)) && i > 0 &&
          Character.isHighSurrogate(w.charAt(i - 1)))) {
          var l = 1
          val maxL = math.min(maxPieceLen, w.length - i)
          while (l <= maxL) {
            val endsMidPair = i + l < w.length &&
              Character.isHighSurrogate(w.charAt(i + l - 1)) &&
              Character.isLowSurrogate(w.charAt(i + l))
            if (!endsMidPair) {
              val p = w.substring(i, i + l)
              subCounts.update(p, subCounts.getOrElse(p, 0L) + n)
            }
            l += 1
          }
        }
        i += 1
      }
    }
    val chars = subCounts.keysIterator.filter(_.length == 1).toArray.sorted
    val multiBudget = math.max(0, vocabSize.toLong * seedMultiplier - chars.length).toInt
    val multi = subCounts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, c) => (-c, p) }.take(multiBudget).map(_._1)
    var vocab: Array[String] = (chars ++ multi).sorted

    // init log-probs from relative seed frequency (sums in sorted vocab order)
    def normalized(counts: collection.Map[String, Double]): Map[String, Double] = {
      val smooth = 1e-3
      var total = 0.0
      vocab.foreach { p => total += counts.getOrElse(p, 0.0) + smooth }
      val logTotal = math.log(total)
      vocab.iterator.map { p =>
        p -> (math.log(counts.getOrElse(p, 0.0) + smooth) - logTotal)
      }.toMap
    }
    // normalized() only reads pieces in `vocab`, so no pre-filter needed
    var model = UnigramModel(
      normalized(subCounts.map { case (p, c) => p -> c.toDouble }),
      unkLogProb)

    var lastCounts: collection.Map[String, Double] = Map.empty
    var done = false
    while (!done) {
      var k = 0
      while (k < emIters) {
        val (c, _) = UnigramOps.emStep(wordCounts, model)
        lastCounts = c
        model = UnigramModel(normalized(c), unkLogProb)
        k += 1
      }
      if (vocab.length <= vocabSize) done = true
      else {
        val multiNow = vocab.filter(_.length > 1)
        if (multiNow.isEmpty) done = true
        else {
          val need = vocab.length - vocabSize
          val removeN = math.min(need, math.max(1, (multiNow.length + 4) / 5))
          val remove = multiNow
            .sortBy(p => (lastCounts.getOrElse(p, 0.0), p))
            .take(removeN).toSet
          vocab = vocab.filterNot(remove)
          model = UnigramModel(normalized(lastCounts), unkLogProb)
        }
      }
    }
    model
  }

  /** Unigram tokens as array<string> — row-local, codegen'd Viterbi. */
  def encodeColumn(text: Column, model: UnigramModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(UnigramEncode(GraftColumnBridge.expression(text), model))
  }

  /** Unigram token count — row-local, codegen'd (no token array built). */
  def countColumn(text: Column, model: UnigramModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(UnigramCount(GraftColumnBridge.expression(text), model))
  }
}

/** JSON (de)serialization for [[UnigramModel]] — the SQL surface
  * (`graft_unigram_count(text, model_json)`) and checks-storage need the
  * model as a string: `{"unk": -20.0, "pieces": {"ab": -1.0, ...}}`.
  */
object UnigramModelJson {
  def parse(json: String): UnigramModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    UnigramModel(
      (j \ "pieces").extract[Map[String, Double]],
      (j \ "unk").extract[Double])
  }

  def render(model: UnigramModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("unk" -> model.unkLogProb) ~ ("pieces" -> model.pieces)))
  }
}

/** Static kernels for the unigram expressions: per-word Viterbi decode and
  * the training E-step's lattice forward-backward. Whole-text tokenization
  * reuses the SAME whitespace word split as the Column-side tokenizer.
  */
object UnigramOps {

  /** log-prob of word[j, i) as one piece: vocabulary lookup, single
    * CODE POINT fallback at unkLogProb, -inf otherwise. The unk unit is a
    * code point, not a UTF-16 char: an astral char falls back as its intact
    * surrogate PAIR, and a lone half of a pair is a dead edge (so the lattice
    * can never emit a malformed unpaired-surrogate token). Unpaired
    * surrogates in malformed input still get the single-char fallback —
    * every well-formed or malformed word keeps a finite path.
    */
  private def pieceLp(model: UnigramModel, word: String, j: Int, i: Int): Double =
    model.pieces.get(word.substring(j, i)) match {
      case Some(v) => v
      case None =>
        if (i - j == 1) {
          val c = word.charAt(j)
          val pairsRight = Character.isHighSurrogate(c) && i < word.length &&
            Character.isLowSurrogate(word.charAt(i))
          val pairsLeft = Character.isLowSurrogate(c) && j > 0 &&
            Character.isHighSurrogate(word.charAt(j - 1))
          if (pairsRight || pairsLeft) Double.NegativeInfinity else model.unkLogProb
        } else if (i - j == 2 && Character.isHighSurrogate(word.charAt(j)) &&
          Character.isLowSurrogate(word.charAt(j + 1))) {
          model.unkLogProb
        } else Double.NegativeInfinity
    }

  /** Viterbi best segmentation. Ties broken toward the LONGER piece ending
    * at each position (candidates scanned longest-first, replacement only on
    * strict improvement) — deterministic.
    */
  private[graft] def applyWord(word: String, model: UnigramModel): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val maxLen = model.maxPieceLen
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val lp = pieceLp(model, word, j, i)
        if (lp != Double.NegativeInfinity && best(j) + lp > best(i)) {
          best(i) = best(j) + lp
          back(i) = j
        }
        j += 1
      }
      i += 1
    }
    var count = 0
    var pos = n
    while (pos > 0) { count += 1; pos = back(pos) }
    val out = new Array[String](count)
    pos = n
    var k = count - 1
    while (pos > 0) {
      out(k) = word.substring(back(pos), pos)
      pos = back(pos)
      k -= 1
    }
    out
  }

  private def tokenizeWords(u: UTF8String): Array[String] =
    QualityClassifier.tokenize(u.toString)

  def encode(model: UnigramModel, u: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    tokenizeWords(u).foreach { w =>
      applyWord(w, model).foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray)
  }

  def count(model: UnigramModel, u: UTF8String): Int = {
    var n = 0
    tokenizeWords(u).foreach { w => n += applyWord(w, model).length }
    n
  }

  /** One EM E-step over the word dictionary: lattice forward-backward
    * expected piece counts (only vocabulary pieces accumulate; unk edges
    * carry probability mass but train nothing) and the total corpus
    * log-likelihood under the current model. All loops in fixed array order,
    * so repeated runs are bit-identical.
    */
  private[graft] def emStep(words: Array[(String, Long)], model: UnigramModel)
      : (collection.Map[String, Double], Double) = {
    val counts = scala.collection.mutable.HashMap.empty[String, Double]
    var ll = 0.0
    val maxLen = model.maxPieceLen

    def logAdd(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else if (a >= b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))

    words.foreach { case (w, wc) =>
      val n = w.length
      if (n > 0) {
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxLen)
          while (j < i) {
            val lp = pieceLp(model, w, j, i)
            if (lp != Double.NegativeInfinity)
              alpha(i) = logAdd(alpha(i), alpha(j) + lp)
            j += 1
          }
          i += 1
        }
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        beta(n) = 0.0
        var j2 = n - 1
        while (j2 >= 0) {
          var i2 = j2 + 1
          val hi = math.min(n, j2 + maxLen)
          while (i2 <= hi) {
            val lp = pieceLp(model, w, j2, i2)
            if (lp != Double.NegativeInfinity)
              beta(j2) = logAdd(beta(j2), lp + beta(i2))
            i2 += 1
          }
          j2 -= 1
        }
        val z = alpha(n) // finite: unk single chars guarantee a path
        ll += wc * z
        var j3 = 0
        while (j3 < n) {
          var i3 = j3 + 1
          val hi = math.min(n, j3 + maxLen)
          while (i3 <= hi) {
            val piece = w.substring(j3, i3)
            if (model.pieces.contains(piece)) {
              val lp = model.pieces(piece)
              val e = math.exp(alpha(j3) + lp + beta(i3) - z) * wc
              if (e > 0.0) counts.update(piece, counts.getOrElse(piece, 0.0) + e)
            }
            i3 += 1
          }
          j3 += 1
        }
      }
    }
    (counts, ll)
  }
}

/** Unigram tokens of the whitespace-lowercased words, Viterbi-decoded per
  * word. Model is a codegen reference object.
  */
case class UnigramEncode(child: Expression, model: UnigramModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_encode requires a STRING text argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    UnigramOps.encode(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.UnigramOps.encode($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncode = copy(child = c)
}

/** Unigram token count without materializing the token array. */
case class UnigramCount(child: Expression, model: UnigramModel) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_count requires a STRING text argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    UnigramOps.count(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.UnigramOps.count($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): UnigramCount = copy(child = c)
}
