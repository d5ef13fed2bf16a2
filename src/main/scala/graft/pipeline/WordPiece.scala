package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained WordPiece vocabulary: pieces either start a word or continue
  * one (`contPrefix`, "##" by convention); a word with any unmatchable
  * position becomes ONE `unkToken` (BERT's rule, not per-char fallback).
  * (Top-level class: it rides into generated code as a reference object.)
  */
final case class WordPieceModel(vocab: Set[String], unkToken: String = "[UNK]",
                                contPrefix: String = "##",
                                maxInputChars: Int = 200) {
  require(contPrefix.nonEmpty, "contPrefix must be non-empty")
}

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer) —
  * completes the trained-tokenizer trio next to [[Bpe]] (merge ranks) and
  * [[Unigram]] (lattice Viterbi). Two halves, same shapes as the siblings:
  *
  *  - **train**: the merge loop runs on the WORD-FREQUENCY DICTIONARY (one
  *    corpus aggregation pass, capped driver dict). Unlike BPE's raw pair
  *    count, each merge maximizes the WordPiece likelihood score
  *    `count(ab) / (count(a) * count(b))` — pairs that co-occur more than
  *    their parts predict fuse first (the HF WordPiece trainer's score).
  *  - **encode/count**: greedy longest-match-first per word, row-local and
  *    codegen'd; the model ships as a reference object.
  */
object WordPiece {

  /** One corpus pass for word counts, then the driver-side scored merge loop.
    * The vocabulary = every base symbol (first chars bare, continuations
    * ##-prefixed) + one fused piece per merge, stopping at `vocabSize` total
    * or when no adjacent pair repeats. Deterministic: score ties break
    * lexicographically. Substring boundaries never split a surrogate pair
    * (the r8 Unigram convention), so no piece can be a malformed token.
    */
  def train(df: DataFrame, text: Column, vocabSize: Int,
            maxVocabWords: Int = 100000, unkToken: String = "[UNK]",
            contPrefix: String = "##"): WordPieceModel = {
    PipelineGuards.requireBatch(df, "WordPiece.train")
    require(vocabSize > 0, "vocabSize must be positive")
    val wordCounts = df
      .select(explode(TextAnalysis.wsTokens(text)).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // initial symbols: code-point chunks, continuations ##-prefixed
    val words = wordCounts.map { case (w, n) => (initialSymbols(w, contPrefix), n) }
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach { case (syms, _) => syms.foreach(vocab.add) }
    var exhausted = false
    while (vocab.size < vocabSize && !exhausted) {
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + n)
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          }
          i += 1
        }
      }
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        // likelihood score nab/(na*nb); iterate in lexicographic pair order
        // with strict improvement so score ties break deterministically
        val bestPair = {
          var bp: (String, String) = null
          var bs = -1.0
          candidates.toSeq.sortBy(_._1).foreach { case ((a, b), nab) =>
            val s = nab.toDouble / (symCounts(a).toDouble * symCounts(b).toDouble)
            if (s > bs) { bs = s; bp = (a, b) }
          }
          bp
        }
        val fused = fuse(bestPair._1, bestPair._2, contPrefix)
        vocab.add(fused)
        var wi = 0
        while (wi < words.length) {
          val (syms, n) = words(wi)
          if (syms.length >= 2) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == bestPair._1 && syms(i + 1) == bestPair._2) {
                out += fused; i += 2
              } else { out += syms(i); i += 1 }
            }
            if (out.length != syms.length) words(wi) = (out.toArray, n)
          }
          wi += 1
        }
      }
    }
    WordPieceModel(vocab.toSet, unkToken, contPrefix)
  }

  /** Per-code-point initial symbols; continuations carry the prefix. */
  private def initialSymbols(w: String, contPrefix: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cpEnd = i + Character.charCount(w.codePointAt(i))
      val piece = w.substring(i, cpEnd)
      out += (if (i == 0) piece else contPrefix + piece)
      i = cpEnd
    }
    out.toArray
  }

  private def fuse(a: String, b: String, contPrefix: String): String =
    a + (if (b.startsWith(contPrefix)) b.substring(contPrefix.length) else b)

  /** WordPiece tokens as array<string> — row-local, codegen'd. */
  def encodeColumn(text: Column, model: WordPieceModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordPieceEncode(GraftColumnBridge.expression(text), model))
  }

  /** WordPiece token count — row-local, codegen'd, no array materialized. */
  def countColumn(text: Column, model: WordPieceModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordPieceCount(GraftColumnBridge.expression(text), model))
  }
}

/** JSON (de)serialization for [[WordPieceModel]]:
  * `{"vocab": [...], "unk": "[UNK]", "prefix": "##", "max_chars": 200}`.
  */
object WordPieceModelJson {
  def parse(json: String): WordPieceModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    WordPieceModel(
      (j \ "vocab").extract[Seq[String]].toSet,
      (j \ "unk").extract[String],
      (j \ "prefix").extract[String],
      (j \ "max_chars").extract[Int])
  }

  def render(model: WordPieceModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("vocab" -> model.vocab.toSeq.sorted) ~ ("unk" -> model.unkToken) ~
          ("prefix" -> model.contPrefix) ~ ("max_chars" -> model.maxInputChars)))
  }
}

/** Static kernels: greedy longest-match-first per word (BERT's algorithm);
  * whole-text tokenization reuses the SAME whitespace word split as the
  * sibling tokenizers. Match boundaries move by code point, so a candidate
  * end never splits a surrogate pair.
  */
object WordPieceOps {

  private[graft] def applyWord(word: String, model: WordPieceModel): Array[String] = {
    if (word.isEmpty) return Array.empty
    if (word.length > model.maxInputChars) return Array(model.unkToken)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var matched: String = null
      while (matched == null && end > start) {
        val sub = word.substring(start, end)
        val cand = if (start == 0) sub else model.contPrefix + sub
        if (model.vocab.contains(cand)) matched = cand
        else {
          end -= 1
          // never end between a surrogate pair
          if (end > start && Character.isLowSurrogate(word.charAt(end)) &&
            Character.isHighSurrogate(word.charAt(end - 1))) end -= 1
        }
      }
      if (matched == null) return Array(model.unkToken)
      out += matched
      start = end
    }
    out.toArray
  }

  private def tokenizeWords(u: UTF8String): Array[String] =
    QualityClassifier.tokenize(u.toString)

  def encode(model: WordPieceModel, u: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    tokenizeWords(u).foreach { w =>
      applyWord(w, model).foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray)
  }

  def count(model: WordPieceModel, u: UTF8String): Int = {
    var n = 0
    tokenizeWords(u).foreach { w => n += applyWord(w, model).length }
    n
  }
}

/** WordPiece tokens of the whitespace-lowercased words. */
case class WordPieceEncode(child: Expression, model: WordPieceModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordPieceOps.encode(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpModel", model, classOf[WordPieceModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.WordPieceOps.encode($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): WordPieceEncode = copy(child = c)
}

/** WordPiece token count without materializing the token array. */
case class WordPieceCount(child: Expression, model: WordPieceModel) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    WordPieceOps.count(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpModel", model, classOf[WordPieceModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.WordPieceOps.count($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): WordPieceCount = copy(child = c)
}
