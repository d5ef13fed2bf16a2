package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained BPE merge table: `merges(i)` is the i-th-priority pair; lower
  * index merges first (the standard byte-pair-encoding apply order, Sennrich
  * et al. 2016). Plain strings so models serialize/inspect trivially.
  * (Top-level class: it rides into generated code as a reference object.)
  */
final case class BpeModel(merges: IndexedSeq[(String, String)]) {
  /** (pair -> rank) lookup used by the apply loop. */
  @transient lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
}

/** Byte-pair encoding over whitespace words — real merges-table BPE, not the
  * regex token ESTIMATE ([[TextAnalysis.bpeTokenEstimate]]). Two halves:
  *
  *  - **train**: the textbook algorithm runs on a WORD-FREQUENCY DICTIONARY,
  *    not the corpus — so the corpus contributes exactly ONE aggregation pass
  *    (word counts, partial-aggregated shuffle, capped at `maxVocabWords`
  *    rows to the driver) and the merge loop is a driver-side computation
  *    over that dictionary. This is the scale-correct shape: training cost is
  *    O(dict), not O(corpus x merges).
  *  - **encode/count**: row-local codegen'd expression; the model ships as a
  *    reference object (same convention as DictScore/NerDetect).
  */
object Bpe {

  /** One corpus pass for word counts, then the driver-side merge loop:
    * repeatedly count adjacent symbol pairs weighted by word frequency, take
    * the most frequent (ties: lexicographic, so training is deterministic),
    * merge it everywhere, record it. Stops early when no pair repeats.
    */
  def train(df: DataFrame, text: Column, numMerges: Int,
            maxVocabWords: Int = 100000): BpeModel = {
    PipelineGuards.requireBatch(df, "Bpe.train")
    require(numMerges >= 0, "numMerges must be >= 0")
    val wordCounts = df
      .select(explode(TextAnalysis.wsTokens(text)).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // dict entries as mutable symbol arrays (start = characters)
    val words = wordCounts.map { case (w, n) =>
      (w.toCharArray.map(_.toString), n)
    }
    val merges = IndexedSeq.newBuilder[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val fused = best._1 + best._2
        var wi = 0
        while (wi < words.length) {
          val (syms, n) = words(wi)
          if (syms.length >= 2) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += fused; i += 2
              } else { out += syms(i); i += 1 }
            }
            if (out.length != syms.length) words(wi) = (out.toArray, n)
          }
          wi += 1
        }
        iter += 1
      }
    }
    BpeModel(merges.result())
  }

  /** BPE tokens as array<string> — row-local, codegen'd. */
  def encodeColumn(text: Column, model: BpeModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(BpeEncode(GraftColumnBridge.expression(text), model))
  }

  /** BPE token count — row-local, codegen'd (no token array materialized). */
  def countColumn(text: Column, model: BpeModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(BpeCount(GraftColumnBridge.expression(text), model))
  }
}

/** JSON (de)serialization for [[BpeModel]] — the SQL surface
  * (`graft_bpe_count(text, model_json)`) and checks-storage need the model as
  * a string. Merges serialize as an ordered array of 2-element arrays so rank
  * is the array position: `{"merges": [["a","b"], ["ab","c"]]}`.
  */
object BpeModelJson {
  def parse(json: String): BpeModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    val merges = (j \ "merges").extract[List[List[String]]].map {
      case a :: b :: Nil => (a, b)
      case other => throw new IllegalArgumentException(
        s"BPE merge must be a 2-element array, got $other")
    }
    BpeModel(merges.toIndexedSeq)
  }

  def render(model: BpeModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        "merges" -> model.merges.map(p => List(p._1, p._2)).toList))
  }
}

/** Static kernels for the BPE expressions. The per-word apply is the standard
  * lowest-rank-first merge loop; whole-text tokenization reuses the SAME
  * whitespace word split as the Column-side tokenizer.
  */
object BpeOps {

  private def applyWord(word: String, model: BpeModel): Array[String] = {
    var syms: Array[String] = word.toCharArray.map(_.toString)
    if (syms.length < 2 || model.merges.isEmpty) return syms
    val ranks = model.ranks
    var done = false
    while (!done && syms.length >= 2) {
      // find the adjacent pair with the LOWEST merge rank
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else {
        val out = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, out, 0, bestIdx)
        out(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        System.arraycopy(syms, bestIdx + 2, out, bestIdx + 1, syms.length - bestIdx - 2)
        syms = out
      }
    }
    syms
  }

  private def tokenizeWords(u: UTF8String): Array[String] =
    QualityClassifier.tokenize(u.toString)

  def encode(model: BpeModel, u: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    tokenizeWords(u).foreach { w =>
      applyWord(w, model).foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray)
  }

  def count(model: BpeModel, u: UTF8String): Int = {
    var n = 0
    tokenizeWords(u).foreach { w => n += applyWord(w, model).length }
    n
  }
}

/** BPE tokens of the whitespace-lowercased words, merges applied
  * lowest-rank-first per word. Model is a codegen reference object.
  */
case class BpeEncode(child: Expression, model: BpeModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    BpeOps.encode(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.BpeOps.encode($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}

/** BPE token count without materializing the token array. */
case class BpeCount(child: Expression, model: BpeModel) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    BpeOps.count(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.BpeOps.count($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): BpeCount = copy(child = c)
}
