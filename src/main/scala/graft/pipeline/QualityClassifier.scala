package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained quality model: `score = sigmoid(bias + (Σ_tokens weight(token)) / n)`
  * with unknown tokens at weight 0, summed in token order, n = token count.
  * Weights are a plain word→weight map so models are engine-portable and
  * human-inspectable. (Top-level class: it rides into generated code as a
  * reference object, and Janino needs a `$`-free source-form type name.)
  */
final case class QualityModel(bias: Double, weights: Map[String, Double])

/** Trainable text-quality classifier — the fastText/CCNet "wiki-reference
  * filter" shape used to quality-score pretraining corpora: logistic
  * regression over normalized term frequencies of a bounded vocabulary.
  *
  * Scale shapes:
  *  - vocabulary: one distinct-per-doc explode + ONE partial-aggregated
  *    shuffle of (term, doc-count); only the top-`vocabSize` terms reach the
  *    driver (`vocabSize` is a hard cap, not a hint);
  *  - training: batch gradient descent — one `treeAggregate` pass per epoch
  *    over the corpus with the (weights, vocab) broadcast; the driver holds
  *    only the O(vocabSize) weight vector, never rows;
  *  - scoring: row-local, zero shuffle — the model rides into generated code
  *    as a reference object ([[DictScore]]), so scoring does NOT de-codegen
  *    the surrounding projection.
  */
object QualityClassifier {

  // Locale.ROOT, not the JVM default, so JVM-side scoring is deterministic
  // across hosts. Parity caveat: Spark's lower() is locale-independent only
  // on the ASCII fast path — for NON-ASCII strings UTF8String delegates to
  // default-locale String.toLowerCase, so on e.g. a Turkish-default JVM a
  // non-ASCII corpus can tokenize differently in wsTokens-trained
  // vocab/merge tables than here. Run non-ASCII pipelines with a ROOT-ish
  // default locale (-Duser.language=en) or normalize text upstream.
  private[pipeline] def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).filter(_.nonEmpty)

  /** Top-`vocabSize` terms by document frequency (ties broken by term, so the
    * vocabulary is deterministic). One shuffle; driver receives only the cap.
    */
  def buildVocab(df: DataFrame, text: Column, vocabSize: Int): Seq[String] = {
    PipelineGuards.requireBatch(df, "buildVocab")
    require(vocabSize > 0, "vocabSize must be positive")
    df.select(explode(array_distinct(TextAnalysis.wsTokens(text))).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__df"))
      .orderBy(col("__df").desc, col("__t"))
      .limit(vocabSize)
      .select("__t").collect().map(_.getString(0)).toSeq
  }

  /** Train by batch gradient descent: `epochs` passes, each ONE treeAggregate
    * over (text, label) with the current weights broadcast; the driver applies
    * the summed gradient. `label` must be 0.0/1.0 (1 = high quality). For a
    * 100 TB corpus, train on a `hashSample` — a quality classifier needs
    * ~10^5..10^6 labeled docs, not the corpus.
    */
  def train(df: DataFrame, text: Column, label: Column,
            vocabSize: Int = 8192, epochs: Int = 30, lr: Double = 0.5,
            l2: Double = 1e-6): QualityModel = {
    PipelineGuards.requireBatch(df, "train")
    val vocab = buildVocab(df, text, vocabSize)
    val index: Map[String, Int] = vocab.zipWithIndex.toMap
    val spark = df.sparkSession
    import spark.implicits._
    // null labels cannot train (and would NPE the primitive decode);
    // null text is a legitimate 0-token doc handled by the feature loop
    val data = df.select(text.cast("string"), label.cast("double"))
      .where(label.isNotNull)
      .as[(String, Double)].rdd.cache()
    try {
      val n = data.count().toDouble
      require(n > 0,
        "train needs at least one non-null-label row (got 0 — an empty or " +
          "all-null-label training frame would silently yield NaN weights)")
      val dim = vocab.size
      var w = new Array[Double](dim)
      var b = 0.0
      val idxBc = spark.sparkContext.broadcast(index)
      var epoch = 0
      while (epoch < epochs) {
        val wBc = spark.sparkContext.broadcast(w)
        val bNow = b
        // gradient of mean logistic loss; zero value holds grad_w ++ grad_b
        val grad = data.treeAggregate(new Array[Double](dim + 1))(
          seqOp = (acc, row) => {
            val (t, y) = row
            val toks = tokenize(t)
            if (toks.nonEmpty) {
              val idx = idxBc.value
              val wv = wBc.value
              val inv = 1.0 / toks.length
              var z = bNow
              var i = 0
              while (i < toks.length) {
                val j = idx.getOrElse(toks(i), -1)
                if (j >= 0) z += wv(j) * inv
                i += 1
              }
              val p = 1.0 / (1.0 + math.exp(-z))
              val g = p - y
              i = 0
              while (i < toks.length) {
                val j = idx.getOrElse(toks(i), -1)
                if (j >= 0) acc(j) += g * inv
                i += 1
              }
              acc(dim) += g
            }
            acc
          },
          combOp = (a, c) => { var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a })
        val wNew = new Array[Double](dim)
        var j = 0
        while (j < dim) {
          wNew(j) = w(j) - lr * (grad(j) / n + l2 * w(j))
          j += 1
        }
        b -= lr * grad(dim) / n
        w = wNew
        wBc.destroy()
        epoch += 1
      }
      idxBc.destroy()
      QualityModel(b, vocab.zip(w).filter(_._2 != 0.0).toMap)
    } finally data.unpersist()
  }

  /** Quality score in (0,1) for each row — row-local, codegen'd. */
  def scoreColumn(text: Column, model: QualityModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DictScore(GraftColumnBridge.expression(text), model))
  }

  /** Adds `quality_score` to the frame. */
  def score(df: DataFrame, text: Column, model: QualityModel): DataFrame =
    df.withColumn("quality_score", scoreColumn(text, model))

  /** Keep rows scoring at least `threshold`. */
  def filterByQuality(df: DataFrame, text: Column, model: QualityModel,
                      threshold: Double): DataFrame =
    df.where(scoreColumn(text, model) >= threshold)
}

/** JSON (de)serialization for [[QualityModel]] — the SQL surface
  * (`graft_quality_score(text, model_json)`) and checks-storage both need the
  * model as a string. json4s ships with Spark.
  */
object QualityModelJson {
  def parse(json: String): QualityModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    QualityModel(
      (j \ "bias").extract[Double],
      (j \ "weights").extract[Map[String, Double]])
  }

  def render(model: QualityModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("bias" -> model.bias) ~ ("weights" -> model.weights)))
  }
}

/** Static kernel for [[DictScore]]: tokens summed LEFT-TO-RIGHT (the same
  * sequential order as DuckDB's list_sum, preserving 0-ulp oracle parity),
  * unknown tokens at 0. Empty/null-token docs score sigmoid(bias).
  */
object QualityOps {
  def dictScore(model: QualityModel, u: UTF8String): Double = {
    val toks = QualityClassifier.tokenize(u.toString)
    var z = model.bias
    if (toks.nonEmpty) {
      var s = 0.0
      var i = 0
      while (i < toks.length) {
        s += model.weights.getOrElse(toks(i), 0.0)
        i += 1
      }
      z += s / toks.length
    }
    1.0 / (1.0 + math.exp(-z))
  }
}

/** sigmoid(bias + Σ weight(token) / n) over the text — the model ships as a
  * reference object into generated code (same convention as NerDetect), so a
  * large vocabulary does not bloat or de-codegen the plan.
  */
case class DictScore(child: Expression, model: QualityModel)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  // checked input type: the SQL surface (graft_quality_score) makes a
  // non-string argument a one-keystroke mistake; fail at analysis, not with
  // a runtime ClassCastException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_quality_score requires a STRING text argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    QualityOps.dictScore(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dictModel", model,
      classOf[QualityModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.pipeline.QualityOps.dictScore($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): DictScore = copy(child = c)
}
