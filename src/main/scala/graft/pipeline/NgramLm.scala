package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained add-k bigram language model over a closed vocabulary.
  *
  * `unigrams` maps every vocabulary word — PLUS the reserved `<unk>` bucket —
  * to its corpus occurrence count; `bigrams` maps `v + " " + w` (both
  * sides already vocab-or-`<unk>`) to the pair count. Scoring uses
  * `P(w|v) = (c(v,w) + k) / (c(v) + k * |V|)` with `|V| = unigrams.size`
  * (vocabulary including `<unk>`). Bigrams evicted by the training cap score
  * as unseen (count 0) — the smoothed floor. Top-level case class: it rides
  * into generated code as a reference object (Janino needs a `$`-free name).
  */
final case class LmModel(k: Double, unigrams: Map[String, Long],
                         bigrams: Map[String, Long]) {
  require(k > 0, "add-k smoothing needs k > 0 (k = 0 makes unseen bigrams -Inf)")
  require(unigrams.contains(LmModel.Unk), "unigrams must carry the <unk> bucket")
}

object LmModel {
  /** Reserved out-of-vocabulary bucket. */
  final val Unk = "<unk>"
  /** Bigram map key: a space cannot appear inside whitespace-split tokens,
    * so `v + " " + w` is unambiguous.
    */
  def key(v: String, w: String): String = v + " " + w
}

/** CCNet-style n-gram language-model perplexity filter: train a bigram LM on
  * a reference corpus, score candidate documents by perplexity, keep the
  * fluent band. (CCNet uses KenLM 5-grams; the bigram + add-k shape keeps the
  * model engine-portable and the oracle SQL-replayable while exercising the
  * same pipeline: capped-vocabulary training, broadcast model, row-local
  * scoring.)
  *
  * Scale shapes:
  *  - vocabulary + unigram counts: ONE corpus explode into a partial-agg
  *    shuffle of (term, count); only the top-`vocabSize` terms reach the
  *    driver, and the `<unk>` mass is derived from one scalar sum over the
  *    ALREADY-AGGREGATED term frame (persisted — never a second corpus scan);
  *  - bigram counts: ONE corpus explode of consecutive pairs, each side
  *    mapped to vocab-or-`<unk>` via a BROADCAST left-semi-style join (the
  *    vocabulary is driver-capped, so the join never shuffles the corpus),
  *    then one partial-agg shuffle on the mapped pair; only the
  *    top-`maxBigrams` pairs reach the driver;
  *  - scoring: row-local, zero shuffle — the model rides into generated code
  *    as a reference object ([[LmPerplexity]]), same convention as
  *    [[DictScore]].
  */
object NgramLm {

  /** Train on `df[text]`. Vocabulary = top-`vocabSize` words by corpus count
    * (ties broken by term); bigram table capped to the top-`maxBigrams` pairs
    * by count (ties by pair) — both caps are hard driver-memory bounds.
    */
  def train(df: DataFrame, text: Column, vocabSize: Int = 8192,
            maxBigrams: Int = 262144, k: Double = 0.5): LmModel = {
    PipelineGuards.requireBatch(df, "NgramLm.train")
    require(vocabSize > 0, "vocabSize must be positive")
    require(maxBigrams > 0, "maxBigrams must be positive")
    val spark = df.sparkSession
    val toks = TextAnalysis.wsTokens(text)

    // (term, count) — aggregated once; small relative to the corpus, so
    // persisting it lets both the top-V cut and the total-token sum read it
    // without a second corpus scan
    val uni = df.select(explode(toks).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c")).persist()
    try {
      // a literal corpus token "<unk>" must not enter the head: it would
      // collide with the reserved OOV bucket (its real count silently
      // overwritten by the OOV mass); route it through OOV instead
      val top = uni.where(col("__t") =!= LmModel.Unk)
        .orderBy(col("__c").desc, col("__t")).limit(vocabSize)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      // coalesce: sum over an empty term frame is NULL, and a bare getLong
      // would NPE — fail with the real story instead
      val total = uni.agg(coalesce(sum("__c"), lit(0L))).head().getLong(0)
      require(total > 0,
        "NgramLm.train needs at least one token (empty or all-null text corpus)")
      val unkCount = total - top.map(_._2).sum
      val unigrams = (top :+ (LmModel.Unk -> unkCount)).toMap

      val vocabDf = broadcast(
        spark.createDataFrame(spark.sparkContext.parallelize(
          top.map(t => org.apache.spark.sql.Row(t._1)).toSeq, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__w",
              org.apache.spark.sql.types.StringType)))))
      // consecutive (v, w) pairs, then vocab-or-<unk> each side via two
      // broadcast joins — the corpus side never shuffles before the pair agg.
      // Pairs come from the codegen'd WordBigrams kernel ("v w" strings split
      // back on the single separator space — tokens are space-free by
      // construction, so the split is exact); the transform/element_at
      // struct formulation it replaces was CodegenFallback and dominated the
      // map-stage CPU ahead of the bigram shuffle.
      val pairs = df.select(toks.as("__t")).where(size(col("__t")) >= 2)
        .select(explode(TextAnalysis.wordBigrams(col("__t"))).as("__bg"))
        .select(substring_index(col("__bg"), " ", 1).as("__v"),
          substring_index(col("__bg"), " ", -1).as("__w0"))
      val mapped = pairs
        .join(vocabDf.withColumnRenamed("__w", "__lv"), col("__v") === col("__lv"), "left")
        .join(vocabDf.withColumnRenamed("__w", "__lw"), col("__w0") === col("__lw"), "left")
        .select(coalesce(col("__lv"), lit(LmModel.Unk)).as("v"),
          coalesce(col("__lw"), lit(LmModel.Unk)).as("w"))
      val bigrams = mapped.groupBy("v", "w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("v"), col("w")).limit(maxBigrams)
        .collect().map(r => LmModel.key(r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      LmModel(k, unigrams, bigrams)
    } finally { uni.unpersist(); () }
  }

  /** Per-document bigram perplexity — row-local, codegen'd. Null for docs
    * with fewer than two tokens (no bigram evidence).
    */
  def perplexityColumn(text: Column, model: LmModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(LmPerplexity(GraftColumnBridge.expression(text), model))
  }

  /** Adds `lm_perplexity` to the frame. */
  def score(df: DataFrame, text: Column, model: LmModel): DataFrame =
    df.withColumn("lm_perplexity", perplexityColumn(text, model))

  /** Keep documents the model finds fluent: perplexity at most `maxPerplexity`
    * (sub-2-token docs carry no evidence and are dropped).
    */
  def filterByPerplexity(df: DataFrame, text: Column, model: LmModel,
                         maxPerplexity: Double): DataFrame =
    df.where(perplexityColumn(text, model) <= maxPerplexity)
}

/** JSON (de)serialization for [[LmModel]] — the SQL surface
  * (`graft_lm_perplexity(text, model_json)`) and checks-storage both need the
  * model as a string. Bigram keys use the same `"v w"` form as
  * [[LmModel.key]]. json4s ships with Spark.
  */
object LmModelJson {
  def parse(json: String): LmModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    LmModel(
      (j \ "k").extract[Double],
      (j \ "unigrams").extract[Map[String, Long]],
      (j \ "bigrams").extract[Map[String, Long]])
  }

  def render(model: LmModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("k" -> model.k) ~ ("unigrams" -> model.unigrams) ~
          ("bigrams" -> model.bigrams)))
  }
}

/** Static kernel for [[LmPerplexity]]: log-probs summed LEFT-TO-RIGHT (the
  * same sequential order as DuckDB's list_sum, preserving oracle parity).
  */
object LmOps {
  def perplexity(model: LmModel, u: UTF8String): Any = {
    val toks = QualityClassifier.tokenize(u.toString)
    if (toks.length < 2) null
    else {
      val vSize = model.unigrams.size.toDouble // vocab including <unk>
      var lp = 0.0
      var i = 1
      while (i < toks.length) {
        val v = if (model.unigrams.contains(toks(i - 1))) toks(i - 1) else LmModel.Unk
        val w = if (model.unigrams.contains(toks(i))) toks(i) else LmModel.Unk
        val cvw = model.bigrams.getOrElse(LmModel.key(v, w), 0L)
        val cv = model.unigrams(v)
        lp += math.log((cvw + model.k) / (cv + model.k * vSize))
        i += 1
      }
      math.exp(-lp / (toks.length - 1))
    }
  }
}

/** exp(-mean log P(w_i|w_{i-1})) over the text — the model ships as a
  * reference object into generated code (same convention as [[DictScore]]),
  * so a large bigram table does not bloat or de-codegen the plan.
  */
case class LmPerplexity(child: Expression, model: LmModel)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lm_perplexity requires a STRING text argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    LmOps.perplexity(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmModel", model, classOf[LmModel].getName)
    // the kernel returns null (boxed) for <2-token docs: route through the
    // boxed path and unwrap, mirroring nullSafeCodeGen's null contract
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = graft.pipeline.LmOps.perplexity($ref, $c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): LmPerplexity = copy(child = c)
}
