package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Importance-weighted data selection in the DSIR shape (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw-corpus document by how much more likely its word-bigram features
  * are under a small TARGET corpus than under the raw corpus itself, then
  * keep a deterministically Gumbel-perturbed top slice — selecting the raw
  * data that "looks like" the target domain without training a classifier.
  *
  * Where the paper buckets features by hashing, this implementation uses a
  * top-`features` bigram vocabulary derived from the RAW corpus (cap ordered
  * by (count DESC, feature)), with everything outside the head sharing one
  * OOV feature: the driver holds O(features) longs either way, the corpus
  * cost is the same ONE partial-agg count shuffle per corpus, and the closed
  * vocabulary keeps the model engine-portable (no hash-function coupling).
  *
  * Scale shape at 100 TB:
  *  - [[train]]: raw side contributes one bigram-count shuffle + a
  *    TakeOrdered-capped head (the NgramLm.train shape); the target corpus is
  *    small by the method's premise and aggregates to at most features+1 rows;
  *  - [[score]]: row-local codegen'd kernel, model ships as a reference
  *    object — zero shuffle;
  *  - [[resample]]: pure column arithmetic on the portable hash — zero
  *    shuffle, no RNG state, stable across reruns and engines.
  */
final case class DsirModel(k: Double,
                           targetCounts: Map[String, Long], rawCounts: Map[String, Long],
                           targetTotal: Long, rawTotal: Long,
                           targetOov: Long, rawOov: Long)

object Dsir {

  /** Lowercase word-bigram features ("v w") of a document — the same
    * tokenization as every other trained kernel (TextAnalysis.wsTokens).
    */
  def bigramFeatures(text: Column): Column =
    TextAnalysis.wordBigrams(TextAnalysis.wsTokens(text))

  /** Train on a (small) target corpus and the raw corpus. Feature vocabulary
    * = top-`features` bigrams of the RAW corpus by (count DESC, feature);
    * target-only bigrams land in OOV by construction (the raw corpus defines
    * what the model can see — same closed-vocab stance as [[NgramLm.train]]).
    */
  def train(target: DataFrame, raw: DataFrame, text: Column,
            features: Int = 4096, k: Double = 1.0): DsirModel = {
    PipelineGuards.requireBatch(raw, "Dsir.train (raw corpus)")
    PipelineGuards.requireBatch(target, "Dsir.train (target corpus)")
    require(features > 0, "features must be positive")
    require(k > 0, "smoothing k must be positive")
    val spark = raw.sparkSession
    val bg = bigramFeatures(text)

    // raw side: aggregated once; persisted so the head cut and the total sum
    // read the grouped frame without a second corpus scan (NgramLm shape)
    val rawBg = raw.select(explode(bg).as("__f"))
      .groupBy("__f").agg(count(lit(1)).as("__c")).persist()
    try {
      val head = rawBg.orderBy(col("__c").desc, col("__f")).limit(features)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val rawTotal = rawBg.agg(coalesce(sum("__c"), lit(0L))).head().getLong(0)
      require(rawTotal > 0,
        "Dsir.train needs at least one bigram in the raw corpus")
      val rawCounts = head.toMap
      val rawOov = rawTotal - head.map(_._2).sum

      val featDf = broadcast(
        spark.createDataFrame(spark.sparkContext.parallelize(
          head.map(h => org.apache.spark.sql.Row(h._1)).toSeq, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__feat",
              org.apache.spark.sql.types.StringType)))))
      // target side: feature-or-OOV via one broadcast join, then an agg that
      // returns at most features+1 rows — the total falls out of the same
      // result, no extra pass
      val tRows = target.select(explode(bg).as("__f"))
        .join(featDf, col("__f") === col("__feat"), "left")
        .select(coalesce(col("__feat"), lit(Oov)).as("f"))
        .groupBy("f").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val targetTotal = tRows.map(_._2).sum
      val targetOov = tRows.collectFirst { case (Oov, c) => c }.getOrElse(0L)
      val targetCounts = tRows.filterNot(_._1 == Oov).toMap
      DsirModel(k, targetCounts, rawCounts, targetTotal, rawTotal, targetOov, rawOov)
    } finally { rawBg.unpersist(); () }
  }

  /** OOV feature label. Bigram features always contain a space; this cannot
    * collide.
    */
  val Oov = "<oov>"

  /** Per-document mean log importance ratio — row-local, codegen'd. Null for
    * docs with fewer than two tokens (no bigram evidence).
    */
  def logImportanceColumn(text: Column, model: DsirModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DsirScore(GraftColumnBridge.expression(text), model))
  }

  /** Adds `dsir_log_importance` to the frame. */
  def score(df: DataFrame, text: Column, model: DsirModel): DataFrame =
    df.withColumn("dsir_log_importance", logImportanceColumn(text, model))

  /** Deterministic standard-Gumbel draw from the portable hash of `id`:
    * u = (h + 0.5) / 2^32 is an exact double in (0,1), g = -ln(-ln u).
    * The same id always draws the same noise — resampling is reproducible
    * across reruns, engines, and incremental loads (no RNG state).
    */
  def gumbelNoise(id: Column): Column =
    -log(-log((Curation.portableHash(id) + lit(0.5)) / lit(4294967296.0)))

  /** Gumbel-max importance resampling: keep rows whose
    * `score / temperature + Gumbel(portableHash(id))` clears `threshold` —
    * the streaming-friendly threshold form of the paper's Gumbel top-k
    * (sampling without replacement ∝ exp(score/T)). Row-local, zero shuffle;
    * raise `temperature` toward uniform sampling, lower it toward hard top
    * selection. Docs with null score (<2 tokens) are dropped: no evidence,
    * no draw.
    */
  def resample(df: DataFrame, id: Column, score: Column,
               threshold: Double, temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    // fail fast on non-integral ids: portableHash casts to long, and a NULL
    // hash would silently drop EVERY row (NULL keep predicate), not error
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.select(id).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
      case other => throw new IllegalArgumentException(
        s"Dsir.resample: id must be an integral column (got ${other.sql}); " +
          "hash wide/string ids to a long first (e.g. xxhash64)")
    }
    df.where(score / lit(temperature) + gumbelNoise(id) >= lit(threshold))
  }
}

/** JSON (de)serialization for [[DsirModel]] — the SQL surface
  * (`graft_dsir_score(text, model_json)`) and the declarative pipeline's
  * `dsir_resample` step both need the model as a string. json4s ships with
  * Spark.
  */
object DsirModelJson {
  def parse(json: String): DsirModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    DsirModel(
      (j \ "k").extract[Double],
      (j \ "target_counts").extract[Map[String, Long]],
      (j \ "raw_counts").extract[Map[String, Long]],
      (j \ "target_total").extract[Long],
      (j \ "raw_total").extract[Long],
      (j \ "target_oov").extract[Long],
      (j \ "raw_oov").extract[Long])
  }

  def render(model: DsirModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("k" -> model.k) ~ ("target_counts" -> model.targetCounts) ~
          ("raw_counts" -> model.rawCounts) ~
          ("target_total" -> model.targetTotal) ~ ("raw_total" -> model.rawTotal) ~
          ("target_oov" -> model.targetOov) ~ ("raw_oov" -> model.rawOov)))
  }
}

/** Static kernel for [[DsirScore]]: per-bigram log ratios summed
  * LEFT-TO-RIGHT (the same sequential order as DuckDB's list_sum, preserving
  * oracle parity), then divided by the bigram count.
  */
object DsirOps {
  def logImportance(model: DsirModel, u: UTF8String): Any = {
    val toks = QualityClassifier.tokenize(u.toString)
    if (toks.length < 2) null
    else {
      val b = model.rawCounts.size.toDouble
      val td = model.targetTotal + model.k * (b + 1)
      val rd = model.rawTotal + model.k * (b + 1)
      var s = 0.0
      var i = 1
      while (i < toks.length) {
        val f = toks(i - 1) + " " + toks(i)
        val inVocab = model.rawCounts.contains(f)
        val ct = if (inVocab) model.targetCounts.getOrElse(f, 0L) else model.targetOov
        val cr = if (inVocab) model.rawCounts(f) else model.rawOov
        s += math.log((ct + model.k) / td) - math.log((cr + model.k) / rd)
        i += 1
      }
      s / (toks.length - 1)
    }
  }
}

/** Mean log importance ratio of a document's bigrams under a [[DsirModel]] —
  * the model ships as a reference object into generated code (same convention
  * as [[LmPerplexity]]), so a large feature table neither bloats nor
  * de-codegens the plan.
  */
case class DsirScore(child: Expression, model: DsirModel)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dsir_score requires a STRING text argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    DsirOps.logImportance(model, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirModel", model, classOf[DsirModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = graft.pipeline.DsirOps.logImportance($ref, $c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): DsirScore = copy(child = c)
}
