package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lexical corpus search for large-scale curation pipelines: BM25 top-k
  * retrieval of corpus documents for a (small) query set — the standard tool
  * for "find the training documents most similar to this eval item / this
  * seed prompt" sweeps.
  *
  * Scale shape: the query side is tiny by construction and broadcasts
  * everywhere; the corpus is filtered to query-term matches BEFORE its only
  * shuffle (the (doc, term) term-frequency aggregation) — row-locally inside
  * the token array for small term sets, by map-side broadcast semi join past
  * that — so the full corpus never shuffles and the full token stream is
  * never materialized. Document-frequency lookup, scoring, and the per-query
  * top-k all operate on matched rows only. No corpus self-join, no
  * driver-side scoring.
  */
object Search {

  /** Whitespace word tokens, lowercased; empty tokens dropped (shared
    * definition — see [[TextAnalysis.wsTokens]]).
    */
  private def toks(text: Column): Column = TextAnalysis.wsTokens(text)

  /** Distinct-term count at which the row-local literal filter hands off to
    * the explode + broadcast-semi-join path. Swept in PipeBench at 1M
    * ~50-token docs (SPARK_GRAFT_BM25_SWEEP=1; COVERAGE.md r7): literal
    * filter 7.9 / 26.4 / 95.4 s at 64 / 256 / 1024 terms (array_contains on
    * a literal array is a linear per-token scan, so cost grows linearly in
    * the term count) vs semi join flat at ~33 / 32.6 / 27.8 s — measured
    * crossover ≈ 320 terms; 256 keeps the literal branch strictly on its
    * winning side.
    */
  val DefaultTermFilterThreshold = 256

  /** BM25 top-k documents per query (Robertson/Sparck Jones; the Lucene
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf variant, so scores are always
    * positive). Returns (queryIdCol, rank, idCol, score), rank 1..k by
    * descending score with the doc id as the deterministic tie-break.
    *
    * Per-term contributions are rounded to 6 decimals and summed as
    * DECIMAL(38,6): the sum is exact and order-independent, so scores — and
    * therefore ranks — are bit-stable across partitionings, reruns, and
    * engines.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
               termFilterThreshold: Int = DefaultTermFilterThreshold): DataFrame = {
    PipelineGuards.requireBatch(docs, "bm25TopK")
    PipelineGuards.requireBatch(queries, "bm25TopK (query frame)")
    require(k > 0, "k must be positive")
    require(termFilterThreshold >= 0, "termFilterThreshold must be >= 0")
    // corpus stats: 1-row frame, broadcast via crossJoin
    val stats = docs.select(col(idCol), size(toks(col(textCol))).as("__dl"))
      .agg(count(lit(1)).as("__n_docs"), avg("__dl").as("__avgdl"))
    val qterms = queries.select(col(queryIdCol).as("__q"),
      explode(toks(col(queryTextCol))).as("__term")).distinct()
    // query-term filter BEFORE the explode when the term set is small: the
    // distinct terms collect to the driver (the query set is driver-bounded
    // by contract) and filter the token ARRAY row-locally, so the corpus
    // explode materializes matched tokens only, not the full token stream
    // (measured 6x on a 1M x 50-token corpus vs explode-then-semi-join).
    // Past the threshold the per-token literal scan stops paying — fall back
    // to explode + map-side broadcast semi join. Either way the tf
    // aggregation — the only corpus-wide shuffle — carries matched rows only.
    val distinctTerms = qterms.select("__term").distinct()
    // limited probe: decides the branch without pulling a large term set to
    // the driver (collect-everything-then-measure would defeat the fallback)
    val probe = distinctTerms.limit(termFilterThreshold + 1).collect().map(_.getString(0))
    val qtok = if (probe.length <= termFilterThreshold) {
      val termArr = lit(probe.sorted)
      docs.select(col(idCol).as("__doc"),
        size(toks(col(textCol))).as("__dl"),
        explode(filter(toks(col(textCol)),
          t => array_contains(termArr, t))).as("__term"))
    } else {
      docs.select(col(idCol).as("__doc"),
        size(toks(col(textCol))).as("__dl"),
        explode(toks(col(textCol))).as("__term"))
        .join(broadcast(distinctTerms), Seq("__term"), "left_semi")
    }
    // __dl is functionally dependent on __doc so keying on it adds no grain
    val tf = qtok.groupBy("__doc", "__dl", "__term")
      .agg(count(lit(1)).as("__tf"))
    // document frequency over query terms = (doc, term) rows per term
    val qdf = tf.groupBy("__term").agg(count(lit(1)).as("__df"))
    val matched = tf
      .join(broadcast(qterms), Seq("__term"))
      .join(broadcast(qdf), Seq("__term"))
      .crossJoin(broadcast(stats))
    val idf = log(lit(1.0) +
      (col("__n_docs") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfNorm = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    val contrib = round(idf * tfNorm, 6).cast(DecimalType(38, 6))
    val scored = matched
      .select(col("__q"), col("__doc"), contrib.as("__c"))
      .groupBy("__q", "__doc")
      .agg(sum("__c").as("__score"))
    val w = Window.partitionBy("__q").orderBy(col("__score").desc, col("__doc"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__q").as(queryIdCol), col("rank"),
        col("__doc").as(idCol), col("__score").cast("double").as("score"))
  }
}
