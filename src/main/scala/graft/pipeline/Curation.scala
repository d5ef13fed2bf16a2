package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * deterministic sampling (fraction + per-group quota) and eval-set
  * decontamination. Beyond the reference's check surface — these are the
  * operations a 100 TB pretraining pipeline runs between the quality checks.
  *
  * Scale shapes:
  *  - hashSample: row-local predicate, zero shuffle, reproducible across runs
  *    and engines (portable integer hash, not engine-specific RNG);
  *  - quotaSample: one shuffle on the group key (window row_number); skewed
  *    groups are bounded by the quota itself on the way out, and AQE skew
  *    handling covers the shuffle;
  *  - decontaminate: the eval set is tiny by construction (a benchmark), so
  *    every join against it broadcasts — the corpus is never shuffled; the
  *    only shuffled data is the contaminated-id set (distinct doc ids).
  */
object Curation {

  /** Portable 32-bit multiplicative hash (Knuth 1973, public domain constant
    * 2654435761 = floor(2^32/phi)). Pure int64 arithmetic so any SQL engine
    * reproduces it bit-for-bit — unlike xxhash64/rand which are engine-bound.
    * Input is reduced mod 2^31 first so the product cannot overflow int64.
    */
  def portableHash(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** Deterministic fraction sample: keep rows whose portable hash of `id`
    * falls below fraction * 2^32. Row-local — no shuffle, no RNG state; the
    * same (id, fraction) always makes the same keep/drop decision, so samples
    * are stable across reruns, engines, and incremental loads.
    */
  def hashSample(df: DataFrame, id: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.where(portableHash(id) < lit((fraction * 4294967296.0).toLong))
  }

  /** Deterministic per-group quota sample: keep up to `quota` rows per group,
    * chosen by portable-hash order (id as tie-break) — i.e. a reproducible
    * uniform draw per stratum. One shuffle on the group columns.
    */
  def quotaSample(df: DataFrame, groupCols: Seq[String], id: Column, quota: Int): DataFrame = {
    PipelineGuards.requireBatch(df, "quotaSample")
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(portableHash(id), id)
    df.withColumn("__quota_rn", row_number().over(w))
      .where(col("__quota_rn") <= quota)
      .drop("__quota_rn")
  }

  /** Cluster-balanced sampling (topic balancing): assign every row to its
    * nearest embedding centroid (row-local, zero-shuffle) and keep up to
    * `quota` rows per cluster in portable-hash order — the standard recipe
    * for capping over-represented topics in a pretraining mix (cluster-
    * proportional variants just post-weight the kept rows). Output keeps
    * the `cluster` column for downstream mixing steps. ONE shuffle total
    * (the per-cluster window); at 100 TB the quota bounds every partition's
    * output and AQE handles cluster skew on the way in.
    */
  def clusterBalancedSample(df: DataFrame, vecCol: String, id: Column,
                            centroids: Array[Array[Double]], quota: Int): DataFrame =
    quotaSample(Embeddings.assignClusters(df, vecCol, centroids),
      Seq("cluster"), id, quota)

  /** Deterministic stratified train/validation split: within every stratum
    * (the `groupCols` combination) exactly `ceil(valFraction * stratum_size)`
    * rows land in the `"val"` split, chosen by portable-hash order of `id`
    * (id as tie-break) — so small strata are never starved out of the eval
    * set the way a plain per-row Bernoulli split starves them, and the split
    * is reproducible across runs, engines, and row order. Adds a `split`
    * column (`"val"` / `"train"`).
    *
    * Scale shape: ONE shuffle on the stratum key — the row-number and the
    * stratum-count windows share the same partitioning, so Catalyst plans a
    * single exchange.
    */
  def stratifiedSplit(df: DataFrame, groupCols: Seq[String], id: Column,
                      valFraction: Double): DataFrame = {
    PipelineGuards.requireBatch(df, "stratifiedSplit")
    require(valFraction >= 0 && valFraction <= 1, "valFraction must be in [0,1]")
    val parts = groupCols.map(col)
    val ordered = Window.partitionBy(parts: _*).orderBy(portableHash(id), id)
    val whole = Window.partitionBy(parts: _*)
    // round to 9 dp before ceil: IEEE products like 100 * 0.55 =
    // 55.00000000000001 would otherwise ceil to 56 and silently break the
    // documented exact quota (the DuckDB oracle applies the same rounding)
    df.withColumn("__split_rn", row_number().over(ordered))
      .withColumn("__split_n", count(lit(1)).over(whole))
      .withColumn("split",
        when(col("__split_rn") <=
          ceil(round(col("__split_n") * lit(valFraction), 9)).cast("long"), lit("val"))
          .otherwise(lit("train")))
      .drop("__split_rn", "__split_n")
  }

  /** Deterministic sampling to a TOKEN budget — the data-mixing primitive a
    * pretraining run actually configures ("200B tokens of web, 30B of code"):
    * rows are taken in portable-hash order (a reproducible uniform shuffle,
    * `id` tie-break) until the cumulative token count would exceed
    * `budgetTokens`; with `groupCols`, each group gets its own budget.
    * A row whose tokens push the running sum past the budget is dropped
    * (strict prefix — budgets are ceilings, not targets).
    *
    * Scale shape: per-group budgets ride ONE shuffle on the group key (the
    * cumsum window). The GLOBAL budget does NOT use a no-partition window
    * (single-partition scale-killer): it range-partitions by the hash,
    * computes per-partition token sums (one tiny collect, one row per
    * partition), and adds broadcast prefix offsets to per-partition running
    * sums — the classic distributed prefix sum; the kept set is independent
    * of partition boundaries, so the result is still exactly the hash-order
    * prefix an engine-independent replay produces.
    *
    * `tokens` is any token-count expression ([[TextAnalysis.tokenCount]], a
    * BPE count, a precomputed column); nulls count as 0.
    */
  def sampleToTokenBudget(df: DataFrame, tokens: Column, id: Column,
                          budgetTokens: Long,
                          groupCols: Seq[String] = Nil): DataFrame = {
    PipelineGuards.requireBatch(df, "sampleToTokenBudget")
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    val h = portableHash(id)
    val t = coalesce(tokens.cast("long"), lit(0L))
    if (groupCols.nonEmpty) {
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(h, id)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("__tb_cum", sum(t).over(w))
        .where(col("__tb_cum") <= budgetTokens)
        .drop("__tb_cum")
    } else {
      val base = df.withColumn("__tb_h", h).withColumn("__tb_t", t)
        .withColumn("__tb_id", id.cast("long"))
      // freeze the range partitioning: the offsets action and the final plan
      // must see the SAME spark_partition_id assignment
      val ranged = base.repartitionByRange(col("__tb_h"), col("__tb_id"))
        .localCheckpoint(true)
      val withPid = ranged.withColumn("__tb_pid", spark_partition_id())
      val partSums = withPid.groupBy("__tb_pid")
        .agg(sum("__tb_t").as("__tb_psum"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      var running = 0L
      val offsets = partSums.map { case (pid, s) =>
        val off = running; running += s; (pid, off)
      }
      val session = df.sparkSession
      import session.implicits._
      val offsetDf = offsets.toSeq.toDF("__tb_pid", "__tb_off")
      val w = Window.partitionBy("__tb_pid").orderBy(col("__tb_h"), col("__tb_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      withPid.join(broadcast(offsetDf), Seq("__tb_pid"))
        .withColumn("__tb_cum", sum(col("__tb_t")).over(w) + col("__tb_off"))
        .where(col("__tb_cum") <= budgetTokens)
        .drop("__tb_pid", "__tb_h", "__tb_t", "__tb_id", "__tb_off", "__tb_cum")
    }
  }

  /** Deterministic per-group weighted sampling — the "domain mixing" step of a
    * pretraining pipeline: keep each row with the probability configured for
    * its group (e.g. source domain), decided by the portable hash of `id` so
    * the draw is reproducible across runs, engines, and incremental loads.
    * Groups absent from `weights` use `defaultWeight`. Row-local: zero
    * shuffle, the weight lookup compiles to a literal CASE chain.
    */
  def sampleByWeights(df: DataFrame, group: Column, weights: Map[String, Double],
                      id: Column, defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1) &&
      defaultWeight >= 0 && defaultWeight <= 1,
      "weights must be keep-probabilities in [0,1]")
    val cut = weights.toSeq.sortBy(_._1).foldLeft(
      lit((defaultWeight * 4294967296.0).toLong)) { case (acc, (k, w)) =>
      when(group === lit(k), lit((w * 4294967296.0).toLong)).otherwise(acc)
    }
    df.where(portableHash(id) < cut)
  }

  /** Greedy next-fit sequence packing: assign documents to token-budget bins
    * (the batch-construction step before training — pack short documents
    * together so each sequence slot carries ~`budget` tokens). Documents are
    * first split deterministically into `numGroups` independent pack groups by
    * portable hash of `id`; within a group, docs are taken in `id` order and a
    * new bin starts whenever the running weight would exceed `budget` (a doc
    * heavier than the budget gets a bin of its own). Returns
    * (idCol, pack_group, bin_id) — bin ids are 0-based within each group.
    *
    * Scale shape: packing is inherently sequential, so the parallel unit is
    * the GROUP — one shuffle partitions the corpus by group, each group packs
    * independently with O(1) state inside a single pass. Size `numGroups` to
    * the cluster (each group is one sequential scan); determinism holds for
    * any `numGroups` because group membership and in-group order are both
    * content-keyed, never partition-keyed.
    */
  def packSequences(df: DataFrame, idCol: String, weight: Column, budget: Long,
                    numGroups: Int = 64): DataFrame = {
    PipelineGuards.requireBatch(df, "packSequences")
    require(budget > 0, "budget must be positive")
    require(numGroups > 0, "numGroups must be positive")
    // fail fast on non-numeric ids: the long cast would otherwise throw
    // NumberFormatException mid-job under ANSI (or alias ids to 0 without it)
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      case other => throw new IllegalArgumentException(
        s"packSequences: idCol '$idCol' must be an integral type (got ${other.sql}); " +
          "derive a surrogate id (e.g. xxhash64 of the natural key) first")
    }
    val spark = df.sparkSession
    import spark.implicits._
    // null ids have no deterministic group or order — excluded by contract
    // (they would decode as primitive zeros and alias doc 0)
    val base = df.where(col(idCol).isNotNull).select(
      pmod(portableHash(col(idCol)), lit(numGroups.toLong)).cast("int").as("g"),
      col(idCol).cast("long").as("id"),
      coalesce(weight.cast("long"), lit(0L)).as("w"))
    val packed = base.as[(Int, Long, Long)]
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("id"))
      .mapPartitions { it =>
        var curG = Int.MinValue
        var bin = 0L
        var acc = 0L
        it.map { case (g, id, w) =>
          if (g != curG) { curG = g; bin = 0L; acc = w }
          else if (acc + w <= budget) { acc += w }
          else { bin += 1; acc = w }
          (id, g, bin)
        }
      }
    packed.toDF(idCol, "pack_group", "bin_id")
  }

  /** Word n-grams as 64-bit hashes, distinct per document; empty array when
    * the document has fewer than n tokens (a short doc contributes nothing —
    * unlike `Dedup.shingles`, which falls back to the whole text for sketch
    * stability). Row-local.
    */
  def wordNgramHashes(text: Column, n: Int): Column = {
    // fused codegen'd kernel (see HashedShingles): hashes each n-token byte
    // span in place with xxhash64 semantics — identical values to the old
    // transform(…, xxhash64(concat_ws(…))) chain, which was CodegenFallback
    // and de-codegen'd the whole corpus scan stage
    import org.apache.spark.sql.GraftColumnBridge
    // coalesce keeps the old contract: NULL text -> empty gram set, not NULL
    coalesce(GraftColumnBridge.column(HashedShingles(
      GraftColumnBridge.expression(text), n, wholeTextFallback = false)),
      array().cast("array<bigint>"))
  }

  /** Eval-set decontamination (the n-gram-overlap rule used for pretraining
    * corpora, e.g. GPT-3 appendix C / PaLM: a document is contaminated if it
    * shares any word n-gram with an evaluation benchmark). Returns the corpus
    * with an `is_contaminated` boolean.
    *
    * Plan shape: eval n-gram hashes are deduped and broadcast (an eval
    * benchmark is ~10^3..10^6 grams); corpus n-grams are generated row-locally
    * and semi-joined map-side, so the full corpus never shuffles — only the
    * matched doc ids do (distinct), and they broadcast back onto the corpus.
    */
  def decontaminate(corpus: DataFrame, id: Column, text: Column,
                    evalDf: DataFrame, evalText: Column, n: Int = 8): DataFrame = {
    val evalGrams = evalDf.select(explode(wordNgramHashes(evalText, n)).as("__ngram_h")).distinct()
    val contaminatedIds = corpus
      .select(id.as("__doc_id"), explode(wordNgramHashes(text, n)).as("__ngram_h"))
      .join(broadcast(evalGrams), "__ngram_h", "left_semi")
      .select(col("__doc_id")).distinct()
      .withColumn("__contaminated", lit(true))
    corpus
      .join(broadcast(contaminatedIds), id === col("__doc_id"), "left_outer")
      .withColumn("is_contaminated", coalesce(col("__contaminated"), lit(false)))
      .drop("__doc_id", "__contaminated")
  }

  /** Embedding-space eval decontamination: a document is contaminated if its
    * embedding lies within cosine `threshold` of ANY eval-set embedding — the
    * semantic complement of [[decontaminate]]'s n-gram rule (catches
    * paraphrases and format-shifted copies that share no 8-gram with the
    * benchmark). Returns the corpus with an `is_contaminated` boolean.
    *
    * Plan shape: the eval set is tiny by construction, so it broadcasts; the
    * contaminated-id set comes from a broadcast nested-loop SEMI join — the
    * corpus never shuffles, each partition streams once past the broadcast
    * eval vectors through the codegen'd [[CosineSimilarity]] kernel, and the
    * (small) id set broadcasts back onto the corpus for the flag. Cost is
    * corpus_rows × eval_rows kernel calls with zero data movement — for eval
    * sets past ~10^5 vectors, cluster the eval set first (assignClusters) and
    * prefilter by centroid. NaN similarities (zero-norm vectors) never flag:
    * Spark orders NaN above every value, so the predicate guards it.
    */
  def decontaminateSemantic(corpus: DataFrame, id: Column, vec: Column,
                            evalDf: DataFrame, evalVec: Column,
                            threshold: Double): DataFrame = {
    val ev = evalDf.select(evalVec.cast("array<double>").as("__eval_vec"))
    val sim = Similarity.cosine(col("__v"), col("__eval_vec"))
    val contaminatedIds = corpus
      .select(id.as("__doc_id"), vec.cast("array<double>").as("__v"))
      .join(broadcast(ev), !isnan(sim) && sim >= lit(threshold), "left_semi")
      .select("__doc_id").distinct()
      .withColumn("__contaminated", lit(true))
    corpus
      .join(broadcast(contaminatedIds), id === col("__doc_id"), "left_outer")
      .withColumn("is_contaminated", coalesce(col("__contaminated"), lit(false)))
      .drop("__doc_id", "__contaminated")
  }

  /** Epoch mixing with UPSAMPLING — the data-mixing step of a pretraining run
    * (Wikipedia ×2.4, code ×1.1, web ×0.7 …): each row is emitted
    * `floor(w)` times plus one more with probability `frac(w)`, where `w` is
    * its group's mixing weight. The fractional draw uses the portable hash of
    * `id` under a distinct salt, so it is reproducible across runs/engines and
    * independent of [[hashSample]]/[[sampleByWeights]] decisions on the same
    * ids. Adds an `epoch_copy` column (0-based copy index — downstream shard
    * assignment should key on (id, epoch_copy) so copies spread apart).
    * Weights in [0,1) degrade to exactly [[sampleByWeights]] semantics under
    * the salted draw; weights ≥ 1 are what that operator cannot express.
    *
    * Scale shape: row-local CASE chain + generator, zero shuffle; output size
    * is the weighted sum the caller configured, so there is no blow-up beyond
    * the declared mix.
    */
  def epochMix(df: DataFrame, group: Column, weights: Map[String, Double],
               id: Column, defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "weights must be non-negative repeat factors")
    def chain(f: Double => Long): Column = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(f(defaultWeight))) { case (acc, (k, w)) =>
        when(group === lit(k), lit(f(w))).otherwise(acc)
      }
    val whole = chain(w => math.floor(w).toLong)
    val cut = chain(w => ((w - math.floor(w)) * 4294967296.0).toLong)
    val bonus = when(saltedHash(id, EpochMixSalt) < cut, lit(1L)).otherwise(lit(0L))
    // generator output aliased to reserved names so an input frame that
    // already carries `pos`/`col` columns is not clobbered or dropped
    df.withColumn("__reps", (whole + bonus).cast("int"))
      .select(col("*"), posexplode(array_repeat(lit(true), col("__reps")))
        .as(Seq("__graft_pos", "__graft_col")))
      .withColumn("epoch_copy", col("__graft_pos").cast("long"))
      .drop("__reps", "__graft_pos", "__graft_col")
  }

  /** Salted portable hash: reduce `id` mod 2^31 BEFORE adding the prime salt
    * so the sum can never overflow int64 under ANSI mode; replay in SQL as
    * `portableHash(id % 2^31 + salt)`. */
  def saltedHash(id: Column, salt: Long): Column =
    portableHash(pmod(id.cast("long"), lit(2147483648L)) + lit(salt))

  /** Salt for [[epochMix]]'s fractional draw (prime offset into the portable
    * hash's input space). */
  val EpochMixSalt: Long = 1000003L

  /** Deterministic training-shard assignment: adds `shard` (portable hash of
    * `id` mod `numShards`) and `shard_order` (an independent salted hash) —
    * the export step that turns a curated corpus into N training files with a
    * reproducible within-shard shuffle order. Pure column arithmetic, zero
    * shuffle: the one data movement is the final
    * `write.partitionBy("shard")` (or `repartition($"shard")`), which is the
    * write itself, not this operator. Sorting each shard by `shard_order`
    * gives the epoch-shuffle order without ever materializing a global sort:
    * `sortWithinPartitions` after the repartition keeps it per-shard.
    *
    * Pass a composite `id` (e.g. `id * K + epoch_copy`) when the input went
    * through [[epochMix]] so copies of a document scatter across shards.
    */
  def shardAssign(df: DataFrame, id: Column, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("shard", pmod(portableHash(id), lit(numShards.toLong)))
      .withColumn("shard_order", saltedHash(id, ShardOrderSalt))
  }

  /** Salt for [[shardAssign]]'s within-shard order hash. */
  val ShardOrderSalt: Long = 7368787L
}
