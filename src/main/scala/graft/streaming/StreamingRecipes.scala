package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming recipes for the corpus-global pipeline operators.
  *
  * Operators like exact dedup and decontamination are hard-gated batch-only
  * ([[graft.pipeline.PipelineGuards]]): under `readStream` they would
  * silently degrade to per-micro-batch answers. These recipes are the two
  * CORRECT streaming forms, mirroring the reference's per-micro-batch
  * dataset-check stance (check_funcs.py:1835):
  *
  *  - '''per-batch scope''' ([[dedupExactPerBatch]]): each micro-batch is its
  *    own corpus; the batch-only operator runs inside `foreachBatch`, where
  *    the frame is a plain batch DataFrame. Right when batches are natural
  *    units (a file drop, an hourly partition).
  *  - '''cross-batch scope''' ([[StreamChecks.firstSeenRows]]): keep-first by
  *    key across ALL batches via state-store state. Right when the key space
  *    must be deduped over the stream's lifetime; state is per-key and can be
  *    TTL'd.
  *
  * Anything needing corpus-global JOINS among the STREAM's own rows (MinHash
  * bands, decontamination n-gram joins) has no streaming form — land the
  * stream to a table and run the batch operator on schedule. Joins against a
  * STATIC reference corpus, by contrast, stream fine:
  * [[dedupAgainstReferencePerBatch]] builds the reference bloom once and
  * reuses it for every micro-batch.
  */
object StreamingRecipes {

  /** `foreachBatch` writer running exact keep-first dedup per micro-batch,
    * then handing the deduped batch to `sink`. The batch-only guard never
    * fires: inside foreachBatch the micro-batch is a batch frame.
    */
  def dedupExactPerBatch(stream: DataFrame, keyCols: Seq[String], orderCol: String)
                        (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Dedup.dedupExact(batch, keyCols.map(col), col(orderCol)), batchId)
    }

  /** Continuous-ingest dedup against a static prior corpus: each micro-batch
    * keeps only rows whose `keyCol` is NOT already in `ref` (exact anti-join
    * semantics). The expensive part — the one-pass bloom build over the
    * reference — happens ONCE, here, at recipe-construction time; per batch
    * the cost is a row-local bloom probe plus the exact confirm join over the
    * (tiny) bloom-positive slice. The filter does NOT learn the stream's own
    * rows (batches never dedup against each other — compose with
    * [[StreamChecks.firstSeenRows]] for cross-batch keep-first within the
    * stream itself).
    */
  def dedupAgainstReferencePerBatch(stream: DataFrame, keyCol: String,
                                    ref: DataFrame, refKey: String,
                                    fpp: Double = 0.01,
                                    expectedRefItems: Option[Long] = None)
                                   (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    dedupAgainstReferencePerBatch(stream, keyCol,
      Dedup.buildReferenceFilter(ref, col(refKey), fpp, expectedRefItems))(sink)

  /** Same recipe with a CALLER-OWNED [[Dedup.ReferenceFilter]] — build it
    * once, run the stream, and `filter.refKeys.unpersist()` after the query
    * stops. (The convenience overload above builds the filter internally;
    * its cached ref-keys frame then lives for the application lifetime,
    * which is the right trade only when the stream does too.)
    */
  def dedupAgainstReferencePerBatch(stream: DataFrame, keyCol: String,
                                    filter: Dedup.ReferenceFilter)
                                   (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Dedup.dedupAgainstReference(batch, col(keyCol), filter), batchId)
    }

  /** NEAR-dup analog of [[dedupAgainstReferencePerBatch]]: each micro-batch
    * keeps only rows that are not MinHash near-duplicates (exact-verified
    * Jaccard >= threshold) of the static reference corpus. The reference's
    * LSH index — band rows + shingle sets — is built and persisted ONCE at
    * recipe-construction time; per batch the cost is the batch's own
    * sketching plus the cross-bucket candidate join. As with the exact
    * recipe, the index does not learn the stream's own rows.
    */
  def dropNearDupsAgainstReferencePerBatch(stream: DataFrame, idCol: String, textCol: String,
                                           ref: DataFrame, refIdCol: String, refTextCol: String,
                                           shingleSize: Int = 3, numHashes: Int = 64,
                                           bands: Int = 16, threshold: Double = 0.8)
                                          (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    dropNearDupsAgainstReferencePerBatch(stream, idCol, textCol,
      Dedup.buildNearDupIndex(ref, refIdCol, refTextCol, shingleSize, numHashes, bands),
      threshold)(sink)

  /** Same recipe with a CALLER-OWNED [[Dedup.NearDupIndex]] — build once, run
    * the stream, and unpersist `index.shingles` / `index.bandRows` after the
    * query stops. (The convenience overload's internally built index stays
    * cached for the application lifetime.)
    */
  def dropNearDupsAgainstReferencePerBatch(stream: DataFrame, idCol: String, textCol: String,
                                           index: Dedup.NearDupIndex, threshold: Double)
                                          (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Dedup.dropNearDupsAgainstIndex(batch, idCol, textCol, index, threshold), batchId)
    }

  /** SEMANTIC analog of [[dropNearDupsAgainstReferencePerBatch]] (r10): each
    * micro-batch keeps only rows whose embedding is NOT within cosine
    * `threshold` of any reference-corpus embedding. The coarse cells come
    * from a caller-supplied quantizer (train once on a reference sample via
    * [[graft.pipeline.Similarity.trainKMeans]]); per batch the cost is the
    * batch's row-local cell assignment plus the cross-side in-cell cosine
    * join against the (small, cacheable) reference projection — the batch
    * never self-joins.
    */
  def dropSemanticDupsAgainstReferencePerBatch(stream: DataFrame, idCol: String, vecCol: String,
                                               ref: DataFrame, refIdCol: String, refVecCol: String,
                                               centroids: Array[Array[Double]],
                                               threshold: Double = 0.95,
                                               maxCellSize: Int = 100000)
                                              (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Dedup.dropSemanticDupsAgainstReference(batch, idCol, vecCol,
        ref, refIdCol, refVecCol, centroids, threshold, maxCellSize), batchId)
    }

  /** Cross-batch CANONICAL-URL dedup ids for a continuous crawl: each row is
    * keyed by [[graft.pipeline.UrlAnalysis.canonicalUrl]] (row-local, rides
    * the stream's scan) and only the FIRST id ever seen per canonical page
    * survives, across all micro-batches, via
    * [[StreamChecks.firstSeenRows]]' per-key state. Returns the surviving
    * (canonical_url, id) stream — semi-join it back to the full rows
    * downstream, or TTL the state for a bounded working set (after expiry a
    * re-crawled page is emitted again). Non-URL strings key by their own raw
    * value (never merged); rows with a NULL url or id are EXCLUDED from the
    * output (no page identity to dedup on — route them separately upstream).
    */
  def dedupByCanonicalUrlCrossBatch(stream: DataFrame, urlCol: String, idCol: String,
                                    stateTtlMs: Option[Long] = None)
      : org.apache.spark.sql.Dataset[StreamChecks.KeyedRow] = {
    import stream.sparkSession.implicits._
    // fail fast on non-integral ids: the silent long cast would otherwise
    // null every rowId and the isNotNull guard below would drop the whole
    // stream — same contract as StreamChecks.bandDocuments
    stream.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      case other => throw new IllegalArgumentException(
        s"dedupByCanonicalUrlCrossBatch: idCol '$idCol' must be an integral type " +
          s"(got ${other.sql}); derive a surrogate id (e.g. xxhash64 of the natural key) first")
    }
    val keyed = stream.select(
      graft.pipeline.UrlAnalysis.canonicalUrl(col(urlCol)).as("key"),
      col(idCol).cast("long").as("rowId"))
      .where(col("key").isNotNull && col("rowId").isNotNull)
      .as[StreamChecks.KeyedRow]
    StreamChecks.firstSeenRows(keyed, stateTtlMs)
  }

  /** Per-micro-batch drift monitor against a stored model baseline
    * ([[graft.anomaly.Drift]] / [[graft.anomaly.ModelRegistry]]): each batch
    * is one fused aggregation pass; the result goes to `onResult` alongside
    * the batch id, and the (possibly drift-gated) batch rows go to `sink`.
    * The production retrain loop: alert or requeue training when
    * `result.recommendation == "retrain"`. Small batches are skipped by
    * Drift's min-sample gate rather than raising false alarms.
    */
  def driftMonitorPerBatch(stream: DataFrame, columns: Seq[String],
                           baseline: Map[String, graft.anomaly.Drift.ColumnStats],
                           threshold: Double = 3.0,
                           minSampleSize: Long = graft.anomaly.Drift.MinSampleSizeForDrift)
                          (onResult: (graft.anomaly.Drift.DriftResult, Long) => Unit)
                          (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val res = graft.anomaly.Drift.computeDriftScore(
        batch, columns, baseline, threshold, minSampleSize)
      onResult(res, batchId)
      sink(batch, batchId)
    }

  /** Per-micro-batch body of [[ivfPqAppendPerBatch]], exposed so the replay
    * contract is directly testable: encode `batch` with the FROZEN coarse +
    * product quantizers and append `partitionBy("cell")` to `indexPath`,
    * filtering out any `neighbor_id` already present in the touched cells.
    *
    * Delivery semantics: `foreachBatch` is AT-LEAST-ONCE — a micro-batch
    * retried after a failure (checkpoint offsets commit AFTER the batch
    * function returns) re-runs this body, and a plain parquet append has no
    * batchId-keyed transaction to make that a no-op (ADVICE r12). The
    * replay guard restores effective exactly-once at the ROW level: a
    * replayed row carries the same id and (frozen model) the same cell, so
    * the anti-join drops it and the rerun appends nothing. Requires ids
    * unique across the corpus; re-ingesting a CHANGED vector under an
    * existing id is an update, which an append-only index cannot express —
    * rebuild instead ([[graft.pipeline.Pq.ivfPqBuildIndex]]).
    *
    * Guard cost: one column-pruned scan of `neighbor_id` over the touched
    * `cell=` partitions per batch (partition-pruned at the storage layer,
    * same as queries). `replayGuard = false` skips it when the caller
    * already guarantees no-replay delivery and wants pure append throughput;
    * duplicates then surface as clones occupying multiple top-k slots in
    * [[graft.pipeline.Pq.ivfPqTopKIndexed]].
    *
    * SINGLE WRITER REQUIRED (VERDICT r13): census → anti-join → append is
    * not atomic. Two concurrent writers to one index path (two streams, or
    * a stream racing a backfill) appending overlapping ids BOTH pass the
    * guard and BOTH append — duplicates return. Run exactly one writer per
    * index path; the same exclusion applies both ways against
    * [[graft.pipeline.Pq.ivfPqCompactIndex]] (see its "PAUSE INGEST" note):
    * never compact while a writer is live, never write while a compaction
    * runs.
    */
  def ivfPqAppendBatch(model: graft.pipeline.Pq.IvfPqIndexModel, batch: DataFrame,
                       idCol: String, vecCol: String, indexPath: String,
                       replayGuard: Boolean = true): Unit = {
    val spark = batch.sparkSession
    val encoded = graft.pipeline.Pq.ivfPqAppendToIndex(model, batch, idCol, vecCol)
    def write(df: DataFrame): Unit =
      df.write.mode("append").partitionBy("cell").parquet(indexPath)
    // file-census existence check, not bare exists(): an empty directory
    // (no cell= data yet) would fail parquet schema inference
    if (!replayGuard ||
        graft.pipeline.Pq.ivfPqIndexFileStats(spark, indexPath).forall(_.files == 0)) {
      write(encoded)
      return
    }
    // Cache the encoded batch: the guard needs TWO actions over it (the
    // touched-cell census, then the guarded append), and re-running the
    // encode projection per action doubled every micro-batch's scan/encode
    // cost (ADVICE r13). Micro-batches are small; memory-and-disk is safe.
    val cached = encoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // driver-side touched-cell list: bounded by the model's cell count,
      // and as literals the isin() prunes index partitions at plan time
      val touched = cached.select(col("cell")).distinct().collect().map(_.get(0))
      if (touched.isEmpty) write(cached)
      else {
        val existing = spark.read.parquet(indexPath)
          .where(col("cell").isin(touched.toSeq: _*))
          .select(col("neighbor_id"))
        write(cached.join(existing, Seq("neighbor_id"), "left_anti"))
      }
    } finally {
      cached.unpersist(blocking = false)
      ()
    }
  }

  /** Continuous ANN-index ingest: each micro-batch of new embeddings is
    * encoded with the FROZEN coarse + product quantizers
    * ([[graft.pipeline.Pq.ivfPqAppendToIndex]] — zero training, one
    * projection) and appended `partitionBy("cell")` to the index location,
    * so readers keep partition-pruning their probes while the corpus grows.
    * Pair with a scheduled [[graft.pipeline.Pq.ivfPqCellSkew]] read: when
    * appended data drifts (skew > ~4), rebuild the index in batch and swap
    * the location.
    *
    * Delivery: at-least-once from the engine, made effectively exactly-once
    * by [[ivfPqAppendBatch]]'s id-level replay guard (see its scaladoc for
    * the contract, its SINGLE-WRITER requirement, and cost). Always set a
    * `checkpointLocation` on the returned writer.
    */
  def ivfPqAppendPerBatch(stream: DataFrame, model: graft.pipeline.Pq.IvfPqIndexModel,
                          idCol: String, vecCol: String,
                          indexPath: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      ivfPqAppendBatch(model, batch, idCol, vecCol, indexPath)
    }
}
