package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True-streaming quality checks — beyond the reference's per-micro-batch
  * scoping (SURVEY §2.6: the reference has tumbling windows but NO watermarks
  * and no cross-batch state). These operators maintain correct semantics under
  * late data and across batches:
  *
  *  - [[freshnessViolationsPerWindow]]: watermarked tumbling-window counts;
  *    a window that closes below the threshold emits one violation row.
  *  - [[gapEvents]]: cross-batch gap detection per key via
  *    flatMapGroupsWithState — emits a gap event when the stream for a key
  *    stays silent longer than the allowed gap (processing-time timeout).
  */
object StreamChecks {

  /** Windows that closed (watermark passed) with fewer than `minRecords` rows.
    * Append-mode-safe: results emit exactly once per window when it finalizes.
    */
  def freshnessViolationsPerWindow(stream: DataFrame, tsCol: String,
                                   windowMinutes: Int, minRecords: Long,
                                   watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$windowMinutes minutes"))
      .agg(count(lit(1)).as("record_count"))
      .where(col("record_count") < minRecords)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("record_count"))

  final case class KeyedEvent(key: String, eventTimeMs: Long)
  final case class GapState(lastSeenMs: Long)
  final case class GapEvent(key: String, lastSeenMs: Long, gapMs: Long)

  final case class KeyedRow(key: String, rowId: Long)
  final case class SeenState(firstRowId: Long, count: Long)
  final case class DupEvent(key: String, rowId: Long, firstRowId: Long, dupIndex: Long)

  /** Cross-batch duplicate detection: emits a [[DupEvent]] for every row whose
    * key was already seen in this OR any earlier micro-batch — the stateful
    * complement to the reference's is_unique, which is explicitly scoped to
    * one micro-batch (check_funcs.py:1835). Per-key state is one (firstRowId,
    * count) pair in the state store. Pass `stateTtlMs` to expire keys after a
    * silence window (processing-time timeout) so state tracks the active-key
    * working set, not the stream's whole history; None keeps state forever —
    * right for bounded key domains, and for triggers like AvailableNow where
    * timeout wake-up batches never run.
    */
  def duplicateEvents(rows: Dataset[KeyedRow],
                      stateTtlMs: Option[Long] = None): Dataset[DupEvent] = {
    import rows.sparkSession.implicits._
    val timeout = if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, DupEvent](OutputMode.Append(), timeout) {
        (key: String, it: Iterator[KeyedRow], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(SeenState(Long.MinValue, 0L))
            val dups = scala.collection.mutable.ArrayBuffer.empty[DupEvent]
            it.foreach { r =>
              if (s.count == 0L) s = SeenState(r.rowId, 1L)
              else {
                s = s.copy(count = s.count + 1)
                dups += DupEvent(key, r.rowId, s.firstRowId, s.count - 1)
              }
            }
            state.update(s)
            stateTtlMs.foreach(state.setTimeoutDuration)
            dups.iterator
          }
      }
  }

  /** Cross-batch KEEP-FIRST dedup: emits only the first row ever seen for
    * each key, across all micro-batches — the streaming form of
    * `Dedup.dedupExact` (which is corpus-global and therefore batch-gated).
    * The complement of [[duplicateEvents]]: that emits the duplicates, this
    * emits the survivors. Per-key state is one boolean-sized record; pass
    * `stateTtlMs` to expire silent keys (after expiry a key's next row is
    * emitted again — bounded state trades exactness on cold keys).
    */
  def firstSeenRows(rows: Dataset[KeyedRow],
                    stateTtlMs: Option[Long] = None): Dataset[KeyedRow] = {
    import rows.sparkSession.implicits._
    val timeout = if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, KeyedRow](OutputMode.Append(), timeout) {
        (key: String, it: Iterator[KeyedRow], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(SeenState(Long.MinValue, 0L))
            val kept = scala.collection.mutable.ArrayBuffer.empty[KeyedRow]
            it.foreach { r =>
              if (s.count == 0L) {
                s = SeenState(r.rowId, 1L)
                kept += r
              } else s = s.copy(count = s.count + 1)
            }
            state.update(s)
            stateTtlMs.foreach(state.setTimeoutDuration)
            kept.iterator
          }
      }
  }

  final case class BandedDoc(bucketKey: String, docId: Long, signature: Array[Long])
  final case class BucketState(docIds: Array[Long], signatures: Array[Array[Long]])
  final case class NearDupEvent(docId: Long, matchedDocId: Long, estJaccard: Double)

  /** Cross-batch NEAR-duplicate detection — the streaming form of
    * `Dedup.minHashDuplicatePairs` (which is corpus-global and batch-gated):
    * a document is flagged when it lands in an LSH band bucket already
    * holding a document whose MinHash signature agrees on at least
    * `threshold` of its components (the standard unbiased Jaccard estimator).
    *
    * State shape: per bucket, up to `maxDocsPerBucket` (docId, signature)
    * pairs — buckets past the cap stop absorbing new members (skew guard, the
    * streaming analog of the batch path's maxBucketSize; a degenerate bucket
    * would otherwise grow state without bound). A pair sharing several
    * buckets is emitted once per shared bucket — route the output through
    * [[firstSeenRows]] keyed on the pair to dedupe, or dedupe downstream.
    * Pass `stateTtlMs` to expire buckets after a silence window so state
    * tracks the active working set.
    *
    * Verification is estimator-based (signature agreement), not exact-shingle
    * Jaccard as in the batch path: the stream never materializes shingle
    * sets into state, so state is O(buckets x cap x signature-width) longs.
    */
  def nearDupEvents(banded: Dataset[BandedDoc],
                    threshold: Double = 0.8, maxDocsPerBucket: Int = 8,
                    stateTtlMs: Option[Long] = None): Dataset[NearDupEvent] = {
    import banded.sparkSession.implicits._
    require(threshold > 0 && threshold <= 1, "threshold must be in (0,1]")
    require(maxDocsPerBucket >= 1, "maxDocsPerBucket must be >= 1")
    val timeout = if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    banded
      .groupByKey(_.bucketKey)
      .flatMapGroupsWithState[BucketState, NearDupEvent](OutputMode.Append(), timeout) {
        (_: String, it: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(
              BucketState(Array.emptyLongArray, Array.empty))
            val events = scala.collection.mutable.ArrayBuffer.empty[NearDupEvent]
            it.foreach { d =>
              // signature width comes from the rows themselves (no redundant
              // numHashes parameter to mis-wire against bandDocuments)
              val width = d.signature.length
              var i = 0
              while (i < s.docIds.length) {
                if (s.docIds(i) != d.docId && s.signatures(i).length == width) {
                  var eq = 0
                  var j = 0
                  while (j < width) {
                    if (s.signatures(i)(j) == d.signature(j)) eq += 1
                    j += 1
                  }
                  val est = eq.toDouble / width
                  if (est >= threshold)
                    events += NearDupEvent(d.docId, s.docIds(i), est)
                }
                i += 1
              }
              // store each doc once: an at-least-once source replaying a doc
              // must not fill the bucket cap with copies of it
              if (s.docIds.length < maxDocsPerBucket && !s.docIds.contains(d.docId))
                s = BucketState(s.docIds :+ d.docId, s.signatures :+ d.signature)
            }
            state.update(s)
            stateTtlMs.foreach(state.setTimeoutDuration)
            events.iterator
          }
      }
  }

  /** Row-local banding stage for [[nearDupEvents]]: per document, the MinHash
    * signature (computed once, codegen'd kernels) plus one [[BandedDoc]] row
    * per LSH band. Streaming-safe — no shuffle, no corpus-global state; the
    * stateful join happens inside [[nearDupEvents]]'s state store.
    */
  def bandDocuments(stream: DataFrame, idCol: String, textCol: String,
                    shingleSize: Int = 3, numHashes: Int = 64,
                    bands: Int = 16): Dataset[BandedDoc] = {
    import stream.sparkSession.implicits._
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    // fail fast on non-integral ids: the silent long cast would otherwise
    // yield a null docId and crash the Dataset[BandedDoc] encoder mid-stream
    // ("Null value appeared in non-nullable field") — same contract as
    // Curation.packSequences
    stream.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      case other => throw new IllegalArgumentException(
        s"bandDocuments: idCol '$idCol' must be an integral type (got ${other.sql}); " +
          "derive a surrogate id (e.g. xxhash64 of the natural key) first")
    }
    import org.apache.spark.sql.GraftColumnBridge
    val hsh = GraftColumnBridge.column(graft.pipeline.HashedShingles(
      GraftColumnBridge.expression(col(textCol)), shingleSize))
    val bandArr = GraftColumnBridge.column(graft.pipeline.MinHashBands(
      GraftColumnBridge.expression(hsh), numHashes, bands))
    stream
      .select(col(idCol).cast("long").as("docId"),
        graft.pipeline.Dedup.minHashSignature(hsh, numHashes).as("signature"),
        posexplode(bandArr).as(Seq("band", "bandhash")))
      .select(concat_ws(":", col("band"), col("bandhash")).as("bucketKey"),
        col("docId"), col("signature"))
      .as[BandedDoc]
  }

  /** Emits a [[GapEvent]] when a key goes silent for more than `maxGapMs`
    * (processing-time timeout, cross-batch state in the state store).
    */
  def gapEvents(events: Dataset[KeyedEvent], maxGapMs: Long): Dataset[GapEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[GapState, GapEvent](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[GapState]) =>
          if (state.hasTimedOut) {
            val last = state.getOption.map(_.lastSeenMs).getOrElse(0L)
            state.remove()
            Iterator.single(GapEvent(key, last, System.currentTimeMillis() - last))
          } else {
            val maxSeen = rows.map(_.eventTimeMs).foldLeft(
              state.getOption.map(_.lastSeenMs).getOrElse(0L))(math.max)
            state.update(GapState(maxSeen))
            state.setTimeoutDuration(maxGapMs)
            Iterator.empty
          }
      }
  }
}
