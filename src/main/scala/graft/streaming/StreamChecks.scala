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
