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
