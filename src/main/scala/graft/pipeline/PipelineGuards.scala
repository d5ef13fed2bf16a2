package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Streaming gate for corpus-GLOBAL pipeline operators.
  *
  * Operators whose semantics aggregate across the whole corpus (line-frequency
  * boilerplate counts, document frequency, LSH candidate joins, connected
  * components, per-group quotas) would silently degrade to PER-MICRO-BATCH
  * answers under `readStream` — a line repeated across batches is never seen
  * as boilerplate, a near-dup pair split across batches is never found. The
  * engine's dataset checks gate the same way (D1/D14: batch-only by
  * contract), so these fail fast with the remediation instead of returning
  * wrong answers:
  *
  *  - run the operator inside `foreachBatch` when per-batch scope IS the
  *    intent (each batch is its own corpus);
  *  - use [[graft.streaming.StreamChecks]] cross-batch state operators where
  *    a true streaming variant exists (e.g. cross-batch duplicate flagging);
  *  - or land the stream to a table and run the batch operator on it.
  *
  * Row-local operators (fingerprints, quality signals, token counts, PII
  * redaction, hashSample, multimodal decode) are streaming-safe and are NOT
  * gated.
  */
private[pipeline] object PipelineGuards {
  def requireBatch(df: DataFrame, op: String): Unit =
    require(!df.isStreaming,
      s"$op aggregates across the whole corpus and is batch-only: per-micro-batch " +
        "results would be silently wrong under readStream. Run it inside " +
        "foreachBatch (per-batch scope), use graft.streaming.StreamChecks for " +
        "cross-batch state, or land the stream to a table first.")
}
