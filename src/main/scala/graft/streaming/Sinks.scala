package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Formats

/** Exactly-once micro-batch landing ([ext] §2.9 sink surface).
  *
  * Structured Streaming's `foreachBatch` contract is AT-LEAST-once: a
  * sink-side failure after a partial write replays the whole batch
  * with the SAME `batchId` on recovery, so a plain `mode("append")`
  * writer duplicates every row of the replayed batch. The standard
  * production fix is to make the write a deterministic function of
  * `batchId`: land each micro-batch in its own `batch_id=<n>`
  * partition through dynamic partition overwrite
  * ([[Formats.backfillPartitions]]), so a replay REPLACES the batch's
  * own partition and touches nothing else — retries converge to the
  * same table instead of growing it.
  *
  * Scale shape: the sink inherits the backfill property that only the
  * replayed batch's files are rewritten; committed history is never
  * re-opened, so recovery cost is one micro-batch regardless of table
  * size.
  */
object Sinks {

  /** A `foreachBatch` body landing each batch idempotently at `path`. */
  def idempotentBatchSink(path: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      Formats.backfillPartitions(
        df.withColumn("batch_id", lit(batchId)), "batch_id", path)
}
