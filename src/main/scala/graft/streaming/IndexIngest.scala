package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sim.VectorIndex
import graft.sources.Formats

/** STREAMING INGESTION into the persisted ANN index — the lifecycle
  * composition a production vector store runs continuously: embedding
  * batches arrive on a stream, each micro-batch is encoded against
  * the STORED quantizers (never retrained — `|batch|` work,
  * independent of store size) and becomes searchable immediately,
  * with exactly-once effect under Structured Streaming's
  * at-least-once `foreachBatch` replay contract.
  *
  * The segment design (the memtable/SSTable shape every deployed
  * vector database uses — Milvus "growing vs sealed" segments,
  * Lucene's uncommitted buffer):
  *
  *  - [[ingest]] lands each micro-batch's ENCODED rows in a STAGED
  *    area partitioned by `batch_id` via dynamic partition overwrite
  *    ([[Sinks]] discipline): a replayed batch REPLACES its own
  *    partition instead of duplicating rows, so retries converge.
  *    The sealed `cid=` lists are never touched by the hot path —
  *    no read-modify-write on the index inside a micro-batch.
  *  - [[searchAll]] probes sealed ∪ staged: the staged rows carry
  *    the same (vec_id, codes, cid) schema, so the union feeds the
  *    unchanged probe/ADC/rerank pipeline and freshly streamed
  *    vectors are findable BEFORE any publish.
  *  - [[publish]] seals: folds all staged rows into the `cid=`
  *    inverted lists (one partitioned append — the
  *    [[VectorIndex.append]] write shape) and clears the staging
  *    area. A maintenance op like [[VectorIndex.compact]], run
  *    between stream runs, not inside the hot path.
  *
  * Scale shape: per micro-batch cost is encode (two broadcast joins)
  * + one write of `|batch|` rows; search overhead of the growing
  * segment is one extra scan of staged rows (bounded by publish
  * cadence); publish is one pass over staged rows touching only the
  * cid partitions they map to.
  */
object IndexIngest {

  private[graft] def staged(path: String) = s"$path/staged"

  /** Run the embedding stream `batches` (vec_id, v, nrm) into the
    * staging area of the index at `path`. `AvailableNow` drains what
    * is present and stops — the harness lifecycle; a production run
    * would use a processing-time trigger with the same body.
    */
  def ingest(s: SparkSession, path: String, batches: DataFrame,
      checkpoint: String): Unit = {
    val cent = s.read.parquet(VectorIndex.centPath(path)).localCheckpoint()
    val cb = s.read.parquet(VectorIndex.cbPath(path)).localCheckpoint()
    val q = batches.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        Formats.backfillPartitions(
          VectorIndex.encode(b, cent, cb)
            .withColumn("batch_id", lit(batchId)),
          "batch_id", staged(path))
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def stagedRows(s: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(staged(path))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      s.read.parquet(staged(path)).select("vec_id", "codes", "cid")
    else s.emptyDataFrame
  }

  /** IVFADC over sealed ∪ staged — streamed vectors are searchable
    * before any publish. Falls back to the sealed-only scan when the
    * staging area is empty or absent.
    */
  def searchAll(s: SparkSession, path: String, q: DataFrame,
      corpus: DataFrame): DataFrame = {
    val sealedLists = s.read.parquet(VectorIndex.lists(path))
      .withColumn("cid", col("cid").cast("long"))
      .select("vec_id", "codes", "cid")
    val st = stagedRows(s, path)
    val all = if (st.isEmpty) sealedLists else sealedLists.unionByName(st)
    VectorIndex.searchLists(s, path, all, q, corpus)
  }

  /** Seal the staging area: fold every staged row into the `cid=`
    * inverted lists and clear staging. Returns the number of rows
    * published. Not idempotent mid-crash (a maintenance op, like
    * compaction — rerun [[ingest]] replay semantics do not apply);
    * the staged read is localCheckpoint-materialized so the delete
    * cannot race the append's lineage.
    */
  def publish(s: SparkSession, path: String): Long = {
    val st = stagedRows(s, path)
    if (st.isEmpty) 0L
    else {
      val rows = st.localCheckpoint()
      val n = rows.count()
      rows.write.mode("append").partitionBy("cid")
        .parquet(VectorIndex.lists(path))
      val p = new org.apache.hadoop.fs.Path(staged(path))
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      n
    }
  }
}
