package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED TOKENIZER ARTIFACT — the "train once, ship the
  * tokenizer" lifecycle every production pipeline runs (the
  * tokenizer.json shape): training happens once on a corpus
  * snapshot; every later ingest batch is encoded against the STORED
  * tables without retraining, and two pipelines loading the same
  * artifact tokenize identically forever. This is the tokenizer twin
  * of the persisted ANN index ([[graft.sim.VectorIndex]]): the
  * session-cached Lineage frames have session lifetime, a production
  * tokenizer is a durable on-disk table.
  *
  * Layout at `path`:
  *  - `merges`  — the learned BPE merge table (rank, left_sym,
  *    right_sym, merged, pair_count): the audit/provenance record.
  *  - `pieces`  — the final per-vocabulary-word segmentation
  *    (word, freq, pos, sym): because training operates on DISTINCT
  *    words, this table IS the trained tokenizer's encoding of every
  *    vocabulary word, so applying the tokenizer to any batch is one
  *    hash join — no merge-loop replay, `|batch|` work.
  *
  * Out-of-vocabulary words in a later batch are surfaced as
  * `oov_tokens` rather than silently dropped — the signal that
  * triggers retraining in a real pipeline.
  */
object TokenizerStore {

  private def mergesPath(path: String) = s"$path/merges"
  private def piecesPath(path: String) = s"$path/pieces"

  /** Train on the corpus at `dir` (via the session-shared
    * [[BpeTrainer]] artifacts) and persist both tables.
    */
  def save(s: SparkSession, dir: String, path: String): Unit = {
    val (merges, pieces) = BpeTrainer.artifacts(s, dir)
    merges.write.mode("overwrite").parquet(mergesPath(path))
    pieces.write.mode("overwrite").parquet(piecesPath(path))
  }

  /** The stored merge table, rank order. */
  def loadMerges(s: SparkSession, path: String): DataFrame =
    s.read.parquet(mergesPath(path)).orderBy("rank")

  /** Encode an arbitrary (doc_id, text) batch against the STORED
    * tokenizer: reference tokenization, one hash join against the
    * pieces table, per-doc aggregate — plus the OOV census. No
    * retraining, no dependency on the training corpus being
    * reachable.
    */
  def encodeBatch(s: SparkSession, path: String,
      batch: DataFrame): DataFrame = {
    import WordCount.WordRegex
    val perWord = s.read.parquet(piecesPath(path))
      .groupBy("word").agg(count(lit(1)).as("n_p"))
    val toks = batch.select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(WordRegex), lit(0)))
          .as("t"))
      .select(col("doc_id"), upper(col("t")).as("word"))
    val perDoc = toks
      .join(perWord, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("n_p").isNull, 1L).otherwise(0L)).as("oov_tokens"),
        coalesce(sum("n_p"), lit(0L)).as("n_pieces"))
    batch.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
      .orderBy("doc_id")
  }
}
