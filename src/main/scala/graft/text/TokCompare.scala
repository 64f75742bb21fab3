package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TOKENIZER COMPARISON — the selection study run before committing
  * a pretraining pipeline to a tokenizer: both trained models (the
  * BPE merge tokenizer and the unigram-LM selection tokenizer) are
  * applied to the same corpus and compared per document on
  * compression (pieces per token). Pure composition: the two
  * dictionary-application frames ([[BpeTrainer.bpeEncode]],
  * [[UnigramTrainer.unigramEncode]]) joined on doc_id — both
  * artifacts come from the session-shared Lineage builds, so the
  * comparison costs two hash joins, not two training runs.
  *
  * The oracle states BOTH full training chains in one statement —
  * the BPE chain plus the unigram chain with `u_`-prefixed CTE
  * names (DuckDB hoists MATERIALIZED CTEs into one scope, so
  * nested-WITH shadowing is a binder error; the prefix keeps both
  * chains' 30+ CTEs disjoint) — the two engines each train both
  * tokenizers from scratch and must agree on every per-document
  * number.
  */
object TokCompare {

  def tokCompare(s: SparkSession, dir: String): DataFrame = {
    val b = BpeTrainer.bpeEncode(s, dir)
      .select(col("doc_id"), col("n_tokens").as("bpe_tokens"),
        col("n_pieces").as("bpe_pieces"),
        col("pieces_per_token").as("bpe_ppt"))
    val u = UnigramTrainer.unigramEncode(s, dir)
      .select(col("doc_id"), col("n_tokens").as("uni_tokens"),
        col("n_pieces").as("uni_pieces"),
        col("pieces_per_token").as("uni_ppt"))
    b.join(u, "doc_id")
      .withColumn("piece_delta", col("bpe_pieces") - col("uni_pieces"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_tok_compare" -> tokCompare,
  )

  val oracles: Map[String, String] = Map(
    "ta_tok_compare" ->
      s"""WITH ${BpeTrainer.TrainCtes},
         pw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_p
           FROM pc${BpeTrainer.Merges} GROUP BY word),
         bpd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(n_p) AS BIGINT) AS n_pieces
           FROM tok JOIN pw USING (word) GROUP BY doc_id),
         ${UnigramTrainer.trainCtes("u_")},
         und AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS u_tokens,
             CAST(SUM(np) AS BIGINT) AS u_pieces
           FROM u_tok JOIN (SELECT word, np FROM u_vbb) USING (word)
           GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(bpd.n_tokens, 0) AS bpe_tokens,
           coalesce(bpd.n_pieces, 0) AS bpe_pieces,
           CASE WHEN coalesce(bpd.n_tokens, 0) = 0 THEN NULL
             ELSE CAST(bpd.n_pieces AS DOUBLE)
               / CAST(bpd.n_tokens AS DOUBLE) END AS bpe_ppt,
           coalesce(und.u_tokens, 0) AS uni_tokens,
           coalesce(und.u_pieces, 0) AS uni_pieces,
           CASE WHEN coalesce(und.u_tokens, 0) = 0 THEN NULL
             ELSE CAST(und.u_pieces AS DOUBLE)
               / CAST(und.u_tokens AS DOUBLE) END AS uni_ppt,
           coalesce(bpd.n_pieces, 0) - coalesce(und.u_pieces, 0)
             AS piece_delta
         FROM documents d
           LEFT JOIN bpd ON bpd.doc_id = d.doc_id
           LEFT JOIN und ON und.doc_id = d.doc_id
         ORDER BY d.doc_id""",
  )
}
