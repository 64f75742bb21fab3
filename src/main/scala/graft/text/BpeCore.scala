package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The BPE merge machinery shared by the word-level trainer
  * ([[BpeTrainer]]) and the byte-level trainer ([[ByteBpe]]): the
  * islands-parity greedy rewrite, the training fixpoint, and the
  * unrolled-round oracle generator. Extracted (round 8) so the
  * byte-level trainer is the SAME loop over a different seed
  * alphabet — exactly the claim that the relational formulation
  * transfers unchanged.
  *
  * See [[BpeTrainer]]'s scaladoc for the full derivation of the
  * gaps-and-islands greedy merge and the fixpoint discipline; it is
  * not repeated here.
  */
private[text] object BpeCore {

  /** One greedy left-to-right non-overlapping merge application.
    *
    * `ld` is the pieces frame with the lookahead column already
    * attached: (word, freq, pos, sym, nxt). `best` is a 1-row frame
    * (a, b, ...) naming the pair to merge — NULL fields make the
    * rewrite a provable no-op. Returns the next pieces frame
    * (word, freq, pos, sym) with positions renumbered.
    */
  def applyMerge(ld: DataFrame, best: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("word").orderBy("pos")
    // Islands-parity greedy rewrite (BpeTrainer scaladoc). cum counts
    // candidates up to AND including the row; rk ranks a candidate
    // inside its island (non-candidate rows sharing a grp value
    // contribute 0 and cannot disturb the rank).
    ld.crossJoin(broadcast(best.select("a", "b")))
      .withColumn("cand", col("sym") === col("a") &&
        col("nxt") === col("b"))
      .withColumn("cum",
        sum(when(col("cand"), 1).otherwise(0)).over(wOrd))
      .withColumn("grp", col("pos") - col("cum"))
      .withColumn("rk", sum(when(col("cand"), 1).otherwise(0))
        .over(Window.partitionBy("word", "grp").orderBy("pos")))
      .withColumn("keep_m", col("cand") && col("rk") % 2 === 1)
      .withColumn("absorbed",
        coalesce(lag(col("keep_m"), 1).over(wOrd), lit(false)))
      .filter(!col("absorbed"))
      .select(col("word"), col("freq"),
        row_number().over(wOrd).cast("long").as("pos"),
        when(col("keep_m"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
  }

  /** The training loop over a seeded pieces frame
    * (word, freq, pos, sym). Returns (merges, finalPieces):
    * merges = (rank, left_sym, right_sym, merged, pair_count);
    * finalPieces = the pieces frame after `nMerges` rounds.
    */
  def mergeLoop(s: SparkSession, pieces0: DataFrame,
      nMerges: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.graft.ColumnBridge.statsBarrier

    var pieces = pieces0.localCheckpoint()
    val wOrd = Window.partitionBy("word").orderBy("pos")
    val bests = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    graft.operators.Fixpoint.withScopedShuffle(s, pieces.count()) {
      var exhausted = false
      var k = 0
      while (k < nMerges && !exhausted) {
        k += 1
        val ld = pieces
          .withColumn("nxt", lead(col("sym"), 1).over(wOrd))
        // The round's winning pair as a 1-row frame: min over the
        // (−count, left, right) struct = count DESC, left ASC,
        // right ASC. A global aggregate always yields exactly one
        // row — NULL fields once no pair remains.
        val best = ld.filter(col("nxt").isNotNull)
          .groupBy(col("sym").as("a"), col("nxt").as("b"))
          .agg(sum("freq").as("c"))
          .select(struct((-col("c")).as("nc"), col("a"), col("b")).as("s"))
          .agg(min(col("s")).as("m"))
          .select(col("m.a").as("a"), col("m.b").as("b"),
            (-col("m.nc")).as("c"))
          .localCheckpoint()
        bests += best
        pieces = statsBarrier(applyMerge(ld, best).localCheckpoint())
        // 1-row exhaustion probe (convergence-probe shape): skip the
        // remaining provable-no-op rounds once no pair is left.
        exhausted = best.first().isNullAt(0)
      }
    }

    val merges = bests.zipWithIndex.map { case (b, i) =>
      b.select(lit(i + 1L).as("rank"), col("a").as("left_sym"),
        col("b").as("right_sym"),
        concat(col("a"), col("b")).as("merged"),
        col("c").as("pair_count"))
    }.reduce(_ unionByName _)
      .filter(col("left_sym").isNotNull)
      .localCheckpoint()
    (merges, pieces)
  }

  /** One unrolled merge round of the DuckDB oracle — the identical
    * windows/islands arithmetic as [[applyMerge]] plus the per-round
    * best-pair selection with the same tie-break. Reads `pc${k-1}`,
    * defines `ld$k` / `bs$k` / `cd$k` / `pc$k`. Shared verbatim by
    * the word-level and byte-level oracles (only `tok`/`pc0` differ).
    */
  def roundCtes(k: Int): String = {
    val p = s"pc${k - 1}"
    s"""ld$k AS MATERIALIZED (SELECT word, freq, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       FROM $p),
       bs$k AS MATERIALIZED (SELECT sym AS a, nxt AS b,
           CAST(SUM(freq) AS BIGINT) AS c
         FROM ld$k WHERE nxt IS NOT NULL GROUP BY sym, nxt
         ORDER BY c DESC, a, b LIMIT 1),
       cd$k AS MATERIALIZED (SELECT word, freq, pos, sym, nxt, cand,
           SUM(CASE WHEN cand THEN 1 ELSE 0 END)
             OVER (PARTITION BY word, grp ORDER BY pos) AS rk
         FROM (SELECT word, freq, pos, sym, nxt, cand,
             pos - SUM(CASE WHEN cand THEN 1 ELSE 0 END)
               OVER (PARTITION BY word ORDER BY pos) AS grp
           FROM (SELECT word, freq, pos, sym, nxt,
               (sym = (SELECT a FROM bs$k)
                 AND nxt = (SELECT b FROM bs$k)) AS cand
             FROM ld$k))),
       pc$k AS MATERIALIZED (SELECT word, freq,
           CAST(row_number() OVER (PARTITION BY word ORDER BY pos)
             AS BIGINT) AS pos,
           CASE WHEN keep_m THEN sym || nxt ELSE sym END AS sym
         FROM (SELECT word, freq, pos, sym, nxt, keep_m,
             coalesce(lag(keep_m)
               OVER (PARTITION BY word ORDER BY pos), false) AS absorbed
           FROM (SELECT word, freq, pos, sym, nxt,
               (cand AND rk % 2 = 1) AS keep_m FROM cd$k))
         WHERE NOT absorbed)"""
  }

  /** The merge-table SELECT over `nMerges` unrolled `bs$k` CTEs. */
  def mergeTableSql(nMerges: Int): String =
    s"""mg AS (${(1 to nMerges).map(k =>
        s"SELECT CAST($k AS BIGINT) AS rank, a, b, c FROM bs$k")
        .mkString("\nUNION ALL\n")})
       SELECT rank, a AS left_sym, b AS right_sym,
         a || b AS merged, c AS pair_count
       FROM mg ORDER BY rank"""
}
