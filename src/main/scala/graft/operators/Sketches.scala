package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Approximate-analytics tier: mergeable sketches.
  *
  * At 100 TB, "what is the 90th-percentile quality score" cannot be a
  * global sort (q26's exact path): the scale shape is a SKETCH built
  * as a partial aggregate — every partition folds its rows into a
  * bounded-size summary, summaries merge associatively up the
  * aggregation tree, and only the final merged sketch is queried.
  * Spark's `percentile_approx` (Greenwald–Khanna) and
  * `count_min_sketch` are exactly this shape; the plan audit in
  * SketchesSpec asserts the partial/final split is really there, and
  * the error-bound specs hold the estimates to the published
  * guarantees against exact answers (GK: rank error ≤ n/accuracy;
  * CMS: one-sided, ≤ εN overestimate at confidence 1−δ).
  *
  * [ext] — no reference analogue; north-star quality-thresholding
  * surface for a pre-training pipeline.
  */
object Sketches {

  val Quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)

  /** GK accuracy: rank error ≤ n/Accuracy (so ≤ 1 row up to n=10⁴,
    * ≤ 0.01% of the corpus beyond — per-partition memory stays
    * O(Accuracy·log n) regardless of corpus size).
    */
  val Accuracy = 10000

  /** Approximate quantiles of the per-doc mean token length (the
    * continuous quality score of [[TextAnalysis.quality]]) — the
    * thresholds a quality-filter stage cuts at.
    */
  def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    val qlit = array(Quantiles.map(lit): _*)
    TextAnalysis.quality(s, dir)
      .select(col("mean_tok_len"))
      .agg(percentile_approx(col("mean_tok_len"), qlit, lit(Accuracy))
        .as("vals"))
      .select(posexplode(col("vals")).as(Seq("i", "approx")))
      .select(element_at(qlit, col("i") + 1).as("q"), col("approx"))
      .orderBy("q")
  }

  // -----------------------------------------------------------------
  // ta_quantile_sketch (DECLARED, band-membership gate — VERDICT r4
  // item 3): the GK sketch cannot hash-match an exact engine (its
  // guarantee is a rank BAND, not an exact rank), so the declared
  // query emits, per quantile, the EXACT values at the band's rank
  // endpoints plus `in_band` = whether the sketch estimate falls
  // inside — and the DuckDB oracle computes the identical exact band
  // and emits `in_band = TRUE`. The hash matches iff (a) both engines
  // derive the same exact band (same data, same rank arithmetic) and
  // (b) the sketch honors the GK guarantee; a broken sketch turns the
  // row red. Band ranks: target rank q·n widened by the guarantee
  // ±n/Accuracy and ±1 slack for the q·n vs q·(n−1) boundary
  // convention (the same slack SketchesSpec uses), clamped to [1, n].
  //
  // SELF-AUDITING GATE, like q68_bucketed_join: the exact band
  // derivation (a global row_number) is the verification harness
  // co-located in the declared query, not the production shape — a
  // 100 TB pipeline runs [[quantileSketch]] alone (plan-audited
  // partial/final merge in SketchesSpec) and never materializes
  // exact ranks. The gate's sort costs one total-order shuffle of a
  // single double column at fixture scale.
  def quantileSketchGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eps = 1.0 / Accuracy
    val v = TextAnalysis.quality(s, dir)
      .filter(col("mean_tok_len").isNotNull)
      .select(col("mean_tok_len").as("v"))
    val ranked = v
      .withColumn("r", row_number().over(Window.orderBy("v")).cast("long"))
    val n = broadcast(v.agg(count(lit(1)).as("n")))
    val qf = quantileSketch(s, dir).crossJoin(n)
      .select(col("q"), col("approx"),
        greatest(lit(1L),
          floor((col("q") - lit(eps)) * col("n")) - lit(1L)).as("lo_r"),
        least(col("n"),
          ceil((col("q") + lit(eps)) * col("n")) + lit(1L)).as("hi_r"))
    qf.join(ranked.select(col("r").as("lo_r"), col("v").as("band_lo")),
        "lo_r")
      .join(ranked.select(col("r").as("hi_r"), col("v").as("band_hi")),
        "hi_r")
      .select(col("q"), col("band_lo"), col("band_hi"),
        (col("approx") >= col("band_lo") &&
          col("approx") <= col("band_hi")).as("in_band"))
      .orderBy("q")
  }

  // -----------------------------------------------------------------
  // ta_heavy_hitters: φ-frequent bigrams via the two-pass distributed
  // heavy-hitter pattern — per-partition Misra–Gries candidates, then
  // an exact recount restricted to the candidate set.
  //
  // Misra–Gries(k) on a partition of n_p items keeps every item that
  // occurs more than n_p/(k+1) times there. An item missed by EVERY
  // partition therefore has global count ≤ Σ n_p/(k+1) = N/(k+1) —
  // so with k+1 = 2048 > HHDenom = 1000, any bigram at or above the
  // declared threshold ceil(N/1000) is guaranteed to be a candidate
  // somewhere (superset property; SketchesSpec proves it on a skewed
  // stream where distinct ≫ k). The exact recount then makes the
  // OUTPUT exact — frequency ≥ ceil(N/1000), independent of MG
  // internals — which is why this sketch query is hash-gated while
  // the GK quantile one cannot be.
  //
  // Scale shape: pass 1 is a scan + O(k)-memory fold per partition
  // emitting ≤ k candidates each (a few KB); pass 2 shuffles ONLY
  // rows matching the broadcast candidate set — at 100 TB the full
  // bigram space never shuffles, which is the entire point versus the
  // plain groupBy of ta_bigrams. The third mergeable summary in this
  // tier (GK quantiles, count-min counts, MG frequents).
  val HHCounters = 2047
  val HHDenom = 1000L

  /** Misra–Gries(k): one pass, ≤ k counters. The decrement-all step
    * amortizes O(1)/item (each decrement cancels one increment).
    */
  private[operators] def misraGries(k: Int, it: Iterator[String]): Iterator[String] = {
    val ctr = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      ctr.get(x) match {
        case Some(c) => ctr(x) = c + 1
        case None if ctr.size < k => ctr(x) = 1L
        case None =>
          val dead = List.newBuilder[String]
          ctr.foreach { case (key, c) =>
            if (c == 1L) dead += key else ctr(key) = c - 1
          }
          dead.result().foreach(ctr.remove)
      }
    }
    ctr.keysIterator
  }

  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = col("toks")
    def bigrams: DataFrame = graft.Tables(s, dir, "documents")
      .select(graft.functions.TextHash.tokens(col("text")).as("toks"))
      .select(explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2), i =>
          concat(element_at(toks, i + 1), lit(" "),
            element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("bigram"))

    val candidates = bigrams.as[String]
      .mapPartitions(it => misraGries(HHCounters, it))
      .toDF("bigram").distinct()

    // Threshold stays IN-PLAN (broadcast 1-row scalar, no action):
    // N = Σ max(|toks|-1, 0) from a narrow scan, no explode needed.
    val total = graft.Tables(s, dir, "documents")
      .select(graft.functions.TextHash.tokens(col("text")).as("toks"))
      .agg(sum(greatest(size(toks) - 1, lit(0))).cast("double").as("n"))

    bigrams
      .join(broadcast(candidates), "bigram")
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= ceil(col("n") / HHDenom))
      .select(col("bigram"), col("cnt"))
      .orderBy(desc("cnt"), asc("bigram"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_quantile_sketch" -> quantileSketchGate,
    "ta_heavy_hitters" -> heavyHitters,
  )

  val oracles: Map[String, String] = Map(
    // Band-membership gate (see [[quantileSketchGate]]): the oracle
    // derives the identical exact rank band and asserts membership by
    // emitting the literal TRUE the Spark side must reproduce.
    "ta_quantile_sketch" -> {
      val eps = 1.0 / Accuracy
      val qList = Quantiles.mkString("[", ",", "]")
      s"""WITH d AS (SELECT ${TextAnalysis.Toks} AS toks FROM documents),
         b AS (SELECT
           CAST(list_sum(list_prepend(0, list_transform(toks,
             t -> length(t)))) AS BIGINT) AS tok_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens FROM d),
         vv AS (SELECT CAST(tok_chars AS DOUBLE) / nullif(n_tokens, 0)
           AS v FROM b),
         ranked AS (SELECT v, CAST(row_number() OVER (ORDER BY v)
           AS BIGINT) AS r FROM vv WHERE v IS NOT NULL),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
         qs AS (SELECT unnest($qList) AS q),
         qf AS (SELECT q,
             GREATEST(CAST(1 AS BIGINT),
               CAST(floor((q - $eps) * n) AS BIGINT) - 1) AS lo_r,
             LEAST(n, CAST(ceil((q + $eps) * n) AS BIGINT) + 1) AS hi_r
           FROM qs CROSS JOIN n)
         SELECT q, lo.v AS band_lo, hi.v AS band_hi, TRUE AS in_band
         FROM qf JOIN ranked lo ON lo.r = qf.lo_r
           JOIN ranked hi ON hi.r = qf.hi_r
         ORDER BY q"""
    },
    // Exact because the MG candidates only PRUNE; the recount +
    // threshold decide membership. ceil(n/1000.0) is the same IEEE
    // double division on both engines, so the threshold is identical.
    "ta_heavy_hitters" ->
      s"""WITH d AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+')
           AS toks FROM documents),
         b AS (SELECT unnest(CASE WHEN len(toks) >= 2 THEN
             list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])
           ELSE [] END) AS bigram FROM d),
         tot AS (SELECT COUNT(*) AS n FROM b)
         SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM b
         GROUP BY bigram
         HAVING COUNT(*) >= (SELECT ceil(n / $HHDenom.0) FROM tot)
         ORDER BY cnt DESC, bigram""",
  )
}
