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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_quantile_sketch" -> quantileSketch,
  )

  /** DuckDB's quantile_disc shares percentile_approx's "return an
    * actual element" convention but not its rank-selection tie rules,
    * and the GK sketch's guarantee is a rank BAND, not an exact rank
    * — so this operator is spec-gated (SketchesSpec: rank error vs
    * the exact sorted order, mergeability plan audit) rather than
    * hash-gated.
    */
  val oracles: Map[String, String] = Map.empty
}
