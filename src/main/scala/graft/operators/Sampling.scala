package graft.operators

import org.apache.spark.sql.DataFrame

/** Sampling operators for training-data downsampling ([ext] tier —
  * absent in the reference, which always processes its whole input,
  * `src/mapreduce.c:205`).
  *
  * Sampling is seeded and therefore reproducible, but the algorithms
  * are engine-specific (Bernoulli per row on Spark's XORShift) — so
  * these are SPEC-tested (determinism + statistical tolerance), not
  * DuckDB-oracle-checked: two engines legitimately sample different
  * rows.
  *
  * Scale shape: both forms are narrow one-pass filters (no shuffle);
  * `stratified` evaluates a per-stratum Bernoulli draw inside the
  * scan stage, which is the only downsampling shape that survives
  * 100 TB — never sort-by-random, never sample via collect.
  */
object Sampling {

  /** Seeded uniform Bernoulli sample. */
  def uniform(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Seeded per-stratum sample: e.g. balance a skewed `lang` column
    * by keeping different fractions per value.
    */
  def stratified[T](df: DataFrame, column: String,
      fractions: Map[T, Double], seed: Long): DataFrame =
    df.stat.sampleBy(column, fractions, seed)
}
