package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bit-exact float discipline for oracle-checked aggregates.
  *
  * The fixture money columns are doubles with two decimal digits.
  * A double `SUM` accumulates in whatever order partitions arrive, so
  * Spark and DuckDB can disagree in the last few ulps — enough to
  * break a hash-equality oracle. Casting to decimal before arithmetic
  * makes every sum/product exact (and deterministic) in BOTH engines;
  * converting the exact decimal result back to double at the end is a
  * single correctly-rounded operation that both engines perform
  * identically.
  *
  * Precisions are chosen so Spark's and DuckDB's decimal type-widening
  * rules both stay ≤ 38 digits with no scale loss:
  * money(12,2) × rate-sum(5,2) × rate-sum(5,2) → scale 6, well inside
  * range.
  */
object Exact {
  val Money: DecimalType = DecimalType(12, 2)
  val Rate: DecimalType = DecimalType(4, 2)

  def money(c: Column): Column = c.cast(Money)
  def rate(c: Column): Column = c.cast(Rate)
  val one: Column = lit(1).cast(Rate)

  /** Exact decimal sum, surfaced as double. */
  def dsum(c: Column): Column = sum(c).cast("double")

  /** Mean computed as exact-sum ÷ count in double — both engines do
    * the identical single IEEE division.
    */
  def davg(c: Column): Column = sum(c).cast("double") / count(c)
}
