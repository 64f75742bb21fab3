package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, the right-side value whose time is
  * the greatest at-or-before the left row's time, within the same key.
  *
  * Spark has no built-in as-of operator. The naive formulations both
  * fail at 100 TB: a range join + per-left-row MAX re-scans the right
  * side per key pair, and a correlated subquery isn't expressible.
  * This implementation uses the classic union-merge instead:
  *
  *   1. tag right rows (side=0) carrying their value, and left rows
  *      (side=1) carrying their payload;
  *   2. union and run one window: `last(value, ignoreNulls)` ordered
  *      by (time, side) per key — right rows sort before left rows at
  *      equal times, giving at-or-before (`<=`) semantics;
  *   3. keep left rows: each now holds the last right value seen.
  *
  * Cost at scale: exactly ONE hash-shuffle of (left ∪ right) on the
  * key plus a per-partition sort — the same shape as a sort-merge
  * join, with no risk of range-explosion, and AQE handles skewed keys.
  */
object AsOfJoin {

  def lastValueAtOrBefore(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      valueCol: String, as: String): DataFrame = {

    val leftCols = left.columns
    // Left rows: payload + null value slot.
    val l = left
      .withColumn("__k", F.col(leftKey))
      .withColumn("__t", F.col(leftTime))
      .withColumn("__side", F.lit(1))
      .withColumn("__v", F.lit(null).cast(right.schema(valueCol).dataType))
    // Right rows: value + null payload (aligned schema via select).
    val r = right
      .withColumn("__k", F.col(rightKey))
      .withColumn("__t", F.col(rightTime))
      .withColumn("__side", F.lit(0))
      .withColumn("__v", F.col(valueCol))
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, F.lit(null).cast(left.schema(c).dataType))
    }.select((leftCols ++ Seq("__k", "__t", "__side", "__v")).map(F.col): _*)
    val lAligned =
      l.select((leftCols ++ Seq("__k", "__t", "__side", "__v")).map(F.col): _*)

    val w = Window.partitionBy("__k")
      .orderBy(F.col("__t"), F.col("__side"), F.col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionByName(rAligned)
      .withColumn(as, F.last(F.col("__v"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
      .select(leftCols.map(F.col) :+ F.col(as): _*)
  }
}
