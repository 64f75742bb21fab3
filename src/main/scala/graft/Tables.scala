package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader (schemas in FIXTURES.md §1).
  *
  * All readers go through here so that scan-level concerns live in one
  * place: Parquet (columnar, predicate pushdown + column pruning reach
  * the row-group level for free), and the one schema fix-up the
  * fixtures need (`events.ts` is parquet TIMESTAMP(NANOS) → read as
  * int64 nanos, exposed both raw and as a micros-precision
  * `timestamp_ntz`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") eventsFixup(raw) else raw
  }

  /** events.ts arrives as int64 nanoseconds (see GraftSession
    * scaladoc). Keep the exact nanos (ts_ns) for oracle parity
    * (DuckDB epoch_ns), and a truncated-to-micros NTZ timestamp for
    * window/date functions. Shared by batch reads and the streaming
    * file source (which reads the same parquet schema).
    */
  def eventsFixup(raw: DataFrame): DataFrame =
    raw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn(
        "ts",
        // Integral DIV, not `/`: epoch nanos (~1.7e18) exceed double's
        // 2^53 exact range, so float division can be off by 1 µs at
        // hour-boundary timestamps vs DuckDB's integer epoch_ns//1000.
        timestamp_micros(expr("ts_ns DIV 1000"))
          .cast("timestamp_ntz"))

  /** Register every fixture table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
