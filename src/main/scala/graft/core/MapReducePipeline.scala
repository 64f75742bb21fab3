package graft.core

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed re-expression of the reference runtime's API.
  *
  * The reference (`mayconbordin/mapreduce-sm`) is a shared-memory
  * MapReduce framework: the user wires five callbacks into a
  * `mapreduce_opts` struct (reference `include/mapreduce.h:107-122`) —
  * `splitter` (bytes → tasks), `map` (task → 0..n pairs), `reduce`
  * (key + all values → 0..n pairs), a sort comparator + direction, and
  * an `output_writer` (pair → formatted line) — and the runtime
  * supplies threading, hash-partitioned shuffle, grouping, global sort
  * and single-file output (`src/mapreduce.c:376-512`).
  *
  * Here each leg maps onto a Spark primitive and Catalyst/Tungsten
  * supply the runtime:
  *
  *  - splitter  → Hadoop line splitting inside `spark.read.textFile`
  *    (no user hook needed; splits are distributed, not one mmap).
  *  - map       → `Dataset.flatMap` (emit 0..n typed pairs).
  *  - reduce    → `flatMapGroups` in the general form (the reference
  *    reduce may emit many pairs per key — `src/mapreduce.c:360-364`),
  *    with [[MapReducePipeline.mapReduceAgg]] as the scalable
  *    partial-aggregation fast path (the reference has no combiner and
  *    buffers every value per key, `src/mapreduce.c:292-303`; at
  *    100 TB that is the difference between a shuffle of pre-summed
  *    partials and a shuffle of every input record — never replicate
  *    it when the reduction is algebraic).
  *  - sort      → `orderBy` (range-partitioned distributed sort) via
  *    an `Ordering`-bearing key column.
  *  - output    → caller-supplied formatter + [[TextSink]].
  *
  * Scale note: `mapReduce` (the faithful general form) shuffles raw
  * pairs and materializes one key's values per call — fine for
  * holistic reductions, wrong for algebraic ones. Prefer
  * `mapReduceAgg` (Aggregator → partial agg) or plain
  * `groupBy().agg()` whenever the reduce is expressible.
  */
object MapReducePipeline {

  /** General form: reduce sees all values of a key and may emit any
    * number of output pairs — the exact contract of the reference's
    * `reduce` hook (`include/mapreduce.h:117`).
    */
  def mapReduce[K, V, K2, V2](
      lines: Dataset[String],
      map: String => IterableOnce[(K, V)],
      reduce: (K, Iterator[V]) => IterableOnce[(K2, V2)])(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      outEnc: Encoder[(K2, V2)]): Dataset[(K2, V2)] =
    lines
      .flatMap(l => map(l).iterator)
      .groupByKey(_._1)
      .flatMapGroups((k: K, vs: Iterator[(K, V)]) =>
        reduce(k, vs.map(_._2)).iterator)

  /** Fast path: algebraic reduction through an [[Aggregator]], which
    * Catalyst plans as partial + final aggregation (map-side combine)
    * — the scalable replacement for the reference's buffer-everything
    * shuffle.
    */
  def mapReduceAgg[K, V, OUT](
      lines: Dataset[String],
      map: String => IterableOnce[(K, V)],
      agg: Aggregator[V, _, OUT])(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      vEnc: Encoder[V],
      outEnc: Encoder[(K, OUT)]): Dataset[(K, OUT)] =
    lines
      .flatMap(l => map(l).iterator)
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("out"))

  /** Identity reduce — the reference's default
    * (`src/mapreduce.c:360-364`): group-by becomes a passthrough.
    */
  def identityReduce[K, V]: (K, Iterator[V]) => Iterator[(K, V)] =
    (k, vs) => vs.map(v => (k, v))

  /** Read newline-delimited text, the reference's de facto record
    * format (mmap + line splitter, `src/mapreduce.c:167-222`).
    */
  def source(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** Like the reference's string_match splitter, which threads a
    * global starting line index through each task
    * (`examples/string_match/string_match.c:44-46`): lines paired
    * with their 0-based global line number.
    */
  def sourceWithLineNumbers(
      spark: SparkSession,
      path: String): Dataset[(Long, String)] = {
    import spark.implicits._
    // zipWithIndex is the only exact global-line-number primitive;
    // it costs one extra job to count per-partition sizes, which is
    // the honest price of a total order over an unordered source.
    spark.read.textFile(path).rdd.zipWithIndex().map(_.swap).toDS()
  }
}

/** The reference's output contract (`src/mapreduce.c:446-489`): one
  * globally sorted file, each pair rendered by a caller-supplied
  * writer (`include/mapreduce.h:119`).
  *
  * `single = true` reproduces that contract exactly (coalesce(1)
  * concatenates the range-sorted partitions in order — correct, but a
  * deliberate single-writer cliff kept only for parity). At scale use
  * `single = false`: the output stays globally sorted *across* part
  * files (part i's keys all precede part i+1's) without funnelling
  * 100 TB through one task.
  */
object TextSink {
  def write[T](
      sorted: Dataset[T],
      format: T => String,
      path: String,
      single: Boolean = true): Unit = {
    val spark = sorted.sparkSession
    import spark.implicits._
    val lines = sorted.map(format)
    (if (single) lines.coalesce(1) else lines).write
      .mode("overwrite")
      .text(path)
  }
}
