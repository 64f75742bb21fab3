package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{MapReducePipeline, TextSink}

/** Reference application 1: wordcount
  * (`examples/wordcount/wordcount.c:106-128`).
  *
  * Dataflow (reference §3.2 of SURVEY.md): lines → tokenize
  * `[A-Za-z][A-Za-z']*` uppercased → emit (word, 1) → group by word →
  * sum → sort by count desc → write `word\tcount`, one sorted file.
  *
  * The distributed form is pure `functions._` (whole-stage codegen,
  * partial aggregation — count never shuffles raw tokens' 1s the way
  * the reference buffers them, `src/mapreduce.c:292-303`). Tie order
  * among equal counts is made deterministic by a secondary sort on the
  * word (the reference leaves it to merge order).
  */
object WordCount {
  /** Extract on the RAW text, uppercase the extracted token — the same
    * order as [[RefTokenizer]]. Uppercasing the whole line first would
    * let Unicode case mappings (ı→I, ß→SS) manufacture ASCII letters
    * from non-ASCII input and change the token stream.
    */
  val WordRegex = "[A-Za-z][A-Za-z']*"

  /** Relational form over any string column: (word, cnt). */
  def apply(df: DataFrame, textCol: String): DataFrame =
    df.select(
        explode(
          regexp_extract_all(col(textCol), lit(WordRegex), lit(0)))
          .as("tok"))
      .select(upper(col("tok")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))

  /** Reference-faithful text-file app: read lines, count, write one
    * sorted `WORD\tcount` file (default writer semantics,
    * `src/mapreduce.c:354-357`).
    */
  def runTextFile(spark: SparkSession, in: String, out: String): Unit = {
    import spark.implicits._
    val counted: Dataset[(String, Long)] =
      apply(spark.read.textFile(in).toDF("line"), "line")
        .as[(String, Long)]
    TextSink.write[(String, Long)](
      counted,
      { case (w, c) => s"$w\t$c" },
      out)
  }

  /** Same computation through the typed MapReduce contract — kept as
    * the API-parity demonstration (map emits (word,1), reduce sums);
    * the relational form above is the production path.
    */
  def viaPipeline(spark: SparkSession, in: String): Dataset[(String, Long)] = {
    import spark.implicits._
    MapReducePipeline
      .mapReduce[String, Int, String, Long](
        spark.read.textFile(in),
        line => RefTokenizer.tokenize(line).map(w => (w, 1)),
        (word, ones) => Iterator.single((word, ones.map(_.toLong).sum)))
      .orderBy(desc("_2"), asc("_1"))
  }
}
