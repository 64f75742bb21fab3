package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{MapReducePipeline, TextSink}

/** Reference application 2: string_match, i.e. grep
  * (`examples/string_match/string_match.c:112-135`).
  *
  * Dataflow (SURVEY.md §3.3): lines with a global line number → keep
  * lines containing the pattern case-insensitively (`strcasestr`,
  * `string_match.c:93`) → identity reduce → sort by line number asc
  * (`string_match.c:128`) → write `lineNo:line`
  * (`string_match.c:107-110`). Line numbers follow the *intended*
  * semantics (0-based global line index carried by `t->index`,
  * `string_match.c:44-46`) — the C per-byte counter is a documented
  * bug (SURVEY.md §2.10.2), not a contract.
  */
object StringMatch {

  /** Relational form over an id+text table: (line_no, line). The
    * filter is a codegen'd `Contains` on lowercased columns — it stays
    * inside the scan stage, so at 100 TB this is a single pass with
    * column pruning and no shuffle until the final sort.
    */
  def apply(df: DataFrame, idCol: String, textCol: String,
      pattern: String): DataFrame =
    df.select(col(idCol).as("line_no"), col(textCol).as("line"))
      .filter(lower(col("line")).contains(pattern.toLowerCase))
      .orderBy("line_no")

  /** Reference-faithful text-file app: grep a file into one sorted
    * `lineNo:line` file.
    */
  def runTextFile(
      spark: SparkSession, pattern: String, in: String, out: String): Unit = {
    import spark.implicits._
    val w = pattern.toLowerCase
    val matched = MapReducePipeline
      .sourceWithLineNumbers(spark, in)
      .filter(_._2.toLowerCase.contains(w))
      .orderBy(asc("_1"))
    TextSink.write[(Long, String)](
      matched,
      { case (no, line) => s"$no:$line" },
      out)
  }
}
