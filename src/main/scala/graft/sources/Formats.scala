package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink format surface beyond Parquet (SURVEY.md §2.1: the
  * reference's only source is the mmap'd text file — S1/S2 — and its
  * only sink the formatted text file — S4; Parquet and the formats
  * here are the [ext] tier every Spark pipeline expects).
  *
  * All of these are stock `DataFrameReader`/`Writer` — the value of
  * this module is pinning the round-trip CONTRACT (schema and values
  * survive write→read) in `FormatsSpec`, plus one place to document
  * the scale-relevant options:
  *
  *  - CSV/JSON are row-splittable text formats: a 100 TB directory
  *    still scans in parallel, but with no column pruning or
  *    predicate pushdown — land raw data in them, convert to Parquet
  *    (columnar, min/max row-group stats) before analytics.
  *  - Schemas are always passed explicitly on read (`inferSchema`
  *    costs an extra full scan and guesses — never at scale).
  *  - Writes go through the same partitioned committer as Parquet;
  *    `partitionBy` works identically for hive-style layout pruning.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  def readCsv(s: SparkSession, path: String, ddl: String): DataFrame =
    s.read.option("header", "true").schema(ddl).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(s: SparkSession, path: String, ddl: String): DataFrame =
    s.read.schema(ddl).json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** ORC: the second columnar format in every serious lakehouse
    * (Hive-lineage tables). Same pushdown/pruning story as Parquet —
    * min/max stripe statistics, optional bloom filters — so it is a
    * drop-in columnar landing format where the surrounding stack is
    * ORC-native; the analytics guidance above (convert row formats to
    * a columnar one) is satisfied by either.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Partition backfill / restatement: with `partitionOverwriteMode=
    * dynamic`, an Overwrite write replaces ONLY the partitions present
    * in `df` and leaves every other partition's files physically
    * untouched — the idempotent "recompute one day and swap it in"
    * maintenance op behind every backfill job. The default (static)
    * mode would truncate the whole table first, so at 100 TB the
    * difference is rewriting one day vs rewriting three years.
    */
  def backfillPartitions(df: DataFrame, partCol: String,
      path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(path)
}
