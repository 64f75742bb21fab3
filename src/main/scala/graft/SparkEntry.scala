package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.{Relational, Relational2}
import graft.sim.VectorSearch
import graft.streaming.{EventOps, Stateful}
import graft.text.{TextAnalysis, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per SURVEY.md §2
  * row implemented); `oracleSql` gives the DuckDB-equivalent SQL for
  * every query that is SQL-expressible. Column names and total
  * ordering are kept identical on both sides (the driver's compare
  * sorts columns by name and hashes values).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (TextQueries.queries, TextQueries.oracles),
    (Relational.queries, Relational.oracles),
    (Relational2.queries, Relational2.oracles),
    (graft.operators.EventAnalytics.queries,
      graft.operators.EventAnalytics.oracles),
    (graft.operators.GraphBasket.queries,
      graft.operators.GraphBasket.oracles),
    (graft.operators.Hierarchy.queries,
      graft.operators.Hierarchy.oracles),
    (graft.operators.Warehouse.queries,
      graft.operators.Warehouse.oracles),
    (graft.pipeline.CorpusOps.queries, graft.pipeline.CorpusOps.oracles),
    (graft.pipeline.CorpusPipeline.queries,
      graft.pipeline.CorpusPipeline.oracles),
    (graft.operators.Sketches.queries, graft.operators.Sketches.oracles),
    (TextAnalysis.queries, TextAnalysis.oracles),
    (graft.text.BpeTrainer.queries, graft.text.BpeTrainer.oracles),
    (graft.text.ByteBpe.queries, graft.text.ByteBpe.oracles),
    (graft.text.QualityClassifier.queries,
      graft.text.QualityClassifier.oracles),
    (graft.text.HtmlExtract.queries, graft.text.HtmlExtract.oracles),
    (graft.text.Normalize.queries, graft.text.Normalize.oracles),
    (graft.text.TokenizerStore.queries, graft.text.TokenizerStore.oracles),
    (graft.text.UnigramTrainer.queries, graft.text.UnigramTrainer.oracles),
    (graft.text.TokCompare.queries, graft.text.TokCompare.oracles),
    (Dedup.queries, Dedup.oracles),
    (VectorSearch.queries, VectorSearch.oracles),
    (graft.sim.VectorIndex.queries, graft.sim.VectorIndex.oracles),
    (graft.sim.VersionedIndex.queries, graft.sim.VersionedIndex.oracles),
    (graft.sim.RagRetrieve.queries, graft.sim.RagRetrieve.oracles),
    (Multimodal.queries, Multimodal.oracles),
    (graft.multimodal.PixelPng.queries, graft.multimodal.PixelPng.oracles),
    (graft.multimodal.PHash.queries, graft.multimodal.PHash.oracles),
    (graft.multimodal.AudioFp.queries, graft.multimodal.AudioFp.oracles),
    (graft.multimodal.VideoFp.queries, graft.multimodal.VideoFp.oracles),
    (graft.multimodal.MmPipeline.queries,
      graft.multimodal.MmPipeline.oracles),
    (graft.multimodal.JpegMeta.queries, graft.multimodal.JpegMeta.oracles),
    (EventOps.queries, EventOps.oracles),
    (Stateful.queries, Stateful.oracles),
    (graft.streaming.Resume.queries, graft.streaming.Resume.oracles),
    (graft.streaming.RateIngest.queries, graft.streaming.RateIngest.oracles),
    (graft.streaming.DedupIngest.queries,
      graft.streaming.DedupIngest.oracles),
    (graft.streaming.PipeIngest.queries,
      graft.streaming.PipeIngest.oracles),
    (graft.streaming.IndexIngest.queries,
      graft.streaming.IndexIngest.oracles),
    (graft.core.ShardedSinkGate.queries, graft.core.ShardedSinkGate.oracles),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3TopOrders(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
