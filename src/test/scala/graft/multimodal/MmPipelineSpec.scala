package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed multimodal corpus build (round 10): stage semantics
  * on crafted frames (the oracle row gates the fixture; these pin the
  * RULES), twin elimination, and funnel consistency.
  */
class MmPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("qualityStage applies exactly the min-resolution and " +
    "dark-page rules") {
    val imgs = Seq(
      // (img_id, height, n_pix, lum, ph)
      (1L, 6L, 96L, 96L * 80, 0L),      // boundary: both rules pass
      (2L, 5L, 80L, 80L * 200, 0L),     // too small
      (3L, 10L, 160L, 160L * 79, 0L),   // too dark (mean 79)
      (4L, 10L, 160L, 160L * 80 - 1, 0L), // one below the band
      (5L, 20L, 320L, 320L * 95, 0L))   // comfortably in
      .toDF("img_id", "height", "n_pix", "lum", "ph")
    val kept = MmPipeline.qualityStage(imgs)
      .select("img_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 5L))
  }

  test("dedupStage keeps the cluster MINIMUM under the batch-CC " +
    "rule - a chain collapses to its least img_id") {
    // Hashes: 10-11 identical, 11-12 within the ball but 10-12
    // outside it (a chain); 20 is far from everything.
    val h0 = 0x5A5A5A5A5A5AL
    val h1 = h0 ^ ((1L << 1) | (1L << 15) | (1L << 30))     // d3 from h0
    val h2 = h1 ^ ((1L << 45) | (1L << 60) | (1L << 62))    // d3 from h1, d6 from h0
    val kept = Seq((10L, h0), (11L, h0), (12L, h1), (13L, h2),
        (20L, ~h0 & ((1L << 63) - 1)))
      .toDF("img_id", "ph")
      .withColumn("height", lit(1L)).withColumn("n_pix", lit(100L))
      .withColumn("lum", lit(10000L))
      .select("img_id", "height", "n_pix", "lum", "ph")
    val pairs = MmPipeline.pairStage(kept)
    val got = MmPipeline.dedupStage(kept, pairs)
      .select("img_id").collect().map(_.getLong(0)).toSet
    // 10=11 (d0), 11-12 (d3), 12-13 (d3): one component {10,11,12,13}
    // even though 10-13 are far apart - transitivity, the batch rule.
    assert(got === Set(10L, 20L))
  }

  test("fixture: every planted twin whose base survives quality is " +
    "deduped away, and the funnel is internally consistent") {
    val stages = MmPipeline.pipeMmStages(spark, sf).collect()(0)
    def st(c: String): Long = stages.getAs[Long](c)
    val out = MmPipeline.pipeMm(spark, sf)
    val outIds = out.select("img_id").collect().map(_.getLong(0)).toSet
    assert(st("n_dedup_kept") === outIds.size.toLong,
      "n_dedup_kept must equal the record count")
    // Non-vacuity: both stages bite and pairs exist.
    assert(st("n_quality_kept") < st("n_images"),
      "quality stage must drop something on the fixture")
    assert(st("n_pairs") > 0L, "pair graph must be non-empty")
    assert(st("n_dedup_kept") < st("n_quality_kept"),
      "dedup stage must drop something on the fixture")
    // The reduction is real on the fixture: exact-dup hashes exist.
    assert(st("n_hash_groups") < st("n_quality_kept"),
      "distinct hashes must be fewer than images")
    // Twin elimination: an odd twin never survives alongside its base.
    val both = outIds.filter(i => i % 2 == 1 && outIds.contains(i - 1))
    assert(both.isEmpty,
      s"twin kept next to its base: ${both.take(5).toSeq}")
    // Caption pairing: doc_id = img_id / 2 on every record.
    val bad = out.select("img_id", "doc_id").collect()
      .filter(r => r.getLong(1) != r.getLong(0) / 2)
    assert(bad.isEmpty)
  }

  test("mixture (round 11): caption admission enforces the text " +
    "tier's gates incl. the eval holdout; both sources contribute " +
    "and interleave within pack buckets") {
    val st = MmPipeline.pipeMixtureStages(spark, sf).collect()(0)
    def g(c: String): Long = st.getAs[Long](c)
    assert(g("n_text_pieces") > 0L && g("n_caption_pieces") > 0L,
      "both sources must contribute pieces")
    assert(g("n_caption_records") < g("n_images_kept"),
      "the caption gate must drop something (quality + eval holdout)")
    assert(g("total_pieces") >= g("n_text_pieces")
      + g("n_caption_pieces"),
      "packed mass = both streams + EOS separators")
    // Eval holdout on captions: kept images sourced from eval-slice
    // docs exist on the fixture, and none of them can be a caption
    // record (the quality-kept frame is train-slice only).
    val keptDocs = MmPipeline.pipeMm(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val evalKept = keptDocs.count(_ % 10 ===
      graft.pipeline.CorpusPipeline.PipeEvalMod.toLong)
    assert(evalKept > 0, "fixture must have kept eval-slice images")
    assert(g("n_caption_records") <= keptDocs.length - evalKept,
      "an eval-slice caption leaked past the holdout")
    assert(MmPipeline.pipeMixture(spark, sf).count()
      === g("n_examples"))
  }

  test("mixture caption coverage (ADVICE r11): every caption pretoken " +
    "is in the trained pieces dictionary — the inner-join drop rule " +
    "never silently shrinks a caption at the fixture") {
    assert(MmPipeline.captionOovCount(spark, sf) === 0L,
      "caption pretokens were silently dropped by the dictionary " +
        "join — re-measure the pieceStream drop rule")
  }
}
