package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.functions.TextHash
import graft.operators.Lineage

/** COMPOSED MULTIMODAL CORPUS BUILD (`pipe_mm`, round 10) — the
  * multimodal twin of [[graft.pipeline.CorpusPipeline]]: one declared
  * query chains the image tier's stages so each consumes the PREVIOUS
  * stage's output, the way a production image-text corpus build
  * (LAION-style) runs:
  *
  *   documents (+ planted perceptual twins)
  *     → [1] decode + feature   (REAL PNG pixel decode →
  *                               dims / luminance / pHash)
  *     → [2] quality gate       (min-size + dark-page rules,
  *                               exact integers)
  *     → [3] perceptual dedup   ([[HammingBlock]] pair graph at the
  *                               [[PHash.MaxHam]] ball → batch-CC
  *                               cluster-min keeplist — the SAME rule
  *                               as the text pipeline's dedup stage)
  *     → [4] caption pairing    (kept images joined back to their
  *                               document's text → image-text
  *                               training records)
  *
  * The image corpus is [[PHash]]'s mirrored construction (every doc's
  * byte-grid page + a DC-shifted twin per even doc, img_id =
  * 2·doc_id / 2·doc_id+1), so the pipeline composes the SAME
  * perceptual tier `mm_phash_dedup` gates standalone — and the oracle
  * chains [[PHash.HashCtes]] verbatim, so the pipeline and the
  * standalone gate can never drift hash-wise.
  *
  * Stage rules (all exact integers, both engines):
  *  - quality: n_pix ≥ [[MinPix]] (≥ 6 full 16-px rows — a real
  *    min-resolution rule) AND lum_sum ≥ [[MinLum]]·n_pix (mean
  *    luminance ≥ 80 — the dark-page rule; zero-padding of short
  *    pages drags their mean down, so both rules bite on the fixture
  *    and the funnel proves non-vacuity).
  *  - dedup: the pair graph is UNCAPPED (a corpus build can't
  *    sample — the capped tier is the verify REPORT's contract, see
  *    [[PHash.PairCap]]); keep = cluster minimum under connected
  *    components over Hamming ≤ [[PHash.MaxHam]] pairs — the batch
  *    rule, matching the text pipeline (measured at 32×: 3.5M
  *    pairs, largest component 132 images, no percolation — the
  *    make_scale shards decorrelate content, exactly as a sharded
  *    real corpus does).
  *  - caption: doc_id = img_id / 2 (both page and twin pair with
  *    their source document's text), token count under the engine's
  *    tokenizer convention, md5 of the caption proving the pairing.
  *
  * `pipe_mm` is the kept image-text record table; `pipe_mm_stages`
  * is the 1-row funnel (images in, quality survivors, pair count,
  * dedup survivors, caption token mass out).
  *
  * 100 TB shape: stage 1 is one narrow typed decode pass (no
  * shuffle); stage 2 a pushed filter; stage 3 the LSH-band-shaped
  * chunk equi-join + the bounded CC fixpoint over pair-touched
  * images only ([[Dedup.connectedComponents]]); stage 4 one keyed
  * equi-join. Stage frames are Lineage-shared — each boundary is a
  * persisted table at scale.
  */
object MmPipeline {

  val MinPix = 96L
  val MinLum = 80L

  // ---- stage functions: each takes the previous stage's frame ----

  /** Stage 1: documents → (img_id, height, n_pix, lum, ph) — the
    * mirrored image corpus, REALLY decoded ([[ImageCodec.decodePng]])
    * and featurized from the decoded pixels only.
    */
  def decodeStage(docs: DataFrame)(s: SparkSession): DataFrame = {
    import s.implicits._
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, tx) =>
        val bytes = tx.getBytes("UTF-8").map(_ & 0xff)
        def rec(imgId: Long, bs: Array[Int]) = {
          val img = ImageCodec.decodePng(
            java.util.HexFormat.of().parseHex(
              PixelPng.encodePngBytes(bs)))
          var lum = 0L
          img.pixels.foreach(lum += _)
          (imgId, img.height.toLong, img.pixels.length.toLong, lum,
            PHash.phashOf(img.pixels, img.height))
        }
        val base = rec(2 * id, bytes)
        if (id % 2 == 0)
          Iterator(base, rec(2 * id + 1,
            bytes.map(b => math.min(255, b + PHash.TwinShift))))
        else Iterator(base)
      })
      .toDF("img_id", "height", "n_pix", "lum", "ph")
  }

  /** Stage 2: the quality gate — min resolution + dark-page mean
    * luminance, exact integer comparisons on decoded-pixel features.
    */
  def qualityStage(imgs: DataFrame): DataFrame =
    imgs.filter(col("n_pix") >= MinPix &&
      col("lum") >= lit(MinLum) * col("n_pix"))

  /** The distinct-hash groups of a quality-kept frame: one
    * representative (min img_id) per exact hash value.
    */
  def hashGroups(kept: DataFrame): DataFrame =
    kept.groupBy("ph").agg(min("img_id").as("rep"))

  /** Stage 3 pair graph: UNCAPPED chunk-blocked pairs at the
    * [[PHash.MaxHam]] ball between DISTINCT-hash group
    * representatives (128× find): exact-duplicate hashes dominate a
    * self-similar corpus (measured at 32×: 2.27M of 3.5M image pairs
    * at d = 0), so blocking the raw image table saturates the 13-bit
    * chunk buckets — the candidate stream grows ∝ N²/2^13 and the
    * cold octave law went superlinear at ≥ 64×. Grouping by exact
    * hash FIRST makes bucket occupancy scale with content DIVERSITY
    * (26 959 distinct hashes for 234 869 images at 32×), and the
    * reduced graph has identical connected components: a d = 0 clique
    * is one node, and any member edge between two groups connects
    * the same components one representative edge does.
    */
  def pairStage(kept: DataFrame): DataFrame =
    HammingBlock.pairs(
      hashGroups(kept).select(col("rep").as("img_id"), col("ph")),
      "img_id", PHash.Chunks, PHash.ChunkBits, PHash.MaxHam)

  /** Stage 3 keeplist: batch-CC cluster minimum over the reduced
    * pair graph (the text pipeline's dedup rule on the image tier):
    * components over group representatives, every image inherits its
    * hash group's component, keep = the component's minimum img_id —
    * provably the same keeplist as CC over the full image graph.
    */
  def dedupStage(kept: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = Dedup.connectedComponents(
      pairs.select("img_a", "img_b"))
    val glab = hashGroups(kept)
      .join(labels.select(col("node").as("rep"), col("c")),
        Seq("rep"), "left")
      .select(col("ph"), coalesce(col("c"), col("rep")).as("cid"))
    val withCid = kept.join(glab, "ph")
    val minImg = withCid.groupBy("cid")
      .agg(min("img_id").as("keep_img"))
    withCid.join(minImg, "cid")
      .filter(col("img_id") === col("keep_img"))
      .select(kept.columns.map(col): _*)
  }

  /** Stage 4: pair every kept image with its source document's text —
    * the image-text training record.
    */
  def captionStage(kept: DataFrame, docs: DataFrame): DataFrame =
    kept.withColumn("doc_id", shiftright(col("img_id"), 1))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("img_id"), col("doc_id"), col("height"),
        col("n_pix"), col("lum"), col("ph"),
        size(TextHash.tokens(col("text"))).cast("long")
          .as("n_caption_tokens"),
        md5(col("text").cast("binary")).as("caption_md5"))

  // ---- Lineage-shared stage materializations ----

  private def decoded(s: SparkSession, dir: String): DataFrame =
    Lineage.materialized(s, dir, "mmpipe_decoded") {
      decodeStage(Tables(s, dir, "documents"))(s)
    }

  private def quality(s: SparkSession, dir: String): DataFrame =
    Lineage.materialized(s, dir, "mmpipe_quality") {
      qualityStage(decoded(s, dir))
    }

  private def pairsM(s: SparkSession, dir: String): DataFrame =
    Lineage.materialized(s, dir, "mmpipe_pairs") {
      pairStage(quality(s, dir))
    }

  private def kept(s: SparkSession, dir: String): DataFrame =
    Lineage.materialized(s, dir, "mmpipe_kept") {
      dedupStage(quality(s, dir), pairsM(s, dir))
    }

  // -----------------------------------------------------------------
  def pipeMm(s: SparkSession, dir: String): DataFrame =
    captionStage(kept(s, dir), Tables(s, dir, "documents"))
      .orderBy("img_id")

  def pipeMmStages(s: SparkSession, dir: String): DataFrame = {
    val ni = decoded(s, dir).agg(count(lit(1)).as("n_images"))
    val nq = quality(s, dir).agg(count(lit(1)).as("n_quality_kept"))
    val ng = hashGroups(quality(s, dir))
      .agg(count(lit(1)).as("n_hash_groups"))
    val np = pairsM(s, dir).agg(count(lit(1)).as("n_pairs"))
    val nk = kept(s, dir).agg(count(lit(1)).as("n_dedup_kept"))
    val tc = captionStage(kept(s, dir), Tables(s, dir, "documents"))
      .agg(coalesce(sum("n_caption_tokens"), lit(0L))
        .as("total_caption_tokens"))
    ni.crossJoin(broadcast(nq)).crossJoin(broadcast(ng))
      .crossJoin(broadcast(np))
      .crossJoin(broadcast(nk)).crossJoin(broadcast(tc))
  }

  // -----------------------------------------------------------------
  // UNIFIED MULTIMODAL TRAINING MIXTURE (`pipe_mixture`, VERDICT r10
  // item 4): the text pipeline's packed examples and the image
  // pipeline's caption records emitted as ONE interleaved corpus
  // under ONE example/packing convention. The caption text must pass
  // the TEXT tier's gates before admission: captions come from the
  // text pipeline's quality-kept CLEAN frame (normalize → HTML
  // extract → trained-NB keep), which also enforces the benchmark
  // holdout — an eval-slice caption would be contamination, exactly
  // like an eval-slice document. Both sources' piece streams encode
  // through the SAME trained byte-BPE dictionary and pack through the
  // SAME [[graft.text.BpeCore.packExamples]] layout over one shared
  // usage-ranked id space: mixture key = 2·doc_id for text documents,
  // 2·img_id + 1 for image-caption records (disjoint by parity, so
  // pack buckets interleave the two sources). Each caption record is
  // its own document in the pack (EOS-terminated), the standard
  // interleaved multimodal pretraining shape.
  //
  // 100 TB shape: two dictionary joins + the shared pack windows —
  // no new shuffle class; both upstreams are the already-materialized
  // stage tables.

  /** Caption records admitted to the mixture: kept images whose
    * source document survives the text tier's quality gate (and the
    * eval holdout), carrying the CLEAN caption text.
    */
  private def mixCaptions(s: SparkSession, dir: String): DataFrame =
    kept(s, dir).select(col("img_id"),
        shiftright(col("img_id"), 1).as("doc_id"))
      .join(graft.pipeline.CorpusPipeline.qualityKept(s, dir), "doc_id")
      .select("img_id", "doc_id", "clean")

  /** Dropped-caption-word census (ADVICE r11): caption pretokens
    * absent from the trained pieces dictionary. pieceStream's inner
    * dictionary join silently drops such words from the caption
    * stream (the oracle drops them identically, so gates can't see
    * it) — MmPipelineSpec gates this count at ZERO on the fixture so
    * a dictionary/extraction change that shrinks caption coverage
    * turns a test red instead of silently shrinking captions.
    */
  private[graft] def captionOovCount(s: SparkSession,
      dir: String): Long = {
    val pieces = graft.text.ByteBpe.artifacts(s, dir)._2
    mixCaptions(s, dir)
      .select(explode(regexp_extract_all(col("clean"),
        lit(graft.text.ByteBpe.PretokRegex), lit(0))).as("t"))
      .select(hex(encode(col("t"), "UTF-8")).as("word"))
      .join(pieces.select("word").distinct(), Seq("word"), "left_anti")
      .count()
  }

  /** The two sources' piece streams under the shared dictionary and
    * the parity key convention.
    */
  private def mixStreams(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import graft.pipeline.CorpusPipeline
    val pieces = graft.text.ByteBpe.artifacts(s, dir)._2
    val t = CorpusPipeline
      .pieceStream(CorpusPipeline.scrubbed(s, dir), pieces)
      .select((col("doc_id") * 2).as("doc_id"), col("ti"),
        col("pos"), col("sym"))
    val c = CorpusPipeline.pieceStream(
      mixCaptions(s, dir)
        .select((col("img_id") * 2 + 1).as("doc_id"), col("clean")),
      pieces)
    (t, c)
  }

  private def mixPacked(s: SparkSession, dir: String): DataFrame =
    Lineage.materialized(s, dir, "mix_packed") {
      val (t, c) = mixStreams(s, dir)
      graft.text.BpeCore.packExamples(t.unionByName(c))
    }

  def pipeMixture(s: SparkSession, dir: String): DataFrame =
    mixPacked(s, dir).orderBy("bucket", "seq_id")

  def pipeMixtureStages(s: SparkSession, dir: String): DataFrame = {
    val (t, c) = mixStreams(s, dir)
    val nt = graft.pipeline.CorpusPipeline.scrubbed(s, dir)
      .agg(count(lit(1)).as("n_text_docs"))
    val nk = kept(s, dir).agg(count(lit(1)).as("n_images_kept"))
    val nc = mixCaptions(s, dir)
      .agg(count(lit(1)).as("n_caption_records"))
    val tp = t.agg(count(lit(1)).as("n_text_pieces"))
    val cp = c.agg(count(lit(1)).as("n_caption_pieces"))
    val px = mixPacked(s, dir)
      .agg(count(lit(1)).as("n_examples"),
        coalesce(sum("n_pieces"), lit(0L)).as("total_pieces"))
    nt.crossJoin(broadcast(nk)).crossJoin(broadcast(nc))
      .crossJoin(broadcast(tp)).crossJoin(broadcast(cp))
      .crossJoin(broadcast(px))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_mm" -> pipeMm,
    "pipe_mm_stages" -> pipeMmStages,
    "pipe_mixture" -> pipeMixture,
    "pipe_mixture_stages" -> pipeMixtureStages,
  )

  // ---------------------------------------------------------------
  // Oracle: [[PHash.HashCtes]] verbatim (construction pixels → the
  // same integer DCT hash), then the stage CTEs — quality filter,
  // chunk-blocked pairs (the standalone gate's brute-force twin
  // already certifies the blocking complete, so the PIPELINE twin
  // may use the scalable chunk join), recursive-CC cluster-min
  // keeplist, caption join.
  private val CMask = (1L << PHash.ChunkBits) - 1

  private val StageCtes: String =
    s"""${PHash.HashCtes},
       qimg AS (SELECT h.img_id, h.ph, f.hgt, f.n_pix, f.lum
         FROM hv0 h JOIN feat f USING (img_id)
         WHERE f.n_pix >= $MinPix AND f.lum >= $MinLum * f.n_pix),
       mg AS (SELECT ph, MIN(img_id) AS rep FROM qimg GROUP BY ph),
       chv AS (SELECT rep, ph, ci,
           (ph >> CAST(ci * ${PHash.ChunkBits} AS INTEGER)) & $CMask
             AS cv
         FROM (SELECT rep, ph, unnest(range(0, ${PHash.Chunks}))
             AS ci FROM mg)),
       mpair AS (SELECT DISTINCT a.rep AS ia, b.rep AS ib
         FROM chv a JOIN chv b
         ON a.ci = b.ci AND a.cv = b.cv AND a.rep < b.rep
         WHERE bit_count(xor(a.ph, b.ph)) <= ${PHash.MaxHam}),
       medge AS (SELECT ia AS u, ib AS v FROM mpair
         UNION SELECT ib, ia FROM mpair),
       mreach AS (
         SELECT u AS node, v AS r FROM medge
         UNION
         SELECT mreach.node, e.v FROM mreach
         JOIN medge e ON mreach.r = e.u),
       mclab AS (SELECT node, LEAST(node, MIN(r)) AS cid
         FROM mreach GROUP BY node),
       glab AS (SELECT mg.ph, COALESCE(mclab.cid, mg.rep) AS gcid
         FROM mg LEFT JOIN mclab ON mclab.node = mg.rep),
       wimg AS (SELECT q.*, g.gcid FROM qimg q
         JOIN glab g USING (ph)),
       mmin AS (SELECT gcid, MIN(img_id) AS keep_img FROM wimg
         GROUP BY gcid),
       mkeep AS MATERIALIZED (SELECT w.img_id, w.ph, w.hgt, w.n_pix, w.lum
         FROM wimg w JOIN mmin USING (gcid)
         WHERE w.img_id = keep_img)"""

  private val CapTok = "regexp_extract_all(lower(d.text), '[a-z0-9]+')"

  val oracles: Map[String, String] = Map(
    "pipe_mm" ->
      s"""WITH RECURSIVE $StageCtes
         SELECT k.img_id, k.img_id // 2 AS doc_id,
           k.hgt AS height, k.n_pix, k.lum, k.ph,
           CAST(len($CapTok) AS BIGINT) AS n_caption_tokens,
           md5(d.text) AS caption_md5
         FROM mkeep k JOIN documents d ON d.doc_id = k.img_id // 2
         ORDER BY img_id""",
    "pipe_mm_stages" ->
      s"""WITH RECURSIVE $StageCtes
         SELECT
           (SELECT CAST(COUNT(*) AS BIGINT) FROM imgs) AS n_images,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM qimg)
             AS n_quality_kept,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mg) AS n_hash_groups,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mpair) AS n_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mkeep)
             AS n_dedup_kept,
           (SELECT CAST(COALESCE(SUM(len($CapTok)), 0) AS BIGINT)
             FROM mkeep k JOIN documents d ON d.doc_id = k.img_id // 2)
             AS total_caption_tokens""",
    "pipe_mixture" ->
      s"""WITH RECURSIVE $MixCtes,
         ${graft.text.BpeCore.packSqlTailOn("mstream")}""",
    "pipe_mixture_stages" ->
      s"""WITH RECURSIVE $MixCtes,
         ${graft.text.BpeCore.packSqlCtesOn("mstream")}
         SELECT
           (SELECT CAST(COUNT(*) AS BIGINT) FROM scrub)
             AS n_text_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mkeep)
             AS n_images_kept,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM caprec)
             AS n_caption_records,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pstream)
             AS n_text_pieces,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cstr)
             AS n_caption_pieces,
           (SELECT CAST(COUNT(*) AS BIGINT)
             FROM (SELECT DISTINCT bucket, seq_id FROM ex) g2)
             AS n_examples,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS total_pieces""",
  )

  /** The mixture's CTE chain: the text pipeline's FULL chain
    * (extraction → quality → dedup → decontam → scrub → pstream —
    * [[graft.pipeline.CorpusPipeline.PipeCtes]] verbatim) + the image
    * pipeline's chain ([[StageCtes]]' stage block) + the caption
    * admission join, the parity-keyed union stream, and the shared
    * pack layout.
    */
  private lazy val MixCtes: String = {
    import graft.text.ByteBpe
    s"""${graft.pipeline.CorpusPipeline.PipeCtes},
       $StageCtes,
       caprec AS MATERIALIZED (SELECT k.img_id, k.img_id // 2 AS doc_id
         FROM mkeep k JOIN qkeep q ON q.doc_id = k.img_id // 2),
       ctok AS MATERIALIZED (SELECT img_id * 2 + 1 AS doc_id, ti,
           hex(encode(w)) AS word
         FROM (SELECT img_id, unnest(range(1, len(ws) + 1)) AS ti,
             unnest(ws) AS w
           FROM (SELECT c.img_id,
               regexp_extract_all(q.clean, '${ByteBpe.DPretok}') AS ws
             FROM caprec c JOIN qkeep q USING (doc_id)))),
       cstr AS (SELECT t2.doc_id, t2.ti, p.pos, p.sym
         FROM ctok t2 JOIN pc${ByteBpe.Merges} p ON p.word = t2.word),
       mstream AS MATERIALIZED (
         SELECT doc_id * 2 AS doc_id, ti, pos, sym FROM pstream
         UNION ALL
         SELECT doc_id, ti, pos, sym FROM cstr)"""
  }
}
