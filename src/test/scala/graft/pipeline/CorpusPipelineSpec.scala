package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed corpus build (VERDICT r8 item 1). The oracle rows
  * gate the fixture end-to-end; these specs pin the COMPOSITION
  * contract — each stage consumes the previous stage's output — by
  * driving crafted corpora through the same stage functions the
  * declared query composes, where the stage-boundary behavior is
  * hand-checkable.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("extractStage consumes the normalize front stage and drops " +
    "link-dense boilerplate: decomposed input comes back composed, " +
    "the link-dense tail paragraph is gone") {
    // 21 tokens → two paragraphs (20 + 1); doc_id 0 phase-links
    // paragraph 0 (long → kept) and... pi=5k links: (pi + doc_id) % 5
    // == 0 → for doc 0, paragraph 0 is linked. Use doc_id 4 so the
    // 1-token tail paragraph (pi=1) is linked: (1 + 4) % 5 == 0 —
    // a 1-token linked paragraph fails link*5 <= len*2 and is
    // dropped by BOTH construction arithmetic and the parser.
    val toks20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (4L, s"$toks20 tail"),          // linked 1-token tail → dropped
      (1L, "cafe\u0301 plain text")). // decomposed: e + U+0301
      toDF("doc_id", "text")
    val out = CorpusPipeline.extractStage(docs)(spark)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(4L) == toks20, "tail paragraph must be dropped")
    assert(out(1L) == "caf\u00e9 plain text",
      "NFC must have composed the decomposed sequence BEFORE synthesis")
  }

  test("extractStage round-trips markup metacharacters: the escaped " +
    "synthesis + entity-decoding parse return the raw text (ADVICE r8)") {
    val meta = "a&b <tag> \"quoted\" it's five"
    val out = CorpusPipeline.extractStage(
      Seq((3L, meta)).toDF("doc_id", "text"))(spark)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) == meta,
      "metacharacter text must survive the page round-trip unchanged")
    // And a LINKED metachar first token: doc_id 5 links paragraph 0;
    // the anchor text decodes to raw and the paragraph is long enough
    // to survive the density rule.
    val linked = "a&b " + (1 to 19).map(i => s"w$i").mkString(" ")
    val out5 = CorpusPipeline.extractStage(
      Seq((5L, linked)).toDF("doc_id", "text"))(spark)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out5(5L) == linked)
  }

  test("qualityStage scores its INPUT frame under the given model " +
    "artifact") {
    // Crafted model: 'junk' votes drop hard, everything else is
    // neutral; priors tie (dk == dd) so the token evidence decides.
    val clean = Seq((1L, "good words here"), (2L, "junk junk junk"))
      .toDF("doc_id", "clean")
    val model = Seq(("junk", 0L, 5000L), ("good", 10L, 0L),
      ("words", 10L, 0L), ("here", 10L, 0L))
      .toDF("word", "w_keep", "w_drop")
    val priors = Seq((5L, 5L, 10L)).toDF("dk", "dd", "ndocs")
    val kept = CorpusPipeline.qualityStage(clean, model, priors)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L),
      s"doc 2 is all drop-weighted tokens; got $kept")
  }

  test("dedupStage keeps one representative per near-dup cluster of " +
    "its INPUT text") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val kept = CorpusPipeline.dedupStage(Seq(
      (10L, a), (20L, a),                       // exact dup pair
      (30L, "completely different text entirely now"))
      .toDF("doc_id", "clean"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 30L),
      s"expected min-id representative + singleton; got $kept")
  }

  test("packStage encodes its INPUT against the given dictionary " +
    "and conserves pieces") {
    // Dictionary: every pretoken of the two docs segments into its
    // single hex key (1 piece per pretoken).
    val surv = Seq((0L, "ab ab"), (1L, "cd")).toDF("doc_id", "clean")
    val pieces = Seq(
      (graft.text.ByteBpe.hexKey("ab"), 1L, graft.text.ByteBpe.hexKey("ab")),
      (graft.text.ByteBpe.hexKey(" "), 1L, graft.text.ByteBpe.hexKey(" ")),
      (graft.text.ByteBpe.hexKey("cd"), 1L, graft.text.ByteBpe.hexKey("cd")))
      .toDF("word", "pos", "sym")
    val out = CorpusPipeline.packStage(surv, pieces).collect()
    // doc 0: 3 pretokens + EOS = 4 ids; doc 1: 1 + EOS = 2. The two
    // docs hash to different buckets (doc_id % 32), one example each.
    assert(out.map(_.getAs[Long]("n_pieces")).sum == 6L)
    assert(out.length == 2 &&
      out.forall(_.getAs[Long]("n_docs") == 1L))
  }

  test("fixture: the composed funnel strictly narrows and the " +
    "packed corpus is the SURVIVORS' clean text, not the raw table") {
    val st = CorpusPipeline.pipeStages(spark, sf).first()
    val nd = st.getAs[Long]("n_docs")
    val nq = st.getAs[Long]("n_quality_kept")
    val nk = st.getAs[Long]("n_dedup_kept")
    assert(nd > nq && nq > nk && nk > 0,
      s"funnel must narrow at every stage: $nd -> $nq -> $nk")
    // The pipeline's piece total differs from the raw-corpus pack
    // (ta_bpe_bytes_pack): extraction + the two keep stages removed
    // text, so packing raw instead of stage output would be visible.
    val rawPieces = graft.text.ByteBpe.bytePack(spark, sf)
      .agg(sum("n_pieces")).first().getLong(0)
    val pipePieces = st.getAs[Long]("total_pieces")
    assert(pipePieces < rawPieces,
      s"pipeline pieces $pipePieces !< raw-corpus pieces $rawPieces")
  }
}
