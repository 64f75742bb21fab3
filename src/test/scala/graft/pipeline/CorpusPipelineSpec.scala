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

  test("decontamStage drops its INPUT's benchmark-overlapping docs, " +
    "keeps clean and unassessable ones") {
    // Benchmark: one doc. Training input: a doc CONTAINING the
    // benchmark text (full shingle overlap → dropped), a doc sharing
    // nothing (kept), and a 2-token doc (no shingles → keeps).
    val benchTxt = "alpha beta gamma delta epsilon zeta"
    val bench = Seq((3L, benchTxt)).toDF("doc_id", "clean")
    val surv = Seq(
      (10L, s"prefix words $benchTxt suffix tail"), // contaminated
      (20L, "totally unrelated content goes right here"),
      (30L, "two tokens"))
      .toDF("doc_id", "clean")
    val kept = CorpusPipeline.decontamStage(surv, bench)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(20L, 30L),
      s"benchmark-containing doc must drop, short doc must keep: $kept")
  }

  test("scrubStage cuts every occurrence of a cross-doc duplicated " +
    "span from its INPUT and leaves short docs untouched") {
    val K = CorpusPipeline.PipeSpanK // 5
    val shared = (1 to K).map(i => s"s$i").mkString(" ") // one span
    val docs = Seq(
      (1L, s"a1 a2 $shared z1 z2"),   // span at positions 3..10
      (2L, s"$shared y1 y2 y3"),      // span at positions 1..8
      (3L, "short doc under k tokens"))
      .toDF("doc_id", "clean")
    val out = CorpusPipeline.scrubStage(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a1 a2 z1 z2",
      s"covered tokens must be cut, order preserved: ${out(1L)}")
    assert(out(2L) == "y1 y2 y3", s"got ${out(2L)}")
    assert(out(3L) == "short doc under k tokens",
      "docs shorter than PipeSpanK must pass unchanged")
    // Non-duplicated long docs pass with their token stream intact.
    val solo = (1 to K + 2).map(i => s"u$i").mkString(" ")
    val out2 = CorpusPipeline.scrubStage(
      Seq((9L, solo)).toDF("doc_id", "clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(9L) == solo)
  }

  test("fixture: the composed funnel strictly narrows and the " +
    "packed corpus is the SURVIVORS' clean text, not the raw table") {
    val st = CorpusPipeline.pipeStages(spark, sf).first()
    val nd = st.getAs[Long]("n_docs")
    val nq = st.getAs[Long]("n_quality_kept")
    val nk = st.getAs[Long]("n_dedup_kept")
    val nc = st.getAs[Long]("n_decontam_kept")
    val cut = st.getAs[Long]("n_tokens_cut")
    assert(nd > nq && nq > nk && nk > nc && nc > 0,
      s"funnel must narrow at every stage: $nd -> $nq -> $nk -> $nc")
    assert(cut > 0, "the scrub stage must be non-vacuous on the fixture")
    // Classifier-health carry: the validation confusion must cover
    // the whole validation split (tp+fp+fn+tn == its doc count) so a
    // silently-degenerate eval can't ride along unnoticed.
    assert(st.getAs[Long]("nb_val_tp") + st.getAs[Long]("nb_val_fp") +
      st.getAs[Long]("nb_val_fn") + st.getAs[Long]("nb_val_tn") > 0)
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
