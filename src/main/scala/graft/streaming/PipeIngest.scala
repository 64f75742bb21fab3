package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.dedup.Dedup
import graft.pipeline.CorpusPipeline
import graft.sources.Formats
import graft.text.{ByteBpe, QualityClassifier, TokenizerStore}

/** STREAMING CORPUS BUILD — the composed pipeline's front door (the
  * round-8 composition demand carried to its streaming conclusion):
  * the five-stage batch build ([[CorpusPipeline]]) re-run as a
  * production ingest — artifacts trained ONCE on the historical
  * snapshot, every later micro-batch flowing through
  *
  *   normalize → HTML-extract → trained-NB keep → near-dup check
  *   against the store → STORED-tokenizer byte encode
  *
  * with exactly-once staging/sealing. Each stage consumes exactly the
  * machinery its batch twin does — [[CorpusPipeline.extractStage]] /
  * [[CorpusPipeline.qualityStage]] are the literal same functions,
  * the dedup rule is the batch pipeline's min-shingle candidate +
  * exact-Jaccard verify, and encoding goes through the persisted
  * [[TokenizerStore]] byte artifact (zero OOV by construction even
  * for pretokens the snapshot never saw — stored-merge replay).
  *
  * Store layout at `path`:
  *  - `model/`, `priors/`  — the NB gate trained on the history
  *    slice's rule labels ([[QualityClassifier.modelOn]]).
  *  - `tok/`               — the persisted byte tokenizer
  *    ([[TokenizerStore.saveBytesOf]], history-trained).
  *  - `keep_shingles/`     — (doc_id, shingles, mk) of the corpus
  *    keep set's CLEAN text (history keeps, then sealed stream
  *    survivors as publishes land).
  *  - `docs/`              — sealed encoded rows (doc_id, batch_id,
  *    n_pretokens, n_pieces, pieces_md5).
  *  - `staged_{docs,shingles}/batch_id=N/` — the growing segment,
  *    dynamic-partition-overwritten per micro-batch (replay-safe).
  *
  * DEDUP CONVENTION: streaming ingest is necessarily GREEDY and
  * order-dependent where the batch build is global — a batch doc d
  * is dropped iff it verifies (min-shingle collision AND Jaccard
  * ≥ 0.7 on clean text) against (a) the store's keep set, (b) an
  * earlier batch's SURVIVORS, or (c) a same-batch quality-keep with
  * smaller doc_id (whose own fate is undecided while d is checked —
  * the deterministic convention a parallel verifier can implement).
  * The batch pipeline's connected-components rule is the
  * compaction-time refinement; the oracle reproduces THIS greedy
  * rule wave-for-wave, unrolled.
  *
  * Exactly-once discipline (the [[DedupIngest]] proof shape): each
  * batch reads keep_shingles ∪ staged(< own batch_id), so a replay
  * after later batches landed recomputes its original survivor set;
  * staging is batch_id dynamic overwrite; publish seals by per-table
  * anti-join on doc_id (a rerun after any crash appends only what is
  * missing) and deletes each staging partition only after its append
  * lands.
  *
  * 100 TB shape: per batch the work is |batch| extraction/scoring
  * (broadcast dictionary joins against the two vocabulary-bounded
  * artifacts), one mk-equi-join against the store (at scale: a
  * shuffle-hash probe of the batch against the store's bucketed mk
  * layout — never a rescan of history text), and |batch| dictionary
  * encode with the full-vocabulary-hit fast path. History is never
  * re-extracted, re-scored, re-shingled or re-encoded.
  */
object PipeIngest {

  /** Pinned localCheckpoints (history keeps, bench shingle sets, the
    * per-wave frames), released with the shared-lineage lifecycle
    * (ADVICE r11: these pins previously had no release registration —
    * repeated store builds in one session accumulated block-manager
    * storage until session end). Deferred (onClear) rather than
    * end-of-call release because returned frames may still reference
    * the checkpoints until the caller evaluates them.
    */
  private val issued =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  graft.operators.Lineage.onClear(() => issued.synchronized {
    import org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint
    issued.foreach(releaseCheckpoint)
    issued.clear()
  })

  private def ckpt(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    issued.synchronized { issued += c }
    c
  }

  private def modelP(path: String) = s"$path/model"
  private def priorsP(path: String) = s"$path/priors"
  private def tokP(path: String) = s"$path/tok"
  private def keepShing(path: String) = s"$path/keep_shingles"
  private def docsP(path: String) = s"$path/docs"
  private def stDocs(path: String) = s"$path/staged_docs"
  private def stShing(path: String) = s"$path/staged_shingles"
  // FULL-chain store extensions (round 11 — streaming/batch stage
  // symmetry): the fixed benchmark's contamination artifacts (built
  // once, like a real benchmark suite) and the growing span index the
  // greedy scrub checks new text against.
  private def benchSgP(path: String) = s"$path/bench_sg"
  private def benchBloomP(path: String) = s"$path/bench_bloom"
  private def spanIdxP(path: String) = s"$path/span_index"
  private def stSpans(path: String) = s"$path/staged_spans"
  private def funnelP(path: String) = s"$path/funnel"

  /** (doc_id, shingles, mk): the min-shingle-keyed frame of a
    * (doc_id, clean) set — the batch pipeline's candidate key over
    * the stage-2 survivors' clean text.
    */
  private def keyedShingles(clean: DataFrame): DataFrame =
    Dedup.shingleFrame(
        clean.select(col("doc_id"), col("clean").as("text")))
      .select(col("doc_id"), col("shingles"),
        array_min(col("shingles")).as("mk"))

  /** Exact-Jaccard ≥ 0.7 verify between two aliased keyed-shingle
    * frames (the pver arithmetic of the batch oracle).
    */
  private def verified: org.apache.spark.sql.Column = {
    val inter = size(array_intersect(col("a.shingles"),
      col("b.shingles"))).cast("long")
    val uni = (size(col("a.shingles")) + size(col("b.shingles")))
      .cast("long") - inter
    col("a.mk") === col("b.mk") && inter * 10 >= uni * 7
  }

  /** Train the artifacts on the history snapshot and build the
    * durable store: NB model + priors, the byte tokenizer, the
    * history keep set's shingle table, an empty sealed-docs root.
    */
  def build(s: SparkSession, hist: DataFrame, path: String): Unit = {
    buildKeep(s, hist, path); ()
  }

  /** [[build]]'s body, returning the history keep set's clean frame
    * so [[buildFull]] can seed the span index without re-running
    * extraction + scoring over the snapshot.
    */
  private def buildKeep(s: SparkSession, hist: DataFrame,
      path: String): DataFrame = {
    val h = hist.transform(ckpt)
    val (model, priors) = QualityClassifier.modelOn(s, h)
    model.write.mode("overwrite").parquet(modelP(path))
    priors.write.mode("overwrite").parquet(priorsP(path))
    TokenizerStore.saveBytesOf(s, h, tokP(path))
    val cleanH = CorpusPipeline.extractStage(h)(s)
    val keepH = CorpusPipeline.qualityStage(cleanH,
        s.read.parquet(modelP(path)), s.read.parquet(priorsP(path)))
      .transform(ckpt)
    keyedShingles(keepH).write.mode("overwrite")
      .parquet(keepShing(path))
    keepH
  }

  /** [[build]] plus the FULL chain's fixed artifacts (VERDICT r10
    * item 1 — the streaming build must run every stage its batch twin
    * runs): the benchmark's clean-shingle contamination set AND its
    * serialized Bloom sketch (a benchmark is a fixed artifact — the
    * sketch is built ONCE here, never re-sketched per micro-batch),
    * and the span index seeded with the history keep set's clean-text
    * [[CorpusPipeline.PipeSpanK]]-token windows (history contributes
    * spans to the scrub exactly as it contributes shingles to the
    * dedup — the sealed snapshot is immutable, so its spans gate NEW
    * text without ever being cut themselves).
    */
  def buildFull(s: SparkSession, hist: DataFrame, bench: DataFrame,
      path: String): Unit = {
    val keepH = buildKeep(s, hist, path)
    val cleanB = CorpusPipeline.extractStage(bench)(s)
    val ev = Dedup.shingleFrame(
        cleanB.select(col("doc_id"), col("clean").as("text")))
      .select(explode(col("shingles")).as("sg")).distinct()
      .transform(ckpt)
    ev.write.mode("overwrite").parquet(benchSgP(path))
    import s.implicits._
    Seq(Tuple1(Dedup.bloomBytesOf(ev))).toDF("bloom")
      .write.mode("overwrite").parquet(benchBloomP(path))
    CorpusPipeline.spanFrame(keepH).select("doc_id", "span").distinct()
      .write.mode("overwrite").parquet(spanIdxP(path))
  }

  private def staged(s: SparkSession, root: String,
      cols: Seq[String], before: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val hasBatch = fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch_id="))
    if (hasBatch)
      Some(s.read.parquet(root).filter(col("batch_id") < before)
        .select(cols.map(col): _*))
    else None
  }

  /** Encode a (doc_id, clean) frame against the STORED tokenizer —
    * the micro-batch encode block, factored so [[compact]] admits
    * previously-dropped docs through the identical chain. Returns
    * (doc_id, batch_id, n_pretokens, n_pieces, pieces_md5).
    */
  private def encodeRows(s: SparkSession, path: String,
      surv: DataFrame, batchId: Long): DataFrame = {
    val tokp = surv
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("clean"),
          lit(ByteBpe.PretokRegex), lit(0))).as(Seq("ti0", "t")))
      .select(col("doc_id"),
        (col("ti0") + 1).cast("long").as("ti"),
        hex(encode(col("t"), "UTF-8")).as("word"))
    val segs = TokenizerStore.segmentBytes(s, tokP(path),
      tokp.select("word"))
    val ptd = tokp.groupBy("doc_id")
      .agg(count(lit(1)).as("np"))
    val ped = tokp
      .join(broadcast(segs), "word") // dictionary: vocab-bounded
      .groupBy("doc_id")
      .agg(count(lit(1)).as("npc"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(struct(col("ti"), col("pos"),
            col("sym")))),
          x => x.getField("sym")))).as("pm"))
    surv.select(col("doc_id"))
      .join(ptd, Seq("doc_id"), "left")
      .join(ped, Seq("doc_id"), "left")
      .select(col("doc_id"), lit(batchId).as("batch_id"),
        coalesce(col("np"), lit(0L)).as("n_pretokens"),
        coalesce(col("npc"), lit(0L)).as("n_pieces"),
        coalesce(col("pm"), md5(lit(""))).as("pieces_md5"))
  }

  /** Run the raw-document stream through the pipeline against the
    * store. Per micro-batch: extract → score under the STORED model →
    * greedy near-dup check against store ∪ staged(<batch) ∪ smaller
    * same-batch ids → encode survivors against the STORED tokenizer →
    * land (docs, shingles) in the batch's staging partitions.
    */
  /** The shared front of every micro-batch: extract → stored-NB keep →
    * greedy near-dup survivors (vs store ∪ staged(<batch) ∪ smaller
    * same-batch ids). Returns (keepB, shB, surv).
    */
  private def greedyFront(s: SparkSession, path: String, b: DataFrame,
      batchId: Long): (DataFrame, DataFrame, DataFrame) = {
    val cleanB = CorpusPipeline.extractStage(b)(s).transform(ckpt)
    val keepB = CorpusPipeline.qualityStage(cleanB,
        s.read.parquet(modelP(path)),
        s.read.parquet(priorsP(path)))
      .transform(ckpt)
    val shB = keyedShingles(keepB).transform(ckpt)
    val prior = staged(s, stShing(path),
        Seq("doc_id", "shingles", "mk"), batchId)
      .fold(s.read.parquet(keepShing(path)))(st =>
        s.read.parquet(keepShing(path)).unionByName(st))
    // Greedy drop rule: d verifies against a prior keep, or a
    // same-batch quality-keep with smaller id.
    val dropPrior = shB.as("a").join(prior.as("b"), verified)
      .select(col("a.doc_id").as("doc_id"))
    val dropSelf = shB.as("a")
      .join(shB.as("b"),
        verified && col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id").as("doc_id"))
    val surv = keepB.join(dropPrior.union(dropSelf).distinct(),
      Seq("doc_id"), "left_anti").transform(ckpt)
    (keepB, shB, surv)
  }

  /** Stage the batch's encoded docs and its DEDUP survivors' shingles
    * (the common tail of both ingest chains).
    */
  private def stageBatch(s: SparkSession, path: String, shB: DataFrame,
      surv: DataFrame, enc: DataFrame, batchId: Long): Unit = {
    Formats.backfillPartitions(
      enc.withColumn("batch_id", lit(batchId)),
      "batch_id", stDocs(path))
    Formats.backfillPartitions(
      shB.join(surv.select("doc_id"), "doc_id")
        .withColumn("batch_id", lit(batchId)),
      "batch_id", stShing(path))
  }

  def ingest(s: SparkSession, path: String, batches: DataFrame,
      checkpoint: String): Unit = {
    val q = batches.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val (_, shB, surv) = greedyFront(s, path, b, batchId)
        stageBatch(s, path, shB, surv,
          encodeRows(s, path, surv, batchId), batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The FULL micro-batch chain (round 11 — the batch recipe's stage
    * list, streamed): extract → stored-NB keep → greedy dedup →
    * benchmark DECONTAMINATION against the stored sketch → greedy
    * duplicated-span SCRUB against the span index → stored-tokenizer
    * encode → stage. Stage order inside `foreachBatch` mirrors
    * [[CorpusPipeline]] stages 0–6 exactly; the two streaming-only
    * adaptations are the greedy conventions already documented for
    * dedup, extended to spans:
    *
    *  - DEDUP survivors' shingles are staged even when decontamination
    *    later drops the doc — the batch rule: dedup decisions are
    *    independent of decontamination (a contaminated CC minimum
    *    still suppresses its near-dups), so the streaming keep set
    *    must match it.
    *  - SPAN scrub is greedy: a new doc's token run is cut iff its
    *    window occurs in ≥ 2 distinct docs of THIS batch's
    *    decontaminated survivors (the batch rule over the mutable
    *    set) OR in the span index ∪ earlier staged batches (sealed
    *    text is immutable — the first occurrence already shipped;
    *    compaction is where a global re-decision would live).
    *    Survivors' POST-scrub spans join the index at publish, so the
    *    indexed set is always "spans of the corpus text as emitted".
    *
    * Per-batch FUNNEL row (batch_id, n_in, n_quality_kept,
    * n_dedup_kept, n_decontam_kept, n_tokens_cut) lands in
    * `funnel/batch_id=N` by dynamic-partition overwrite — derived
    * deterministically from the batch content, so replay rewrites it
    * identically (exactly-once without sealing).
    *
    * 100 TB shape: decontamination is scan-side Bloom prefilter
    * (sketch deserialized from the store, built once at [[buildFull]])
    * + broadcast exact verify against the benchmark-sized shingle
    * set; the scrub adds one span-equi-join of the batch's windows
    * against the indexed spans (at scale: a shuffle-hash probe of the
    * batch against the span index's bucketed layout) and a
    * batch-local window group-by. History is never re-spanned.
    */
  def ingestFull(s: SparkSession, path: String, batches: DataFrame,
      checkpoint: String): Unit = {
    import graft.functions.TextHash.tokens
    val evC = s.read.parquet(benchSgP(path)).transform(ckpt)
    val bloomBytes = s.read.parquet(benchBloomP(path))
      .first().getAs[Array[Byte]]("bloom")
    val q = batches.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val (keepB, shB, surv) = greedyFront(s, path, b, batchId)
        // stage 4: benchmark decontamination (stored sketch + exact
        // verify; docs too short to shingle cannot be assessed — keep)
        val ovl = Dedup.bloomProbe(
          shB.join(surv.select("doc_id"), "doc_id")
            .select("doc_id", "shingles"),
          evC, bloomBytes)
        val decon = surv.join(ovl, Seq("doc_id"), "left")
          .filter(col("n_shingles").isNull ||
            col("n_overlap") * CorpusPipeline.ContamFrac
              < col("n_shingles"))
          .select("doc_id", "clean").transform(ckpt)
        // stage 5: greedy span scrub vs span_index ∪ staged(<batch)
        val priorSpans = staged(s, stSpans(path), Seq("span"), batchId)
          .fold(s.read.parquet(spanIdxP(path)).select("span"))(st =>
            s.read.parquet(spanIdxP(path)).select("span")
              .unionByName(st))
        val scrubbed = CorpusPipeline
          .scrubStageAgainst(decon, priorSpans).transform(ckpt)
        stageBatch(s, path, shB, surv,
          encodeRows(s, path, scrubbed, batchId), batchId)
        Formats.backfillPartitions(
          CorpusPipeline.spanFrame(scrubbed)
            .select("doc_id", "span").distinct()
            .withColumn("batch_id", lit(batchId)),
          "batch_id", stSpans(path))
        // funnel row — the per-wave acceptance dashboard
        val nIn = b.agg(count(lit(1)).as("n_in"))
        val nQ = keepB.agg(count(lit(1)).as("n_quality_kept"))
        val nS = surv.agg(count(lit(1)).as("n_dedup_kept"))
        val nD = decon.agg(count(lit(1)).as("n_decontam_kept"),
          sum(size(tokens(col("clean"))).cast("long")).as("tin"))
        val tOut = scrubbed.agg(
          sum(size(tokens(col("clean"))).cast("long")).as("tout"))
        Formats.backfillPartitions(
          nIn.crossJoin(broadcast(nQ)).crossJoin(broadcast(nS))
            .crossJoin(broadcast(nD)).crossJoin(broadcast(tOut))
            .select(lit(batchId).as("batch_id"), col("n_in"),
              col("n_quality_kept"), col("n_dedup_kept"),
              col("n_decontam_kept"),
              (coalesce(col("tin"), lit(0L))
                - coalesce(col("tout"), lit(0L))).as("n_tokens_cut")),
          "batch_id", funnelP(path))
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Sealed ∪ staged encoded rows — visible before any publish. */
  def docsAll(s: SparkSession, path: String): DataFrame = {
    val cols = Seq("doc_id", "batch_id", "n_pretokens", "n_pieces",
      "pieces_md5")
    val p = new org.apache.hadoop.fs.Path(docsP(path))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val sealedD =
      if (fs.exists(p))
        s.read.parquet(docsP(path)).select(cols.map(col): _*)
      else s.range(0).select(col("id").as("doc_id"),
        col("id").as("batch_id"), col("id").as("n_pretokens"),
        col("id").as("n_pieces"),
        col("id").cast("string").as("pieces_md5"))
    staged(s, stDocs(path), cols, Long.MaxValue)
      .fold(sealedD)(st => sealedD.unionByName(st))
  }

  /** Seal staged batches into the durable store (docs append +
    * survivor shingles into keep_shingles), per-table anti-join
    * recovery by doc_id, batch ids enumerated across BOTH staging
    * roots, staging partitions deleted only after the appends land.
    */
  def publish(s: SparkSession, path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def idsIn(root: String): Set[Long] = {
      val rp = new org.apache.hadoop.fs.Path(root)
      if (!fs.exists(rp)) Set.empty
      else fs.listStatus(rp).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong).toSet
    }
    val batchIds =
      (idsIn(stDocs(path)) ++ idsIn(stShing(path)) ++
        idsIn(stSpans(path))).toSeq.sorted
    // Appended-doc reporting comes from the writes' own commit
    // artifacts ([[Formats.appendCounted]], VERDICT r9 minor): the
    // publish loop runs NO action beyond the appends themselves.
    var appended = 0L
    batchIds.foreach { b =>
      def gone(root: String): Boolean =
        !fs.exists(new org.apache.hadoop.fs.Path(s"$root/batch_id=$b"))
      if (!gone(stDocs(path))) {
        // Reading one batch_id=N leaf directly loses the partition
        // column — restore it from the id being sealed.
        val d = s.read.parquet(s"${stDocs(path)}/batch_id=$b")
          .withColumn("batch_id", lit(b))
          .select("doc_id", "batch_id", "n_pretokens", "n_pieces",
            "pieces_md5")
          .transform(ckpt)
        val docsRoot = new org.apache.hadoop.fs.Path(docsP(path))
        val miss =
          if (fs.exists(docsRoot))
            d.join(s.read.parquet(docsP(path)).select("doc_id"),
              Seq("doc_id"), "left_anti").transform(ckpt)
          else d
        appended += Formats.appendCounted(miss, docsP(path))
      }
      if (!gone(stShing(path))) {
        val sh = s.read.parquet(s"${stShing(path)}/batch_id=$b")
          .select("doc_id", "shingles", "mk").transform(ckpt)
        val sealedSh = s.read.parquet(keepShing(path))
          .select("doc_id").distinct()
        sh.join(sealedSh, Seq("doc_id"), "left_anti")
          .transform(ckpt)
          .write.mode("append").parquet(keepShing(path))
      }
      // FULL-chain stores only: seal the batch's post-scrub spans
      // into the span index (same per-table anti-join recovery).
      if (!gone(stSpans(path))) {
        val sp = s.read.parquet(s"${stSpans(path)}/batch_id=$b")
          .select("doc_id", "span").transform(ckpt)
        val sealedSp = s.read.parquet(spanIdxP(path))
          .select("doc_id").distinct()
        sp.join(sealedSp, Seq("doc_id"), "left_anti")
          .transform(ckpt)
          .write.mode("append").parquet(spanIdxP(path))
      }
      Seq(stDocs(path), stShing(path), stSpans(path)).foreach(r =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$r/batch_id=$b"),
          true))
    }
    Seq(stDocs(path), stShing(path), stSpans(path)).foreach { r =>
      val rp = new org.apache.hadoop.fs.Path(r)
      if (fs.exists(rp) && !fs.listStatus(rp)
          .exists(_.getPath.getName.startsWith("batch_id=")))
        fs.delete(rp, true)
    }
    appended
  }

  // -----------------------------------------------------------------
  // GREEDY → GLOBAL RECONCILIATION (VERDICT r9 item 2): the sealed
  // store's keep set is the arrival-order-dependent GREEDY one;
  // compact() re-decides it under the batch pipeline's
  // connected-components rule (cluster-minimum keeps) — the
  // reconciliation path the greedy-divergence contrast test names.

  private def cTmp(path: String) = s"$path/compact_tmp"
  private def cMark(path: String) = s"${cTmp(path)}/_COMMITTED"

  /** Complete an interrupted compaction swap: once the `_COMMITTED`
    * marker exists, the staged tables are the truth — each table is
    * swapped iff its staged copy is still present (a crash between
    * the two swaps leaves exactly one staged), then the staging root
    * is dropped. Idempotent; called at every [[compact]] entry and
    * usable standalone as crash recovery.
    */
  private def completeSwap(s: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(cMark(path)))) return
    Seq("docs", "keep_shingles").foreach { t =>
      val staged = new org.apache.hadoop.fs.Path(s"${cTmp(path)}/$t")
      if (fs.exists(staged)) {
        val live = new org.apache.hadoop.fs.Path(s"$path/$t")
        fs.delete(live, true)
        fs.rename(staged, live)
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(cTmp(path)), true)
  }

  /** Re-decide the SEALED store under the batch CC rule over the full
    * `corpus` (history ∪ every streamed doc, raw (doc_id, text)):
    *
    *  1. recompute the quality keep set with the STORED artifacts
    *     (extraction + NB gate — never retrained: compaction
    *     reconciles the dedup DECISION, not the models);
    *  2. batch keeplist = connected-component minima of the verified
    *     near-dup pair graph (exactly [[CorpusPipeline.dedupStage]]'s
    *     rule, on the same mk-candidate + Jaccard-verify predicate
    *     the greedy rule used);
    *  3. DEMOTE store docs outside the keeplist (greedy-kept
    *     non-minimal chain members; also history-internal near-dups
    *     the build never deduped); ADMIT keeplist docs the greedy
    *     rule dropped (a late-arriving cluster minimum) — encoded
    *     through the stored tokenizer with batch_id = −1, the
    *     compaction-admitted marker (their arrival batch was never
    *     recorded — they were dropped).
    *
    * Exactly-once: admissions are anti-join appends (idempotent, the
    * publish discipline). Demotions rewrite the two tables via a
    * staged copy + `_COMMITTED` marker + swap ([[completeSwap]] —
    * the VersionedIndex single-marker atomic-visibility shape): a
    * crash before the marker leaves the live tables untouched, after
    * it the swap completes on the next call. With nothing to demote
    * the rewrite is skipped entirely — an admit-only compaction
    * touches no existing file.
    *
    * 100 TB shape: the DECISION work is one extraction/scoring pass
    * plus the mk-bucketed candidate join and the pair-bounded CC
    * fixpoint — the batch pipeline's own cost, run at compaction
    * cadence, never per batch. Only affected docs are re-encoded
    * (admissions) — demotions are row drops. At scale the store
    * tables are partitioned (batch_id / doc-id buckets) and the
    * demote rewrite is a dynamic partition overwrite of the affected
    * partitions only (the backfillPartitions discipline); this
    * flat-directory store swaps whole tables behind the same marker.
    */
  def compact(s: SparkSession, path: String, corpus: DataFrame): Long = {
    completeSwap(s, path) // finish any interrupted predecessor first
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

    val clean = CorpusPipeline.extractStage(corpus)(s).transform(ckpt)
    val keep = CorpusPipeline.qualityStage(clean,
        s.read.parquet(modelP(path)), s.read.parquet(priorsP(path)))
      .transform(ckpt)
    val sh = keyedShingles(keep).transform(ckpt)
    val pairs = sh.as("a")
      .join(sh.as("b"), verified && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val labels = Dedup.connectedComponents(pairs)
    val bkeep = keep
      .join(labels.select(col("node").as("doc_id"), col("c").as("cid")),
        Seq("doc_id"), "left")
      .filter(col("doc_id") === coalesce(col("cid"), col("doc_id")))
      .select("doc_id", "clean").transform(ckpt)

    val storeKeep = s.read.parquet(keepShing(path)).select("doc_id")
    val demote = storeKeep
      .join(bkeep.select("doc_id"), Seq("doc_id"), "left_anti")
      .transform(ckpt)
    val admit = bkeep
      .join(storeKeep, Seq("doc_id"), "left_anti")
      .transform(ckpt) // ⊆ streamed: build() sealed every history keep

    // ADMIT first (idempotent appends): encode rows + keep shingles,
    // each anti-joined against the live table — a rerun after a crash
    // appends only what is missing.
    var admitted = 0L
    if (!admit.isEmpty) {
      val docsRoot = new org.apache.hadoop.fs.Path(docsP(path))
      val enc = encodeRows(s, path, admit, -1L).transform(ckpt)
      val missDocs =
        if (fs.exists(docsRoot))
          enc.join(s.read.parquet(docsP(path)).select("doc_id"),
            Seq("doc_id"), "left_anti").transform(ckpt)
        else enc
      admitted += Formats.appendCounted(missDocs, docsP(path))
      val missSh = keyedShingles(admit)
        .join(s.read.parquet(keepShing(path)).select("doc_id"),
          Seq("doc_id"), "left_anti").transform(ckpt)
      missSh.write.mode("append").parquet(keepShing(path))
    }

    // DEMOTE via staged rewrite + marker + swap (skipped when empty).
    if (!demote.isEmpty) {
      fs.delete(new org.apache.hadoop.fs.Path(cTmp(path)), true)
      s.read.parquet(docsP(path))
        .join(demote, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"${cTmp(path)}/docs")
      s.read.parquet(keepShing(path))
        .join(demote, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"${cTmp(path)}/keep_shingles")
      fs.create(new org.apache.hadoop.fs.Path(cMark(path)), true).close()
      completeSwap(s, path)
    }
    admitted
  }

  // -----------------------------------------------------------------
  // pipe_stream_ingest: the oracle-gated lifecycle — history =
  // doc_id % 10 == HistMod (the dd_stream_dedup convention), the rest
  // streams in three waves by doc_id % 3 (one file per wave,
  // maxFilesPerTrigger=1). Waves 0–1 are ingested and PUBLISHED,
  // wave 2 stays staged; the gated result reads sealed ∪ staged, so
  // the hash covers both segment states, the cross-batch greedy
  // dedup, the stored-model scoring and the stored-tokenizer encode.
  private[graft] val HistMod = DedupIngest.HistMod
  private[graft] val Waves = DedupIngest.Waves

  private def gatePath(s: SparkSession, dir: String,
      family: String): String = {
    graft.operators.GateSweep.sweepStale()
    s"/tmp/graft_${family}_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString +
      s"_${ProcessHandle.current().pid()}_${System.identityHashCode(s)}"
  }

  /** Child session for a store-build lifecycle (round 13): the
    * micro-batch waves and artifact training ran on the caller's 32
    * shuffle partitions, so every tiny per-wave stage paid 32 task
    * launches and the state/sink writers fanned 32 ways for a
    * few-hundred-document batch. 8 partitions is sized to the WAVE
    * volume (a micro-batch's shuffle should be a handful of
    * real-sized partitions — the Resume/RateIngest discipline), not
    * to the local core count: a production deployment picks this from
    * its batch size the same way; results are partition-count
    * invariant (spec-pinned).
    */
  private def scoped(s: SparkSession): SparkSession =
    graft.GraftSession.child(s,
      Map("spark.sql.shuffle.partitions" -> "8"))

  def pipeStreamIngest(s0: SparkSession, dir: String): DataFrame = {
    val path = gatePath(s0, dir, "pipe_ingest")
    graft.operators.Lineage.ensure(s0, dir, "pipe_stream_store") {
      val s = scoped(s0)
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(root, true)
      val docsAllT = graft.Tables(s, dir, "documents")
        .select("doc_id", "text").transform(ckpt)
      build(s, docsAllT.filter(col("doc_id") % 10 === HistMod), path)
      val src = s"$path/src"
      val ckptDir = s"$path/ckpt"
      def stream = s.readStream.schema(docsAllT.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      def writeWave(w: Int): Unit = docsAllT
        .filter(col("doc_id") % 10 =!= HistMod &&
          col("doc_id") % Waves === w)
        .coalesce(1).write.mode("append").parquet(src)
      // One ingest PER wave (ADVICE r9): with both files written up
      // front, FileStreamSource orders them by modification time and
      // a timestamp tie falls back to part-file names — swapping
      // batches 0/1, and with them the batch_id column and the greedy
      // earlier-batch-survivor keeps. Running ingest after each
      // writeWave pins wave w to batch w (the checkpoint continues
      // batch numbering across runs), making the mapping a contract
      // instead of a filesystem race. (DedupIngest keeps the
      // two-files-one-run shape: its PAIR set is provably invariant
      // under a batch swap — either order discovers each cross-wave
      // pair exactly once — so only this lifecycle, whose RESULT
      // carries batch_id, needs the pinning.)
      writeWave(0); ingest(s, path, stream, ckptDir)
      writeWave(1); ingest(s, path, stream, ckptDir)
      publish(s, path)
      writeWave(2)
      ingest(s, path, stream, ckptDir) // staged, deliberately unpublished
      ()
    }
    docsAll(s0, path).orderBy("doc_id")
  }

  // pipe_compact: the full lifecycle PLUS reconciliation — all three
  // waves ingested AND published (the long-lived sealed store), then
  // compact() re-decides it under the batch CC rule. The gated result
  // is the compacted encoded-docs table: greedy-kept non-minimal
  // chain members demoted, late-arriving cluster minima admitted with
  // batch_id = −1 through the stored-tokenizer encode, everything
  // else bit-identical to its sealed row.
  def pipeCompact(s0: SparkSession, dir: String): DataFrame = {
    val path = gatePath(s0, dir, "pipe_compact")
    graft.operators.Lineage.ensure(s0, dir, "pipe_compact_store") {
      val s = scoped(s0)
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(root, true)
      val docsAllT = graft.Tables(s, dir, "documents")
        .select("doc_id", "text").transform(ckpt)
      graft.operators.PhaseLog.phase("pipe_compact artifact build") {
        build(s, docsAllT.filter(col("doc_id") % 10 === HistMod), path)
      }
      val src = s"$path/src"
      val ckptDir = s"$path/ckpt"
      def stream = s.readStream.schema(docsAllT.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      def writeWave(w: Int): Unit = docsAllT
        .filter(col("doc_id") % 10 =!= HistMod &&
          col("doc_id") % Waves === w)
        .coalesce(1).write.mode("append").parquet(src)
      // Per-wave walls (VERDICT r12 item 6): the cold floor of this
      // row is adjudicated from these phase lines — each wave is a
      // full streaming-query start/ingest/stop plus the greedy
      // front's store-sized reads.
      (0 until Waves).foreach { w =>
        graft.operators.PhaseLog.phase(s"pipe_compact wave $w") {
          writeWave(w); ingest(s, path, stream, ckptDir)
        }
      }
      graft.operators.PhaseLog.phase("pipe_compact publish") {
        publish(s, path)
      }
      graft.operators.PhaseLog.phase("pipe_compact compact") {
        compact(s, path, docsAllT)
      }
      ()
    }
    docsAll(s0, path).orderBy("doc_id")
  }

  // pipe_stream_full / pipe_stream_funnel: the FULL-recipe streaming
  // lifecycle (VERDICT r10 item 1 — streaming/batch stage symmetry).
  // Same wave protocol as pipe_stream_ingest, with the batch
  // pipeline's benchmark holdout: history = doc_id % 10 == HistMod
  // trains the artifacts, doc_id % 10 == EvalMod is the benchmark
  // (never streamed — its clean shingles are the stored contamination
  // set), the remaining 8/10 stream in three waves. Waves 0–1
  // published, wave 2 staged; the docs gate covers both segment
  // states through all seven stages, the funnel gate covers each
  // wave's per-stage acceptance counts.
  private[graft] val EvalMod = CorpusPipeline.PipeEvalMod

  private def fullStore(s0: SparkSession, dir: String): String = {
    val path = gatePath(s0, dir, "pipe_full")
    graft.operators.Lineage.ensure(s0, dir, "pipe_stream_full_store") {
      val s = scoped(s0)
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(root, true)
      val docsAllT = graft.Tables(s, dir, "documents")
        .select("doc_id", "text").transform(ckpt)
      buildFull(s,
        docsAllT.filter(col("doc_id") % 10 === HistMod),
        docsAllT.filter(col("doc_id") % 10 === EvalMod), path)
      val src = s"$path/src"
      val ckptDir = s"$path/ckpt"
      def stream = s.readStream.schema(docsAllT.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      def writeWave(w: Int): Unit = docsAllT
        .filter(col("doc_id") % 10 =!= HistMod &&
          col("doc_id") % 10 =!= EvalMod &&
          col("doc_id") % Waves === w)
        .coalesce(1).write.mode("append").parquet(src)
      // One ingest per wave — the batch_id pinning contract (see
      // pipeStreamIngest's Scaladoc).
      writeWave(0); ingestFull(s, path, stream, ckptDir)
      writeWave(1); ingestFull(s, path, stream, ckptDir)
      publish(s, path)
      writeWave(2)
      ingestFull(s, path, stream, ckptDir) // staged, deliberately unpublished
      ()
    }
    path
  }

  def pipeStreamFull(s: SparkSession, dir: String): DataFrame =
    docsAll(s, fullStore(s, dir)).orderBy("doc_id")

  def pipeStreamFunnel(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(funnelP(fullStore(s, dir)))
      .select(col("batch_id").cast("long").as("batch_id"),
        col("n_in"), col("n_quality_kept"), col("n_dedup_kept"),
        col("n_decontam_kept"), col("n_tokens_cut"))
      .orderBy("batch_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_stream_ingest" -> pipeStreamIngest,
    "pipe_compact" -> pipeCompact,
    "pipe_stream_full" -> pipeStreamFull,
    "pipe_stream_funnel" -> pipeStreamFunnel,
  )

  // ---------------------------------------------------------------
  // Oracle: the identical chain — history-restricted label rules +
  // NB training (the SHARED CTE blocks of the batch pipeline's
  // oracle), extraction + classifier keep over ALL docs, the greedy
  // wave-unrolled dedup, and the history-trained byte chain with
  // zero-frequency RIDER words (survivors' clean pretokens ride the
  // merge replay without perturbing the training counts — exactly
  // the stored-merge replay contract of TokenizerStore.segmentBytes).
  private lazy val StreamCtes: String = streamCtesFor("", "surv")

  /** Header block shared by every streaming-pipeline oracle: history
    * label rules + NB training, extraction + classifier keep over ALL
    * docs, shingles, the verified-pair graph, history keeps, and the
    * wave assignment (`excludeEval` holds the benchmark slice out of
    * the stream — the FULL chain's holdout convention).
    */
  private def headerCtes(excludeEval: Boolean): String = {
    import graft.text.TextAnalysis
    val jacc =
      """len(list_intersect(a.shingles, b.shingles)) * 10 >=
         (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) * 7"""
    val wvFilter =
      if (excludeEval)
        s"doc_id % 10 <> $HistMod AND doc_id % 10 <> $EvalMod"
      else s"doc_id % 10 <> $HistMod"
    s"""hdocs AS (SELECT * FROM documents WHERE doc_id % 10 = $HistMod),
       ${TextAnalysis.filterCtesOn("hdocs")},
       ${CorpusPipeline.NbModelCtes},
       ${CorpusPipeline.ExtractCtes},
       ${CorpusPipeline.QualityCtes},
       ${CorpusPipeline.ShingleCtes},
       qk AS (SELECT doc_id FROM qkeep),
       pk AS (SELECT doc_id, shingles, list_min(shingles) AS mk
         FROM psh),
       vp AS (SELECT a.doc_id AS x, b.doc_id AS y FROM pk a
         JOIN pk b ON a.mk = b.mk AND a.doc_id <> b.doc_id
         AND $jacc),
       hk AS (SELECT doc_id FROM qk WHERE doc_id % 10 = $HistMod),
       wv AS (SELECT doc_id, CAST(doc_id % $Waves AS BIGINT) AS wave
         FROM documents WHERE $wvFilter)"""
  }

  /** Per-wave greedy-dedup survivors (q$w/s$w) + the `surv` union —
    * identical for the plain and full chains (the extra full-chain
    * stages act AFTER dedup, never on it).
    */
  private lazy val WaveSurvCtes: String = {
    val waveSurv = (0 until Waves).map { w =>
      val priors = "hk" +: (0 until w).map(i => s"s$i")
      val priorUnion = priors
        .map(t => s"SELECT doc_id FROM $t").mkString(" UNION ALL ")
      s"""q$w AS (SELECT q.doc_id FROM qk q
           JOIN wv USING (doc_id) WHERE wv.wave = $w),
         s$w AS (SELECT d.doc_id FROM q$w d WHERE NOT EXISTS (
           SELECT 1 FROM vp WHERE vp.x = d.doc_id AND (
             vp.y IN ($priorUnion)
             OR (vp.y IN (SELECT doc_id FROM q$w)
               AND vp.y < d.doc_id))))"""
    }.mkString(",\n")
    s"""$waveSurv,
       surv AS (${(0 until Waves).map(w =>
        s"SELECT doc_id, CAST($w AS BIGINT) AS batch_id FROM s$w")
        .mkString(" UNION ALL ")})"""
  }

  /** The history-trained byte chain with zero-frequency RIDER words
    * over `cleanRel`, a relation with (doc_id, clean) — the encode
    * tail every streaming-pipeline oracle ends in.
    */
  private def byteEncodeCtes(cleanRel: String): String =
    s"""btok AS (SELECT hex(encode(w)) AS word FROM (
         SELECT unnest(regexp_extract_all(text,
           '${ByteBpe.DPretok}')) AS w FROM hdocs)),
       bwf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
         FROM btok GROUP BY word),
       stokp AS MATERIALIZED (SELECT doc_id, ti, hex(encode(w)) AS word
         FROM (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS ti,
             unnest(ws) AS w
           FROM (SELECT doc_id,
               regexp_extract_all(clean, '${ByteBpe.DPretok}') AS ws
             FROM $cleanRel csrc))),
       wfall AS (SELECT w.word, COALESCE(bwf.freq, 0) AS freq
         FROM (SELECT word FROM bwf
           UNION SELECT DISTINCT word FROM stokp) w
         LEFT JOIN bwf USING (word)),
       pc0 AS MATERIALIZED (SELECT word, freq, i AS pos,
           substr(word, CAST(2*i - 1 AS INTEGER), 2) AS sym
         FROM (SELECT word, freq,
             unnest(range(1, len(word) // 2 + 1)) AS i
           FROM wfall)),
       ${(1 to ByteBpe.Merges).map(k =>
        // positiveOnly: the rider words carry freq 0; a rider-only
        // pair must never win a merge round (BpeCore.roundCtes doc).
        graft.text.BpeCore.roundCtes(k, positiveOnly = true))
        .mkString(",\n")},
       enc AS (SELECT t.doc_id, t.ti, p.pos, p.sym
         FROM stokp t JOIN pc${ByteBpe.Merges} p ON p.word = t.word),
       ptd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS np
         FROM stokp GROUP BY doc_id),
       ped AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS npc,
           md5(string_agg(sym, ',' ORDER BY ti, pos)) AS pm
         FROM enc GROUP BY doc_id)"""

  /** The shared chain, parameterized for the compaction twin:
    * `extra` CTEs are inserted after `surv` (the greedy survivor
    * set), and the byte-encode chain runs over `encSrc` (doc_id,
    * batch_id) instead of `surv` — the rider-word replay covers
    * whatever doc set the caller encodes.
    */
  private def streamCtesFor(extra: String, encSrc: String): String =
    s"""${headerCtes(excludeEval = false)},
       $WaveSurvCtes,
       $extra
       ${byteEncodeCtes(s"(SELECT qkeep.doc_id, qkeep.clean FROM qkeep" +
        s" JOIN $encSrc USING (doc_id))")}"""

  // The compaction oracle's extra CTEs (inserted after `surv`): the
  // batch CC rule over the SAME verified-pair graph `vp` (which spans
  // history AND streamed quality keeps), cluster-minimum keeps, then
  // the compacted streamed set with the original batch_id where the
  // greedy rule also kept the doc and −1 where compaction admitted it.
  // Ends with a comma — the chain continues into the encode CTEs.
  private lazy val CompactExtra: String =
    s"""breach AS (SELECT x AS node, y AS r FROM vp
         UNION
         SELECT breach.node, e.y FROM breach
         JOIN vp e ON breach.r = e.x),
       blab AS (SELECT node, LEAST(node, MIN(r)) AS cid
         FROM breach GROUP BY node),
       bkeep AS (SELECT qk.doc_id FROM qk
         LEFT JOIN blab ON blab.node = qk.doc_id
         WHERE qk.doc_id = COALESCE(blab.cid, qk.doc_id)),
       ckeep AS (SELECT b.doc_id,
           COALESCE(surv.batch_id, CAST(-1 AS BIGINT)) AS batch_id
         FROM bkeep b LEFT JOIN surv USING (doc_id)
         WHERE b.doc_id % 10 <> $HistMod),"""

  // The FULL chain's oracle: the shared header + greedy wave dedup,
  // then per wave the DECONTAMINATION keep (overlap of psh shingles
  // vs the benchmark slice's clean shingles, the batch ContamFrac
  // rule) and the GREEDY SPAN SCRUB (windows duplicated within the
  // wave's decontaminated survivors, or present in the history span
  // set ∪ earlier waves' FINAL-text spans), ending in the rider-word
  // byte encode over the final clean text. Wave-unrolled, exactly
  // like the greedy dedup CTEs.
  private lazy val FullCtes: String = {
    val K = CorpusPipeline.PipeSpanK
    val CF = CorpusPipeline.ContamFrac
    val CT = CorpusPipeline.CleanToks
    val waveBlocks = (0 until Waves).map { w =>
      val priorSpans = ("SELECT span FROM hsp" +:
        (0 until w).map(v => s"SELECT span FROM fsp$v"))
        .mkString(" UNION ALL ")
      // MATERIALIZED throughout: wave w's final spans feed wave w+1's
      // dup set — without materialization DuckDB inlines the whole
      // prior-wave chain into every reference and the plan blows up
      // exponentially in the wave count (measured: sf0.001 ran >10
      // minutes; materialized it's seconds).
      s"""d$w AS MATERIALIZED (SELECT s.doc_id FROM s$w s
           LEFT JOIN psh ON psh.doc_id = s.doc_id
           LEFT JOIN sovl ON sovl.doc_id = s.doc_id
           WHERE psh.doc_id IS NULL
             OR COALESCE(sovl.novl, 0) * $CF < len(psh.shingles)),
         wsf$w AS MATERIALIZED (SELECT qkeep.doc_id, $CT AS toks
           FROM qkeep JOIN d$w USING (doc_id)
           WHERE len($CT) >= $K),
         wsp$w AS MATERIALIZED (SELECT doc_id,
             unnest(range(1, len(toks) - ${K - 2})) AS i,
             unnest(list_transform(range(1, len(toks) - ${K - 2}),
               i -> md5(array_to_string(toks[i:i+${K - 1}], ' '))))
               AS span
           FROM wsf$w),
         wdup$w AS MATERIALIZED (SELECT span FROM wsp$w GROUP BY span
             HAVING COUNT(DISTINCT doc_id) >= 2
           UNION
           SELECT span FROM wsp$w JOIN ($priorSpans) ps USING (span)),
         wcv$w AS (SELECT DISTINCT doc_id,
             unnest(range(i, i + $K)) AS p
           FROM wsp$w JOIN wdup$w USING (span)),
         wcov$w AS (SELECT doc_id, list(p) AS cov FROM wcv$w
           GROUP BY doc_id),
         wrb$w AS MATERIALIZED (SELECT f.doc_id,
             list_filter(list_transform(range(1, len(toks) + 1),
               p -> CASE WHEN NOT list_contains(
                   COALESCE(cov, CAST([] AS BIGINT[])), p)
                 THEN toks[p] END),
               x -> x IS NOT NULL) AS ftoks
           FROM wsf$w f LEFT JOIN wcov$w USING (doc_id)),
         fin$w AS MATERIALIZED (SELECT d.doc_id,
             CASE WHEN r.doc_id IS NOT NULL
               THEN COALESCE(array_to_string(r.ftoks, ' '), '')
               ELSE qkeep.clean END AS clean
           FROM d$w d JOIN qkeep ON qkeep.doc_id = d.doc_id
           LEFT JOIN wrb$w r ON r.doc_id = d.doc_id),
         fsp$w AS MATERIALIZED (SELECT DISTINCT
             md5(array_to_string(ftoks[i:i+${K - 1}], ' ')) AS span
           FROM (SELECT ftoks,
               unnest(range(1, len(ftoks) - ${K - 2})) AS i
             FROM wrb$w WHERE len(ftoks) >= $K) t)"""
    }.mkString(",\n")
    s"""${headerCtes(excludeEval = true)},
       $WaveSurvCtes,
       clb AS (SELECT doc_id, clean FROM cl
         WHERE doc_id % 10 = $EvalMod),
       ${CorpusPipeline.shingleCtesOn("clb", "b")},
       bev AS MATERIALIZED (SELECT DISTINCT unnest(shingles) AS sg
         FROM bsh),
       sovl AS MATERIALIZED (SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS novl
         FROM (SELECT doc_id, unnest(shingles) AS sg FROM psh) t
         JOIN bev USING (sg) GROUP BY doc_id),
       hkc AS (SELECT qkeep.doc_id, $CT AS toks FROM qkeep
         WHERE doc_id % 10 = $HistMod),
       hsp AS MATERIALIZED (SELECT DISTINCT
           md5(array_to_string(toks[i:i+${K - 1}], ' ')) AS span
         FROM (SELECT toks,
             unnest(range(1, len(toks) - ${K - 2})) AS i
           FROM hkc WHERE len(toks) >= $K) t),
       $waveBlocks,
       fdoc AS (${(0 until Waves).map(w =>
        s"SELECT doc_id, CAST($w AS BIGINT) AS batch_id, clean" +
          s" FROM fin$w").mkString(" UNION ALL ")}),
       ${byteEncodeCtes("fdoc")}"""
  }

  private lazy val FunnelSelect: String = {
    val CT = CorpusPipeline.CleanToks
    (0 until Waves).map { w =>
      s"""SELECT CAST($w AS BIGINT) AS batch_id,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM wv WHERE wave = $w)
             AS n_in,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM q$w)
             AS n_quality_kept,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s$w)
             AS n_dedup_kept,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d$w)
             AS n_decontam_kept,
           (SELECT CAST(COALESCE(SUM(len($CT)), 0) AS BIGINT)
             FROM qkeep JOIN d$w USING (doc_id))
           - (SELECT CAST(COALESCE(SUM(len($CT)), 0) AS BIGINT)
             FROM fin$w) AS n_tokens_cut"""
    }.mkString(" UNION ALL ")
  }

  val oracles: Map[String, String] = Map(
    "pipe_stream_full" ->
      s"""WITH $FullCtes
         SELECT fdoc.doc_id, fdoc.batch_id,
           COALESCE(ptd.np, 0) AS n_pretokens,
           COALESCE(ped.npc, 0) AS n_pieces,
           COALESCE(ped.pm, md5('')) AS pieces_md5
         FROM fdoc LEFT JOIN ptd USING (doc_id)
           LEFT JOIN ped USING (doc_id)
         ORDER BY doc_id""",
    "pipe_stream_funnel" ->
      s"""WITH $FullCtes
         SELECT * FROM ($FunnelSelect) f
         ORDER BY batch_id""",
    "pipe_stream_ingest" ->
      s"""WITH $StreamCtes
         SELECT surv.doc_id, surv.batch_id,
           COALESCE(ptd.np, 0) AS n_pretokens,
           COALESCE(ped.npc, 0) AS n_pieces,
           COALESCE(ped.pm, md5('')) AS pieces_md5
         FROM surv LEFT JOIN ptd USING (doc_id)
           LEFT JOIN ped USING (doc_id)
         ORDER BY doc_id""",
    // The reconciliation equivalence: the compacted store's encoded
    // docs ≡ the batch CC keeplist over the same corpus (restricted
    // to streamed docs), proven through the full greedy lifecycle +
    // compact() instead of a single batch — RECURSIVE for the CC
    // reach closure.
    "pipe_compact" ->
      s"""WITH RECURSIVE ${streamCtesFor(CompactExtra, "ckeep")}
         SELECT ckeep.doc_id, ckeep.batch_id,
           COALESCE(ptd.np, 0) AS n_pretokens,
           COALESCE(ped.npc, 0) AS n_pieces,
           COALESCE(ped.pm, md5('')) AS pieces_md5
         FROM ckeep LEFT JOIN ptd USING (doc_id)
           LEFT JOIN ped USING (doc_id)
         ORDER BY doc_id""",
  )
}
