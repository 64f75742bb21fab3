package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash

/** RAG RETRIEVAL COMPOSITION (`ss_rag_retrieve`, round 10) — the
  * text tier feeds the similarity tier end to end: the retrieval
  * loop a RAG system runs over a 100 TB corpus, composed from the
  * engine's own gated operators:
  *
  *   documents
  *     → [1] chunk          ([[graft.pipeline.CorpusOps.chunkFrame]]
  *                           — ta_chunk's exact arithmetic)
  *     → [2] embed          (feature hashing: dim = hash60(token)
  *                           mod [[Dim]], sign from the next hash
  *                           bit — the classic hashing trick; exact
  *                           integer vectors, zero-norm chunks
  *                           skipped as unembeddable)
  *     → [3] index          (sign-random-projection band sketch —
  *                           [[NBands]] bands × [[BandBits]] bits
  *                           over baked ±1 planes, the dd_embed_lsh
  *                           family's blocking shape)
  *     → [4] retrieve       (band-join candidates → exact
  *                           signed-square-cosine rerank → top
  *                           [[TopK]] per query, deterministic
  *                           tie-break)
  *
  * Queries are the held-out slice's first chunks (doc_id mod 10 =
  * [[EvalMod]] — the benchmark-holdout convention shared with the
  * corpus pipeline), the corpus is every chunk of the train slice:
  * retrieval never sees its own document, the real RAG setup.
  *
  * Exactness: embeddings, plane projections, dots and norms are
  * integers end to end; the only double is the final
  * score = dot·|dot| / (‖q‖²·‖c‖²) — two exact int64s into one
  * correctly-rounded division, bit-identical cross-engine (the
  * monotone transform of cosine that avoids sqrt: sign-preserving
  * square). The ±1 planes are baked once in Scala from md5 bytes and
  * emitted as literals into the oracle — no cross-engine float or
  * hash evaluation in the projection.
  *
  * Recall contract: candidates = pairs sharing ≥ 1 of the [[NBands]]
  * bands. A query with no band collision retrieves nothing —
  * declared, like every LSH tier here. Band WIDTH is corpus-derived
  * (the [[graft.dedup.Dedup.hiBitsFor]] discipline): r = the
  * smallest [[MinBits]]..[[MaxBits]] rung with corpus_chunks ≤
  * [[TargetBucket]]·2^r, computed as one integer CASE over the
  * corpus count riding both plans as a broadcast scalar — per-band
  * buckets stay ≈ [[TargetBucket]] and the candidate set stays the
  * LSH-band shape at EVERY corpus size, where a fixed r would grow
  * it quadratically. Each band owns a fixed [[MaxBits]]-plane
  * stride and a rung uses the stride's first r planes, so a rung
  * step REFINES buckets (prefix property, spec-pinned) instead of
  * remapping them.
  *
  * 100 TB shape: chunk+embed+sketch is one narrow pass per side (no
  * shuffle until the band join); the band join is an 8-byte-key
  * equi-join; rerank cost = candidates × one zip_with dot; the final
  * top-k is a per-query window over candidates only.
  */
object RagRetrieve {

  val Dim = 64
  /** Band width floor (the fixture regime) and ceiling (the ladder's
    * last rung — extend the ladder before a corpus outgrows it, the
    * [[graft.dedup.Dedup.hiBitsFor]] contract).
    */
  val MinBits = 12
  val MaxBits = 15
  val NBands = 4
  val NPlanes: Int = NBands * MaxBits
  val TopK = 3
  /** Target per-band bucket occupancy: band bits r are the smallest
    * rung with corpus_chunks <= TargetBucket << r — candidates stay
    * ≈ queries × bands × TargetBucket at EVERY corpus size instead of
    * growing quadratically with a fixed r (the fixed-parameter-
    * quadratic class; integer CASE ladder, no cross-engine floats).
    */
  val TargetBucket = 256L
  /** The benchmark-holdout slice ([[graft.dedup.Dedup.BloomEvalMod]]). */
  val EvalMod: Int = graft.dedup.Dedup.BloomEvalMod

  /** ±1 projection planes, baked from md5("rag:p:d") parity — fixed
    * literals shared verbatim with the oracle.
    */
  lazy val Planes: Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NPlanes, Dim) { (p, d) =>
      md.reset()
      val h = md.digest(s"rag:$p:$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1L else -1L
    }
  }

  /** Double-consumed side frames (band explode + vector attach),
    * localCheckpointed and released with the shared-lineage
    * lifecycle — the BpeCore/CorpusPipeline discipline.
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

  /** The band-bits rung for a corpus-chunk-count column. */
  private def rungOf(n: Column): Column =
    (MinBits until MaxBits).reverse
      .foldLeft(lit(MaxBits): Column)((acc, r) =>
        when(n <= lit(TargetBucket << r), r).otherwise(acc))

  /** (keys…, v: dense Dim-vector of signed token counts, nrm = ‖v‖²),
    * zero-norm chunks dropped.
    */
  private[sim] def embed(chunks: DataFrame, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val h = TextHash.hash60(col("t"))
    chunks
      .select(kc :+ explode(TextHash.tokens(col("chunk_text"))).as("t"): _*)
      .select(kc ++ Seq((h % Dim).cast("int").as("d"),
        when(shiftright(h, 6) % 2 === 0, 1L).otherwise(-1L).as("sgn")): _*)
      .groupBy(kc :+ col("d"): _*).agg(sum("sgn").as("w"))
      .groupBy(kc: _*)
      .agg(map_from_entries(collect_list(struct(col("d"), col("w"))))
        .as("m"))
      .select(kc ++ Seq(
        transform(sequence(lit(0), lit(Dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("int")), lit(0L)))
          .as("v")): _*)
      .withColumn("nrm", aggregate(col("v"), lit(0L),
        (a, x) => a + x * x))
      .filter(col("nrm") > 0)
  }

  /** Band keys over the baked planes: bit p = (v · plane_p) > 0,
    * band b = MSB-first fold of its [[BandBits]] bits.
    */
  private[sim] def withBands(df: DataFrame, rung: Column): DataFrame = {
    val planes: Column = typedlit(Planes.map(_.toSeq).toSeq)
    df.withColumn("bk",
      transform(sequence(lit(0), lit(NBands - 1)), b =>
        aggregate(sequence(lit(0), (rung - 1).cast("int")), lit(0L),
          (acc, r) => {
            // Band b owns the fixed plane stride [b·MaxBits,
            // b·MaxBits + MaxBits); rung r uses its first r planes,
            // so growing the rung refines buckets without remapping.
            val proj = aggregate(
              zip_with(col("v"),
                element_at(planes, (b * MaxBits + r + 1).cast("int")),
                (x, w) => x * w),
              lit(0L), (a, y) => a + y)
            acc * 2 + when(proj > 0, 1L).otherwise(0L)
          })))
  }

  def ragRetrieve(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.CorpusOps.chunkFrame
    val chunks = chunkFrame(Tables(s, dir, "documents")
      .repartition(col("doc_id")))
    val corpE = embed(
      chunks.filter(col("doc_id") % 10 =!= EvalMod),
      Seq("doc_id", "chunk_idx"))
    // The rung derives from the CORPUS side's embedded-chunk count
    // and rides both plans as one broadcast 1-row scalar (the PHash
    // cap discipline) - queries and corpus always share it.
    val nF = broadcast(corpE.agg(count(lit(1)).as("n_chunks")))
    val corp = ckpt(withBands(corpE.crossJoin(nF),
      rungOf(col("n_chunks"))).drop("n_chunks"))
    val qry = ckpt(withBands(embed(
      chunks.filter(col("doc_id") % 10 === EvalMod &&
        col("chunk_idx") === 0L),
      Seq("doc_id")).crossJoin(nF), rungOf(col("n_chunks")))
      .drop("n_chunks"))
    // SLIM candidate discovery (128× find): the band join and its
    // dropDuplicates shuffle carry ONLY the key triple — the dense
    // vectors attach AFTER dedup via two keyed joins and drop again
    // in the same projection that computes the dot, so no shuffle in
    // the plan ever carries a vector per CANDIDATE (measured: the
    // wide-row variant wrote a candidate-proportional multi-GB-per-
    // octave shuffle that filled local disk at 128×; candidates are
    // linear in queries × TargetBucket, so the slim shuffle is a few
    // dozen bytes per candidate at any scale).
    val cB = corp.select(col("doc_id"), col("chunk_idx"),
      posexplode(col("bk")).as(Seq("bi", "bh")))
    val qB = qry.select(col("doc_id").as("q_doc_id"),
      posexplode(col("bk")).as(Seq("bi", "bh")))
    val cand = qB.join(cB, Seq("bi", "bh"))
      .select("q_doc_id", "doc_id", "chunk_idx")
      .dropDuplicates("q_doc_id", "doc_id", "chunk_idx")
    val dot = aggregate(zip_with(col("qv"), col("cv"),
      (x, y) => x * y), lit(0L), (a, y) => a + y)
    val scored = cand
      .join(qry.select(col("doc_id").as("q_doc_id"),
        col("v").as("qv"), col("nrm").as("qn")), Seq("q_doc_id"))
      .join(corp.select(col("doc_id"), col("chunk_idx"),
        col("v").as("cv"), col("nrm").as("cn")),
        Seq("doc_id", "chunk_idx"))
      .withColumn("dot", dot)
      .select(col("q_doc_id"), col("doc_id"), col("chunk_idx"),
        col("dot"), col("qn"), col("cn"),
        ((col("dot") * abs(col("dot"))).cast("double") /
          (col("qn") * col("cn")).cast("double")).as("score"))
    val w = Window.partitionBy("q_doc_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_idx"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("q_doc_id", "rank", "doc_id", "chunk_idx", "dot",
        "qn", "cn", "score")
      .orderBy("q_doc_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss_rag_retrieve" -> ragRetrieve,
  )

  // ---------------------------------------------------------------
  // Oracle: the same chain — ta_chunk's CTE arithmetic, the hashing-
  // trick embedding as one unnest + GROUP BY per side, plane
  // projections against the SAME baked literals via a (p, d, pw)
  // literal table join, band folds, band-join candidates, exact
  // rerank, windowed top-k.
  private val PlanesFlat: String =
    Planes.flatten.mkString("[", ", ", "]")

  /** The rung ladder as one integer CASE over the corpus chunk
    * count — [[rungOf]]'s SQL twin, emitted from the same constants.
    */
  private val RungCase: String =
    (MinBits until MaxBits).reverse.foldLeft(s"$MaxBits")((acc, r) =>
      s"CASE WHEN n <= ${TargetBucket << r} THEN $r ELSE $acc END")
  private val CL = graft.pipeline.CorpusOps.ChunkLen
  private val CS = graft.pipeline.CorpusOps.ChunkStride

  /** Embedding + band CTE block over `$src (doc_id, chunk_idx,
    * chunk_text)`: emits `${pfx}dw` (sparse weights), `${pfx}n`
    * (norms, zero-norm dropped), `${pfx}bk` (band keys).
    */
  private def embCtes(src: String, pfx: String): String =
    s"""${pfx}tk AS (SELECT doc_id, chunk_idx,
           unnest(regexp_extract_all(lower(chunk_text), '[a-z0-9]+'))
             AS t
         FROM $src),
       ${pfx}h AS (SELECT doc_id, chunk_idx,
           CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
         FROM ${pfx}tk),
       ${pfx}dw AS (SELECT doc_id, chunk_idx, h % $Dim AS d,
           CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)
             AS BIGINT) AS w
         FROM ${pfx}h GROUP BY doc_id, chunk_idx, d),
       ${pfx}n AS (SELECT doc_id, chunk_idx,
           CAST(SUM(w * w) AS BIGINT) AS nrm
         FROM ${pfx}dw GROUP BY doc_id, chunk_idx
         HAVING SUM(w * w) > 0),
       ${pfx}bt AS (SELECT doc_id, chunk_idx, pl.p,
           CASE WHEN SUM(w * pw) > 0 THEN 1 ELSE 0 END AS bit
         FROM ${pfx}dw JOIN ${pfx}n USING (doc_id, chunk_idx)
         JOIN pl USING (d)
         GROUP BY doc_id, chunk_idx, pl.p)"""

  /** Rung-windowed band fold over `${pfx}bt` — emitted AFTER the
    * `rr` rung CTE (which needs the corpus norms), for both sides.
    */
  private def bandCte(pfx: String): String =
    s"""${pfx}bk AS (SELECT doc_id, chunk_idx, p // $MaxBits AS bi,
           CAST(SUM(CASE WHEN (p % $MaxBits) < rr.r
             THEN bit << CAST(rr.r - 1 - (p % $MaxBits) AS INTEGER)
             ELSE 0 END) AS BIGINT) AS bh
         FROM ${pfx}bt CROSS JOIN rr
         GROUP BY doc_id, chunk_idx, bi, rr.r)"""

  val oracles: Map[String, String] = Map(
    "ss_rag_retrieve" ->
      s"""WITH d0 AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
         n0 AS (SELECT doc_id, toks, len(toks) AS nt FROM d0),
         chx AS (SELECT doc_id, toks,
             unnest(generate_series(0, CASE WHEN nt <= $CL THEN 0
               ELSE (nt - $CL + $CS - 1) // $CS END)) AS chunk_idx
           FROM n0),
         cht AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             array_to_string(
               toks[chunk_idx*$CS + 1 : chunk_idx*$CS + $CL], ' ')
               AS chunk_text
           FROM chx),
         corp AS (SELECT * FROM cht WHERE doc_id % 10 <> $EvalMod),
         qry AS (SELECT * FROM cht
           WHERE doc_id % 10 = $EvalMod AND chunk_idx = 0),
         pl AS (SELECT CAST(i // $Dim AS BIGINT) AS p,
             CAST(i % $Dim AS BIGINT) AS d,
             pls[CAST(i + 1 AS INTEGER)] AS pw
           FROM (SELECT unnest(range(0, ${NPlanes * Dim})) AS i,
             $PlanesFlat AS pls)),
         ${embCtes("corp", "c")},
         ${embCtes("qry", "q")},
         rr AS (SELECT $RungCase AS r
           FROM (SELECT COUNT(*) AS n FROM cn)),
         ${bandCte("c")},
         ${bandCte("q")},
         cand AS (SELECT DISTINCT q.doc_id AS q_doc_id,
             c.doc_id, c.chunk_idx
           FROM qbk q JOIN cbk c ON q.bi = c.bi AND q.bh = c.bh),
         dots AS (SELECT cand.q_doc_id, cand.doc_id, cand.chunk_idx,
             CAST(COALESCE(SUM(qd.w * cd.w), 0) AS BIGINT) AS dot
           FROM cand
           LEFT JOIN qdw qd ON qd.doc_id = cand.q_doc_id
           LEFT JOIN cdw cd ON cd.doc_id = cand.doc_id
             AND cd.chunk_idx = cand.chunk_idx AND cd.d = qd.d
           GROUP BY cand.q_doc_id, cand.doc_id, cand.chunk_idx),
         scored AS (SELECT t.q_doc_id, t.doc_id, t.chunk_idx, t.dot,
             qn.nrm AS qn, cn.nrm AS cn,
             CAST(t.dot * abs(t.dot) AS DOUBLE)
               / CAST(qn.nrm * cn.nrm AS DOUBLE) AS score
           FROM dots t
           JOIN qn ON qn.doc_id = t.q_doc_id
           JOIN cn ON cn.doc_id = t.doc_id
             AND cn.chunk_idx = t.chunk_idx),
         rk AS (SELECT *, CAST(row_number() OVER (
             PARTITION BY q_doc_id
             ORDER BY score DESC, doc_id, chunk_idx) AS BIGINT) AS rank
           FROM scored)
         SELECT q_doc_id, rank, doc_id, chunk_idx, dot, qn, cn, score
         FROM rk WHERE rank <= $TopK
         ORDER BY q_doc_id, rank""",
  )
}
