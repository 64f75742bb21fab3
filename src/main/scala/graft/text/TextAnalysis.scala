package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash

/** Text-analysis operator tier over the `documents` fixture
  * (north-star [ext] rows of SURVEY.md §2: language-ID, quality
  * scoring, token counting, fingerprinting, TF-IDF, n-grams — the
  * per-document passes a 100 TB training-data pipeline runs before
  * dedup/filtering).
  *
  * Every query is a single narrow pass (higher-order array functions,
  * no UDFs, no joins except TF-IDF's broadcast-sized term table) over
  * either the raw `doc_id, text` scan or the shared [[tokenized]]
  * table — tokenize once, analyze many. All arithmetic follows the
  * cross-engine determinism rules of [[TextHash]] so each query has a
  * full DuckDB oracle.
  */
object TextAnalysis {
  import TextHash._

  /** Raw docs spread over all cores before any tokenization — the
    * fixture is a single parquet file (one scan task), so deriving
    * directly off the scan would single-thread the per-token hashing.
    */
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").repartition(col("doc_id"))

  /** Shared (doc_id, toks) tokenization — the common prefix of the
    * per-document token-level ta_ queries, each of which used to
    * re-scan and re-tokenize the corpus. Lineage-materialized
    * DISK_ONLY (round 6): at 100 TB this is "run the tokenizer once,
    * write the tokenized table, every downstream analysis pass reads
    * it" — the same write-once/read-many promotion the dd_ shingle
    * signature table got.
    *
    * Deliberately NOT used by three query families:
    *  - raw-text consumers (quality, scrub, token_count, lang_ngram)
    *    keep their own narrow `doc_id, text` scans;
    *  - the multi-branch inverted-index builders (tfidf, tfidfSim,
    *    pmi) read their token frame 2× per query, and the block-
    *    manager cache stores `array<string>` as serialized rows whose
    *    per-read decode measures SLOWER than the codegen'd scan-side
    *    re-tokenize it would replace (sf0.1: pmi 0.7 → 1.8 s shared);
    *    they keep direct scans — the single-shot exploding pass is
    *    already the right 100 TB shape for them.
    */
  private[text] def tokenized(s: SparkSession, dir: String): DataFrame =
    graft.operators.Lineage.materialized(s, dir, "ta_tokenized",
      org.apache.spark.storage.StorageLevel.DISK_ONLY) {
      // Column order (toks, doc_id) is LOAD-BEARING: CacheManager
      // substitutes the persisted plan into ANY query containing a
      // sameResult subtree, so a cached (doc_id, toks) projection
      // silently rewired the three direct-scan consumers below back
      // into the cache they opted out of (measured: tfidf pinned at
      // ~1.7 s either way until the order flip made their plans
      // genuinely distinct). Consumers of THIS frame select by name
      // and still hit the cache. The always-true size() filter is a
      // SECOND structural distinction (ADVICE r6): the order flip
      // alone is load-bearing on sameResult not normalizing
      // projection column order — an upstream canonicalization change
      // would silently rewire the opt-outs with only the
      // CacheSubstitutionSpec tripwire to notice. No consumer's
      // direct-scan plan contains this filter, and the optimizer has
      // no fold rule for a size() comparison, so the cached plan stays
      // distinct under any projection normalization. Semantically a
      // no-op: split() never returns null arrays, so size ≥ 0 always.
      docs(s, dir).select(tokens(col("text")).as("toks"), col("doc_id"))
        .filter(size(col("toks")) >= -1)
    }

  /** Tiny per-language marker-word lists drawn from the fixture
    * vocabulary. The corpus text is synthetic word-salad, so this is
    * a mechanism test (deterministic argmax scoring), not a model.
    */
  val MarkerWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data", "value"),
    "es" -> Seq("customer", "query", "table"),
    "de" -> Seq("window", "batch", "group"),
    "fr" -> Seq("stream", "line", "merge"),
    "zh" -> Seq("spark", "vector", "hash"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => array_contains(array(words.map(lit): _*), w)))
      .cast("long")

  /** argmax over the s_<lang> score columns with ties broken by list
    * order (en > es > de > fr > zh) — identical CASE chain in the
    * oracles.
    */
  private def argmaxChain(langs: Seq[String]): Column =
    langs.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((l, i), els) =>
        if (i == langs.size - 1) els
        else when(langs.drop(i + 1)
          .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _), l)
          .otherwise(els)
    }

  // -----------------------------------------------------------------
  // ta_lang_id: marker-word occurrence scoring + fixed-priority argmax.
  def langId(s: SparkSession, dir: String): DataFrame = {
    // toks read from the shared tokenized frame; the 5 per-language
    // filters read an attribute instead of re-running the tokenizer.
    val scored = tokenized(s, dir)
      .select(
        col("doc_id") +: MarkerWords.map { case (l, ws) =>
          hits(col("toks"), ws).as(s"s_$l")
        }: _*)
    scored.withColumn("pred_lang", argmaxChain(MarkerWords.map(_._1)))
      .orderBy("doc_id")
  }

  /** Per-language character-bigram profiles derived deterministically
    * from the marker words — the n-gram flavor of language-ID (the
    * real-world form: char n-gram profiles à la Cavnar–Trenkle,
    * usable when no tokenizer exists for the language).
    */
  val NgramProfiles: Seq[(String, Seq[String])] = MarkerWords.map {
    case (l, ws) =>
      l -> ws.flatMap(w => w.sliding(2).filter(_.length == 2))
        .distinct.sorted
  }

  // ta_lang_ngram: char-bigram-profile scoring + the same argmax.
  // The score |distinct-bigrams(text) ∩ profile| equals the number of
  // profile bigrams occurring ANYWHERE in the text, so instead of
  // materializing all len-1 bigram substrings per row (an O(len)
  // allocation the first version paid) we probe each of the ~15
  // profile entries with `contains` — a pure whole-stage-codegen
  // CASE/Contains chain, no arrays, ~2.5× faster at sf0.1.
  def langNgram(s: SparkSession, dir: String): DataFrame = {
    def score(prof: Seq[String]): Column =
      prof.map(p => when(col("lt").contains(lit(p)), 1L).otherwise(0L))
        .reduce(_ + _)
    val scored = docs(s, dir)
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .select(
        col("doc_id") +: NgramProfiles.map { case (l, prof) =>
          score(prof).as(s"s_$l")
        }: _*)
    scored.withColumn("pred_lang", argmaxChain(NgramProfiles.map(_._1)))
      .orderBy("doc_id")
  }

  // -----------------------------------------------------------------
  // ta_quality: length/ratio heuristics — the classic pre-training
  // quality gates (token counts, mean token length, alpha ratio,
  // stopword ratio, boolean keep-decision).
  def quality(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    docs(s, dir)
      .select(col("doc_id"), col("text"), toks.as("toks"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("text_len"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t))
          .as("tok_chars"),
        hits(col("toks"), MarkerWords.head._2).as("stop_hits"))
      .select(
        col("doc_id"), col("text_len"), col("n_tokens"), col("tok_chars"),
        (col("tok_chars").cast("double") / nullif(col("n_tokens"), lit(0L)))
          .as("mean_tok_len"),
        (col("tok_chars").cast("double") / nullif(col("text_len"), lit(0L)))
          .as("alpha_ratio"),
        (col("stop_hits").cast("double") / nullif(col("n_tokens"), lit(0L)))
          .as("stop_ratio"),
        (col("n_tokens").between(5L, 1000L) &&
          (col("tok_chars") * 1L).between(col("n_tokens") * 2L,
            col("n_tokens") * 12L)).as("quality_ok"))
      .orderBy("doc_id")
  }

  // -----------------------------------------------------------------
  // ta_token_count: whitespace tokens, BPE-ish piece count (letter
  // runs / digit runs / single punctuation), distinct-token count.
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0)))
          .cast("long").as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("bpe_pieces"),
        size(array_distinct(tokens(col("text")))).cast("long")
          .as("distinct_tokens"))
      .orderBy("doc_id")

  // -----------------------------------------------------------------
  // ta_fingerprint: order-sensitive rolling hash of the token-hash
  // stream + content-sampled min-shingle (both per [[TextHash]]).
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    tokenized(s, dir)
      .select(col("doc_id"), tokenHashes(col("toks")).as("hs"))
      .select(
        col("doc_id"),
        rollingFingerprint(col("hs")).as("fp"),
        coalesce(array_min(shingles3(col("hs"))), lit(-1L))
          .as("min_shingle"))
      .orderBy("doc_id")
  }

  // -----------------------------------------------------------------
  // ta_tfidf: top-3 terms per document by tf-idf.
  // Scale: the term→df table is vocabulary-sized (broadcast join);
  // the doc-count scalar rides a broadcast cross join — the corpus
  // itself is touched in one exploded pass with partial aggregation.
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    // Direct scan, not [[tokenized]] — see the tokenized Scaladoc.
    val d = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("toks"))
    val n = d.agg(count(lit(1)).as("nd"))
    val tf = d
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "n_toks", "term")
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score"), asc("term"))
    tf.join(broadcast(dfc), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf").cast("double") / col("n_toks")) *
          ((col("nd") + 1).cast("double") / (col("df") + 1)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("doc_id", "term", "rank", "score")
      .orderBy("doc_id", "rank")
  }

  // -----------------------------------------------------------------
  // ta_bigrams: global top-20 word bigrams (count desc, bigram asc —
  // a total order, so the LIMIT frontier is deterministic).
  def bigrams(s: SparkSession, dir: String): DataFrame = {
    val toks = col("toks") // attribute: 2 element_at reads per index
    // Direct scan, not [[tokenized]] — cheap single-pass consumer: the
    // cached array<string> decode costs more than its whole downstream
    // (sf0.1: 0.46 s direct vs 0.62 s via cache). No doc_id in the
    // projection, so the plan cannot match the cached frame.
    docs(s, dir).select(tokens(col("text")).as("toks"))
      .select(explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2), i =>
          concat(element_at(toks, i + 1), lit(" "),
            element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("bigram"))
      .limit(20)
  }

  // -----------------------------------------------------------------
  // ta_array_funcs: the array scalar-function family (sort, index
  // from both ends, membership, slice+join) over the token arrays.
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    // Direct scan, not [[tokenized]] — same cheap-consumer reasoning as
    // [[bigrams]] (sf0.1: 0.40 s direct vs 0.57 s via cache); doc_id
    // leads the projection, so the plan cannot match the cached frame.
    docs(s, dir).select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        sort_array(col("toks")).as("sorted"))
      .select(
        col("doc_id"),
        element_at(col("sorted"), 1).as("first_tok"),
        element_at(col("sorted"), -1).as("last_tok"),
        array_contains(col("toks"), "the").as("has_the"),
        array_join(slice(col("sorted"), 1, 3), ",").as("first3"),
        size(col("toks")).cast("long").as("n"))
      .orderBy("doc_id")

  /** Winnowing window width (fingerprint density ≈ 2/(w+1)). */
  val WinnowW = 4

  // -----------------------------------------------------------------
  // ta_winnow: MOSS-style winnowing fingerprints (local minima over
  // windows of the positional shingle sequence). The fp_hash folds
  // the positional fingerprint sequence (deterministic order in both
  // engines); n_fps counts the distinct set.
  def winnow(s: SparkSession, dir: String): DataFrame =
    tokenized(s, dir)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), tokenHashes(col("toks")).as("hs"))
      .select(col("doc_id"), shingles3Seq(col("hs")).as("sh"))
      .select(col("doc_id"),
        winnowFingerprints(col("sh"), WinnowW).as("fps"))
      .select(
        col("doc_id"),
        size(array_distinct(col("fps"))).cast("long").as("n_fps"),
        array_min(col("fps")).as("min_fp"),
        rollingFingerprint(col("fps")).as("fp_hash"))
      .orderBy("doc_id")

  // -----------------------------------------------------------------
  // ta_tfidf_sim: document similarity by tf-idf weighted term overlap
  // — the sparse-vector twin of the dense embedding search in
  // graft.sim. Weights are INTEGER-quantized (tf × ⌊1000·idf⌋) so the
  // shared-term dot products sum exactly in any order in any engine;
  // magnitudes stay < 2^60. The term self-join is the classic sparse
  // inverted-index similarity shape: shuffle by term, never by pair.
  //
  // Scale guards on the inverted index, both mirrored in the oracle:
  //
  //  1. MAX-DF CUTOFF: a term appearing in d documents yields d²
  //     candidate rows out of the self-join, so one ubiquitous term
  //     ("the", df ≈ N) is a quadratic hot key at 100 TB. Terms with
  //     df > N/MaxDfDivisor are dropped BEFORE the join — they carry
  //     ≈ zero idf weight anyway (idf factor ≤ MaxDfDivisor·1000/N
  //     quantization units), so the pruning is also the standard
  //     relevance heuristic. The per-term fan-out is thereby bounded
  //     by (N/MaxDfDivisor)², i.e. the worst key costs (1/MaxDfDivisor²)
  //     of the naive worst case.
  //  2. QUERY-SET PUSHDOWN: the `doc_a < 20` restriction is applied to
  //     the probe side of the join explicitly, not left above the
  //     pair aggregate — the aggregate's group key blocks pushdown,
  //     and at scale the difference is |corpus|² vs |queries|·|corpus|
  //     join output.
  val MaxDfDivisor = 5 // keep terms with df ≤ N/5 (20% of docs)

  def tfidfSim(s: SparkSession, dir: String): DataFrame = {
    // Direct scan, not [[tokenized]] — see the tokenized Scaladoc.
    val d = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("toks"))
    val n = d.agg(count(lit(1)).as("nd"))
    val tf = d.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val weights = tf.join(broadcast(dfc), "term")
      .crossJoin(broadcast(n))
      .filter(col("df") * MaxDfDivisor <= col("nd")) // max-df cutoff
      .select(col("doc_id"), col("term"),
        (col("tf") * floor(lit(1000.0) * (col("nd") + 1).cast("double")
          / (col("df") + 1)).cast("long")).as("w"))
    val pairs = weights.filter(col("doc_id") < 20).as("a") // probe side
      .join(weights.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    val w = Window.partitionBy("doc_a").orderBy(desc("dot"), asc("doc_b"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("doc_a", "doc_b", "rank", "dot")
      .orderBy("doc_a", "rank")
  }

  // -----------------------------------------------------------------
  // ta_repetition: repetition signals in the style of the public
  // Gopher/MassiveText quality rules — fraction of duplicated tokens
  // and 3-grams, and the most-frequent-token share. High values flag
  // boilerplate/spam for pre-training filtering. Single narrow pass;
  // ratios are single double divisions (deterministic both engines).
  def repetition(s: SparkSession, dir: String): DataFrame =
    tokenized(s, dir)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("toks"),
        tokenHashes(col("toks")).as("hs"))
      .select(col("doc_id"), col("toks"), shingles3Seq(col("hs")).as("sh"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (lit(1.0) - size(array_distinct(col("toks"))).cast("double")
          / size(col("toks"))).as("dup_token_frac"),
        (lit(1.0) - size(array_distinct(col("sh"))).cast("double")
          / size(col("sh"))).as("dup_3gram_frac"),
        // max multiplicity via sort + longest-equal-run fold: O(n log n)
        // per doc instead of the O(n²) count-per-token scan.
        (aggregate(array_sort(col("toks")),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, t) => {
            val run = when(t === acc.getField("prev"),
              acc.getField("run") + 1L).otherwise(lit(1L))
            struct(t.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best")).cast("double")
          / size(col("toks"))).as("top_token_frac"))
      .orderBy("doc_id")

  // -----------------------------------------------------------------
  // ta_scrub: PII scrubbing + stopword removal — the cleanup pass a
  // training pipeline runs before tokenization. Counts email/URL
  // matches (the redaction targets; regexes use only character
  // classes and bounded quantifiers, identical under Java regex and
  // RE2), strips stopwords, and emits the md5 of the cleaned text so
  // the full scrubbed output — not just its length — is
  // hash-verified. Narrow single pass; at 100 TB this runs scan-side
  // with zero shuffle.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val Stopwords = Seq("a", "an", "the")

  def scrub(s: SparkSession, dir: String): DataFrame =
    scrubDf(docs(s, dir))

  /** The scrub pass over any (doc_id, text) frame — split out so specs
    * can drive it with synthetic PII-bearing lines.
    */
  def scrubDf(df: DataFrame): DataFrame = {
    val stop = array(Stopwords.map(lit): _*)
    df
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("text"), col("toks"),
        filter(col("toks"), t => !array_contains(stop, t)).as("clean"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("text"), lit(UrlRe), lit(0)))
          .cast("long").as("n_url"),
        (size(col("toks")) - size(col("clean"))).cast("long").as("n_stop"),
        size(col("clean")).cast("long").as("n_clean"),
        md5(array_join(col("clean"), " ")).as("clean_md5"))
      .orderBy("doc_id")
  }

  // -----------------------------------------------------------------
  // ta_lm_score: corpus-statistics LANGUAGE-MODEL quality scoring —
  // the fluency signal training-data filters use: each document is
  // scored by the MEAN add-one-smoothed bigram likelihood
  //   p_i = (C2(w_i, w_{i+1}) + 1) / (C1(w_i) + V)
  // under the corpus's own bigram/unigram statistics (C2/C1 = corpus
  // bigram/unigram occurrence counts over the scoreable ≥2-token
  // docs, V = vocabulary size). Text full of rare transitions scores
  // low, formulaic text high. Probabilities are SUMMED, not
  // log-summed: ln() is not bit-reproducible across engines, while
  // IEEE +, /, and the strict left-to-right fold are — the mean
  // likelihood is a well-defined statistic in its own right, ranking
  // documents exactly as the arithmetic says.
  //
  // Scale shape: the count tables are wordcount shuffles with partial
  // aggregation; scoring joins each doc's (pos, bigram) rows to them
  // on the bigram/unigram hash (shuffle equi-joins — a stop-bigram
  // hot bucket is AQE-skew-splittable); V rides along as one
  // broadcast scalar; and the per-doc fold runs over a sort_array'd
  // (pos, p) struct array, so the float accumulation order is
  // position order in BOTH engines (collect_list alone is
  // order-nondeterministic — the sort is what makes the gate exact).
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    // The scoreable (doc_id, hs) frame feeds FOUR branches (bigram
    // rows ×2, unigram counts, vocab size) and Spark's ReuseExchange
    // never fires on it — the higher-order tokenHashes lambda defeats
    // canonical plan equality (probed: 8 scans / 16 exchanges / 0
    // reused in the final adaptive plan). Materialize it once per
    // (session, dir): this is the corpus-statistics base table a
    // production LM-scoring pipeline persists before counting.
    val base = graft.operators.Lineage.materialized(s, dir, "ta_lm_base") {
      tokenized(s, dir)
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), tokenHashes(col("toks")).as("hs"))
        .repartition(col("doc_id"))
    }
    val withBg = base
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(hs) - 2), i ->
           struct(element_at(hs, i + 1) AS h1,
             (element_at(hs, i + 1) * 131 + element_at(hs, i + 2)) % $Prime
               AS bg))""")).as(Seq("pos", "x")))
      .select(col("doc_id"), col("pos"),
        col("x.h1").as("h1"), col("x.bg").as("bg"))
    val tok = base.select(explode(col("hs")).as("h"))
    val uniCnt = tok.groupBy("h").agg(count(lit(1)).as("c1"))
    val vDf = tok.agg(countDistinct(col("h")).as("v"))
    val bgCnt = withBg.groupBy("bg").agg(count(lit(1)).as("c2"))
    // Build-side discipline: the unigram table is vocabulary-bounded
    // (broadcast by law); the BIGRAM table is vocab²-bounded — big
    // enough at corpus scale that a forced broadcast would be wrong,
    // so it gets a shuffle_hash hint instead: the stream shuffles by
    // bg (an exchange it shares with the bgCnt aggregation), and the
    // count table is the per-partition hash BUILD side. Either hint
    // also prevents Catalyst's post-Generate underestimate of the
    // STREAM from flipping the build side onto it (measured on the
    // pack path at 32×: a 3.6 GiB stream broadcast).
    withBg
      .join(bgCnt.hint("shuffle_hash"), "bg")
      .join(broadcast(uniCnt.withColumnRenamed("h", "h1")), "h1")
      .crossJoin(broadcast(vDf))
      .select(col("doc_id"), col("pos"),
        ((col("c2") + 1).cast("double") /
          (col("c1") + col("v")).cast("double")).as("p"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"),
        size(col("ps")).cast("long").as("n_bigrams"),
        (aggregate(transform(col("ps"), x => x.getField("p")),
          lit(0.0), (acc, x) => acc + x) /
          size(col("ps")).cast("double")).as("lm_score"))
      .orderBy("doc_id")
  }

  // -----------------------------------------------------------------
  // ta_filter_pipeline: the COMPOSITE quality filter — the actual
  // keep/drop decision a C4/Gopher-style cleaning pass makes, with a
  // REASON CODE recording which rule fired (the provenance column
  // every curated corpus ships so ablations can re-admit rule-by-
  // rule). Rules fire in fixed order, first hit wins:
  //
  //   too_short     n_tokens < 10
  //   too_long      n_tokens > 5000
  //   bad_tok_len   mean token length outside [2, 12] chars
  //   low_stopword  stopword ratio < 5%
  //   repetitive    most-frequent-token share > 20%
  //   keep          (none fired)
  //
  // Every threshold is evaluated in INTEGER arithmetic (tok_chars vs
  // n_tokens·bounds, stop_hits·20 vs n_tokens, best_run·5 vs
  // n_tokens) so the decision is bit-identical across engines — no
  // double ratio ever reaches a comparison. Single narrow scan pass;
  // the max-multiplicity reuses [[repetition]]'s O(n log n)
  // sort+longest-run fold rather than a per-token count scan.
  def filterPipeline(s: SparkSession, dir: String): DataFrame =
    // Lineage-materialized (round 13): the rule frame is the label
    // source for the whole NB tier — ta_nb_model/quality/eval and the
    // pipe_quality stage each re-ran the per-doc interpreted folds
    // (array_sort + longest-run per doc) two to three times per
    // invocation. One derived table, the stage-boundary discipline.
    graft.operators.Lineage.materialized(s, dir, "ta_filter_frame") {
      filterPipelineOf(tokenized(s, dir))
    }

  /** The rule chain over an arbitrary (doc_id, toks) frame — the
    * seam the streaming corpus build labels its SNAPSHOT through
    * ([[graft.streaming.PipeIngest]] trains the NB gate on history
    * only, exactly as the shipped-classifier lifecycle demands).
    */
  private[graft] def filterPipelineOf(tokens: DataFrame): DataFrame = {
    val base = tokens
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t))
          .as("tok_chars"),
        hits(col("toks"), MarkerWords.head._2).as("stop_hits"),
        aggregate(array_sort(col("toks")),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, t) => {
            val run = when(t === acc.getField("prev"),
              acc.getField("run") + 1L).otherwise(lit(1L))
            struct(t.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best")).as("best_run"))
    base
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") < 10L, "too_short")
          .when(col("n_tokens") > 5000L, "too_long")
          .when(!col("tok_chars").between(
            col("n_tokens") * 2L, col("n_tokens") * 12L), "bad_tok_len")
          .when(col("stop_hits") * 20L < col("n_tokens"), "low_stopword")
          .when(col("best_run") * 5L > col("n_tokens"), "repetitive")
          .otherwise("keep").as("reason"))
      .withColumn("keep", col("reason") === "keep")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_filter_pipeline" -> filterPipeline,
    "ta_lm_score" -> lmScore,
    "ta_scrub" -> scrub,
    "ta_lang_ngram" -> langNgram,
    "ta_repetition" -> repetition,
    "ta_tfidf_sim" -> tfidfSim,
    "ta_winnow" -> winnow,
    "ta_array_funcs" -> arrayFuncs,
    "ta_lang_id" -> langId,
    "ta_quality" -> quality,
    "ta_token_count" -> tokenCount,
    "ta_fingerprint" -> fingerprint,
    "ta_tfidf" -> tfidf,
    "ta_bigrams" -> bigrams,
    "ta_bm25" -> bm25,
    "ta_pmi" -> pmi,
  )

  /** Fixed retrieval query for ta_bm25 (fixture-vocabulary terms).
    * Order matters: the per-term contributions are added in THIS
    * sequence on both engines.
    */
  val Bm25Terms: Seq[String] = Seq("data", "query", "window")

  /** Result size of the ranked retrieval. */
  val Bm25TopK = 20

  // -----------------------------------------------------------------
  // ta_bm25: BM25-style ranked retrieval (k1 = 1.2, b = 0.75) of the
  // top-20 documents for a fixed 3-term query — the IR scoring twin
  // of [[tfidf]].
  //
  // Hash-gate discipline: (a) the idf term is the RATIONAL
  // (N − df + 0.5)/(df + 0.5) — the log in Robertson's idf is a
  // monotone per-term transform, and ln() is not bit-reproducible
  // across engines (same rule as [[lmScore]]); (b) a document's score
  // is NOT a SUM aggregate (double sums are order-dependent) — each
  // term's contribution is pivoted to its own column (exactly one row
  // per (doc, term), so max() is selection, not arithmetic) and the
  // three columns are added left-to-right in [[Bm25Terms]] order, the
  // identical expression tree in both engines. Every remaining
  // operation is a single correctly-rounded IEEE op on identical
  // operands.
  //
  // Scale shape: tf touches only rows whose term is in the query
  // (filter below the aggregation); df and the corpus stats (N, Σdl)
  // are broadcast 1-row/vocabulary-sized frames; the top-20 frontier
  // is TakeOrdered, not a global sort.
  def bm25(s: SparkSession, dir: String): DataFrame = {
    val d = tokenized(s, dir)
    val st = broadcast(d.agg(count(lit(1)).as("nd"),
      sum(size(col("toks")).cast("long")).as("sl")))
    val tf = d
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib =
      (((col("nd") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))) *
        (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) *
            ((col("dl") * col("nd")).cast("double") / col("sl"))))
    val wide = tf.join(broadcast(dft), "term").crossJoin(st)
      .select(col("doc_id"), col("term"), contrib.as("c"))
      .groupBy("doc_id")
      .agg(
        coalesce(max(when(col("term") === Bm25Terms.head, col("c"))),
          lit(0.0)).as(s"c_${Bm25Terms.head}"),
        Bm25Terms.tail.map(t =>
          coalesce(max(when(col("term") === t, col("c"))), lit(0.0))
            .as(s"c_$t")): _*)
    wide
      .select(col("doc_id"),
        Bm25Terms.map(t => col(s"c_$t")).reduce(_ + _).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(Bm25TopK)
  }

  /** Minimum co-occurrence count for a PMI candidate (kills the
    * noisy hapax tail, standard collocation practice).
    */
  val PmiMinCount = 5L

  /** Result size of the collocation ranking. */
  val PmiTopK = 50

  // -----------------------------------------------------------------
  // ta_pmi: collocation extraction — adjacent token pairs ranked by
  // pointwise mutual information, the corpus statistic tokenizer
  // builders use to decide which pairs deserve a merged vocab entry
  // (complementing [[bigrams]], which ranks by raw frequency and so
  // surfaces only stopword pairs).
  //
  // Hash-gate discipline: PMI is log(P(ab)/(P(a)P(b))), but log is a
  // libm call with no cross-engine bit guarantee — and it is monotone,
  // so the RANKING is identical if we emit the rational argument
  // instead: lift = (c_ab·Nu²)/(c_a·c_b·Nb). The integer counts are
  // exact doubles (< 2^53), and both engines evaluate the identical
  // five-op tree (mul, mul, div, div, mul) on them — every step
  // correctly rounded on identical operands, hence bit-identical.
  //
  // Scale shape: one exploded pass each for unigram and bigram counts
  // (partial aggregation on both); the two count joins are
  // vocabulary-sized (AQE broadcasts them at any realistic vocab);
  // corpus totals ride broadcast 1-row frames; the final frontier is
  // TakeOrdered(PmiTopK), never a global sort.
  def pmi(s: SparkSession, dir: String): DataFrame = {
    // Direct scan, not [[tokenized]] — see the tokenized Scaladoc.
    val d = docs(s, dir).select(tokens(col("text")).as("toks"))
    val toks = col("toks")
    val uni = d.select(explode(toks).as("tkn"))
      .groupBy("tkn").agg(count(lit(1)).as("c"))
    val nu = broadcast(uni.agg(sum("c").as("nu")))
    val pairs = d
      .select(explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2), i =>
          struct(element_at(toks, i + 1).as("a"),
            element_at(toks, i + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>")))
        .as("pr"))
      .select(col("pr.a").as("a"), col("pr.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val nb = broadcast(pairs.agg(sum("cab").as("nb")))
    val ca = uni.select(col("tkn").as("a"), col("c").as("c_a"))
    val cb = uni.select(col("tkn").as("b"), col("c").as("c_b"))
    pairs.filter(col("cab") >= PmiMinCount)
      .join(broadcast(ca), "a").join(broadcast(cb), "b")
      .crossJoin(nu).crossJoin(nb)
      .select(concat(col("a"), lit(" "), col("b")).as("bigram"),
        col("cab").as("pair_cnt"),
        (((col("cab").cast("double") * col("nu").cast("double")) /
          (col("c_a").cast("double") * col("c_b").cast("double"))) *
          (col("nu").cast("double") / col("nb").cast("double")))
          .as("lift"))
      .orderBy(desc("lift"), asc("bigram"))
      .limit(PmiTopK)
  }

  // ---------------------------------------------------------------
  // DuckDB oracles. Shared SQL fragments mirror TextHash exactly.
  private[graft] val Toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  private val P = Prime

  /** DuckDB 31-bit word hash (mirror of [[TextHash.hash31]]). */
  private def dH31(w: String): String =
    s"CAST(('0x' || substr(md5($w), 1, 15)) AS BIGINT) % $P"

  /** The rule-based keep/drop label chain (d → b → r) of the
    * ta_filter_pipeline oracle, shared verbatim with the NB quality-
    * classifier oracle ([[QualityClassifier]]) so the classifier's
    * training labels are THE filter's decisions in both engines.
    */
  /** [[FilterCtes]] parameterized on the source relation — the
    * streaming corpus build's oracle labels its HISTORY slice with
    * the identical rule arithmetic.
    */
  private[graft] def filterCtesOn(src: String): String =
    s"""d AS (SELECT doc_id, $Toks AS toks FROM $src),
       b AS (SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_prepend(0, list_transform(toks,
           t -> length(t)))) AS BIGINT) AS tok_chars,
         CAST(${dHits(MarkerWords.head._2)} AS BIGINT) AS stop_hits,
         CAST(COALESCE(list_max(list_transform(toks, t ->
           len(list_filter(toks, u -> u = t)))), 0) AS BIGINT)
           AS best_run FROM d),
       r AS (SELECT doc_id, n_tokens,
         CASE WHEN n_tokens < 10 THEN 'too_short'
              WHEN n_tokens > 5000 THEN 'too_long'
              WHEN NOT (tok_chars BETWEEN n_tokens * 2
                AND n_tokens * 12) THEN 'bad_tok_len'
              WHEN stop_hits * 20 < n_tokens THEN 'low_stopword'
              WHEN best_run * 5 > n_tokens THEN 'repetitive'
              ELSE 'keep' END AS reason FROM b)"""

  private[graft] lazy val FilterCtes: String = filterCtesOn("documents")

  private def dHits(words: Seq[String]): String =
    s"len(list_filter(toks, w -> list_contains(${
      words.mkString("['", "','", "']")}, w)))"

  val oracles: Map[String, String] = {
    val langs = MarkerWords.map(_._1)
    val caseChain = langs.init.zipWithIndex.map { case (l, i) =>
      val conds = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    Map(
      "ta_filter_pipeline" ->
        s"""WITH $FilterCtes
           SELECT doc_id, n_tokens, reason, reason = 'keep' AS keep
           FROM r ORDER BY doc_id""",
      "ta_lm_score" ->
        s"""WITH d AS (SELECT doc_id, list_transform($Toks,
             w -> ${dH31("w")}) AS hs FROM documents),
           d2 AS (SELECT doc_id, hs FROM d WHERE len(hs) >= 2),
           bgr AS (SELECT doc_id, unnest(list_transform(
               range(0, len(hs) - 1),
               i -> {'pos': i, 'h1': hs[i + 1],
                 'bg': (hs[i + 1] * 131 + hs[i + 2]) % $P})) AS x
             FROM d2),
           bg AS (SELECT doc_id, x.pos AS pos, x.h1 AS h1, x.bg AS bg
             FROM bgr),
           tok AS (SELECT unnest(hs) AS h FROM d2),
           uni AS (SELECT h, COUNT(*) AS c1 FROM tok GROUP BY h),
           vq AS (SELECT COUNT(DISTINCT h) AS v FROM tok),
           c2t AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
           sc AS (SELECT doc_id, pos,
             CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE) AS p
             FROM bg JOIN c2t USING (bg) JOIN uni ON uni.h = bg.h1, vq)
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             list_sum(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_sort(list({'pos': pos, 'p': p})),
                 x -> x.p))) / CAST(COUNT(*) AS DOUBLE) AS lm_score
           FROM sc GROUP BY doc_id ORDER BY doc_id""",
      "ta_lang_ngram" ->
        s"""WITH d AS (SELECT doc_id, lower(text) AS lt FROM documents),
           b AS (SELECT doc_id, list_distinct(list_transform(
             range(1, length(lt)),
             i -> substr(lt, CAST(i AS INTEGER), 2))) AS bg FROM d),
           s AS (SELECT doc_id, ${NgramProfiles.map { case (l, prof) =>
              s"CAST(len(list_filter(bg, x -> list_contains(${
                prof.mkString("['", "','", "']")}, x))) AS BIGINT) AS s_$l"
            }.mkString(", ")} FROM b)
           SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
             CASE $caseChain ELSE '${langs.last}' END AS pred_lang
           FROM s ORDER BY doc_id""",
      "ta_repetition" ->
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           h AS (SELECT doc_id, toks, list_transform(toks,
             w -> ${dH31("w")}) AS hs FROM d WHERE len(toks) >= 3),
           g AS (SELECT doc_id, toks,
             list_transform(range(1, len(hs) - 1),
               i -> ((hs[i]*131 + hs[i+1]) % $P * 131 + hs[i+2]) % $P)
               AS sh FROM h)
           SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
               AS dup_token_frac,
             1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)
               AS dup_3gram_frac,
             CAST(list_max(list_transform(toks, t ->
               len(list_filter(toks, u -> u = t)))) AS DOUBLE)
               / len(toks) AS top_token_frac
           FROM g ORDER BY doc_id""",
      "ta_tfidf_sim" ->
        s"""WITH d AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
           n AS (SELECT COUNT(*) AS nd FROM d),
           tf AS (SELECT doc_id, unnest(toks) AS term FROM d),
           tfc AS (SELECT doc_id, term, COUNT(*) AS tf
             FROM tf GROUP BY 1, 2),
           dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
           w AS (SELECT doc_id, term,
             CAST(tf * CAST(floor(1000.0 * CAST(nd + 1 AS DOUBLE)
               / (df + 1)) AS BIGINT) AS BIGINT) AS w
             FROM tfc JOIN dfc USING (term) CROSS JOIN n
             WHERE df * $MaxDfDivisor <= nd),
           p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.w * b.w) AS BIGINT) AS dot
             FROM w a JOIN w b
             ON a.term = b.term AND a.doc_id < b.doc_id
             WHERE a.doc_id < 20
             GROUP BY 1, 2),
           rk AS (SELECT doc_a, doc_b, dot,
             CAST(row_number() OVER (PARTITION BY doc_a
               ORDER BY dot DESC, doc_b) AS BIGINT) AS rank
             FROM p)
           SELECT doc_a, doc_b, rank, dot FROM rk
           WHERE rank <= 3 ORDER BY doc_a, rank""",
      "ta_winnow" ->
        s"""WITH d AS (SELECT doc_id, list_transform($Toks,
             w -> ${dH31("w")}) AS hs FROM documents),
           sq AS (SELECT doc_id, list_transform(range(1, len(hs) - 1),
             i -> ((hs[i]*131 + hs[i+1]) % $P * 131 + hs[i+2]) % $P) AS sh
             FROM d WHERE len(hs) >= 3),
           fp AS (SELECT doc_id, CASE WHEN len(sh) >= $WinnowW THEN
               list_transform(range(1, len(sh) - ${WinnowW - 2}),
                 i -> list_min(sh[i:i+${WinnowW - 1}]))
             ELSE [list_min(sh)] END AS fps FROM sq)
           SELECT doc_id,
             CAST(len(list_distinct(fps)) AS BIGINT) AS n_fps,
             list_min(fps) AS min_fp,
             list_reduce(list_prepend(CAST(0 AS BIGINT), fps),
               (acc, h) -> (acc*131 + h) % $P) AS fp_hash
           FROM fp ORDER BY doc_id""",
      "ta_array_funcs" ->
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           t AS (SELECT doc_id, toks, list_sort(toks) AS sorted FROM d)
           SELECT doc_id, sorted[1] AS first_tok, sorted[-1] AS last_tok,
             list_contains(toks, 'the') AS has_the,
             array_to_string(sorted[1:3], ',') AS first3,
             CAST(len(toks) AS BIGINT) AS n
           FROM t ORDER BY doc_id""",
      "ta_lang_id" ->
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           s AS (SELECT doc_id, ${MarkerWords.map { case (l, ws) =>
              s"${dHits(ws)} AS s_$l" }.mkString(", ")} FROM d)
           SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
             CASE $caseChain ELSE '${langs.last}' END AS pred_lang
           FROM s ORDER BY doc_id""",
      "ta_quality" ->
        s"""WITH d AS (SELECT doc_id, text, $Toks AS toks FROM documents),
           b AS (SELECT doc_id,
             CAST(length(text) AS BIGINT) AS text_len,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_prepend(0, list_transform(toks,
               t -> length(t)))) AS BIGINT) AS tok_chars,
             ${dHits(MarkerWords.head._2)} AS stop_hits FROM d)
           SELECT doc_id, text_len, n_tokens, tok_chars,
             CAST(tok_chars AS DOUBLE) / nullif(n_tokens, 0) AS mean_tok_len,
             CAST(tok_chars AS DOUBLE) / nullif(text_len, 0) AS alpha_ratio,
             CAST(stop_hits AS DOUBLE) / nullif(n_tokens, 0) AS stop_ratio,
             (n_tokens BETWEEN 5 AND 1000 AND
              tok_chars BETWEEN n_tokens * 2 AND n_tokens * 12) AS quality_ok
           FROM b ORDER BY doc_id""",
      "ta_token_count" ->
        s"""SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT)
             AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text),
             '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_pieces,
           CAST(len(list_distinct($Toks)) AS BIGINT) AS distinct_tokens
           FROM documents ORDER BY doc_id""",
      "ta_fingerprint" ->
        s"""WITH d AS (SELECT doc_id,
             list_transform($Toks, w -> ${dH31("w")}) AS hs FROM documents),
           sh AS (SELECT doc_id, hs,
             CASE WHEN len(hs) >= 3 THEN list_distinct(
               list_transform(range(1, len(hs) - 1), i ->
                 ((hs[i]*131 + hs[i+1]) % $P * 131 + hs[i+2]) % $P))
             ELSE [] END AS shingles FROM d)
           SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
               (acc, h) -> (acc*131 + h) % $P) AS fp,
             COALESCE(list_min(shingles), -1) AS min_shingle
           FROM sh ORDER BY doc_id""",
      "ta_tfidf" ->
        """WITH d AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
           t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
             unnest(toks) AS term FROM d),
           tfc AS (SELECT doc_id, n_toks, term, COUNT(*) AS tf
             FROM t GROUP BY 1, 2, 3),
           dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
           n AS (SELECT COUNT(*) AS nd FROM d),
           sc AS (SELECT doc_id, term,
             (CAST(tf AS DOUBLE) / n_toks) *
               (CAST(nd + 1 AS DOUBLE) / (df + 1)) AS score
             FROM tfc JOIN dfc USING (term) CROSS JOIN n),
           rk AS (SELECT doc_id, term, score,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS BIGINT) AS rank FROM sc)
           SELECT doc_id, term, rank, score FROM rk
           WHERE rank <= 3 ORDER BY doc_id, rank""",
      "ta_bigrams" ->
        """WITH d AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
           b AS (SELECT unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])
             ELSE [] END) AS bigram FROM d)
           SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY bigram
           ORDER BY cnt DESC, bigram LIMIT 20""",
      "ta_scrub" ->
        s"""WITH d AS (SELECT doc_id, text, $Toks AS toks FROM documents),
           c AS (SELECT doc_id, text, toks,
             list_filter(toks, t -> NOT list_contains(${
               Stopwords.mkString("['", "','", "']")}, t)) AS clean
             FROM d)
           SELECT doc_id,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_email,
             CAST(len(regexp_extract_all(text, 'https?://[^ ]+'))
               AS BIGINT) AS n_url,
             CAST(len(toks) - len(clean) AS BIGINT) AS n_stop,
             CAST(len(clean) AS BIGINT) AS n_clean,
             md5(array_to_string(clean, ' ')) AS clean_md5
           FROM c ORDER BY doc_id""",
      // Identical five-op float tree as the operator (see pmi's
      // Scaladoc); SUMs of BIGINT go HUGEINT in DuckDB, so the corpus
      // totals are cast back before entering the tree.
      "ta_pmi" ->
        s"""WITH d AS (SELECT $Toks AS toks FROM documents),
           u AS (SELECT unnest(toks) AS tkn FROM d),
           uc AS (SELECT tkn, COUNT(*) AS c FROM u GROUP BY 1),
           nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uc),
           p AS (SELECT unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                 i -> {'a': toks[i], 'b': toks[i+1]})
             ELSE [] END) AS pr FROM d),
           pc AS (SELECT pr.a AS a, pr.b AS b, COUNT(*) AS cab
             FROM p GROUP BY 1, 2),
           nb AS (SELECT CAST(SUM(cab) AS BIGINT) AS nb FROM pc)
           SELECT pc.a || ' ' || pc.b AS bigram,
             CAST(cab AS BIGINT) AS pair_cnt,
             ((CAST(cab AS DOUBLE) * CAST(nu AS DOUBLE)) /
               (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))) *
               (CAST(nu AS DOUBLE) / CAST(nb AS DOUBLE)) AS lift
           FROM pc JOIN uc ca ON pc.a = ca.tkn
             JOIN uc cb ON pc.b = cb.tkn, nu, nb
           WHERE cab >= $PmiMinCount
           ORDER BY lift DESC, bigram LIMIT $PmiTopK""",
      "ta_bm25" -> {
        val inList = Bm25Terms.mkString("('", "', '", "')")
        val pivots = Bm25Terms.map(t =>
          s"COALESCE(MAX(CASE WHEN term = '$t' THEN c END), 0.0) AS c_$t")
          .mkString(",\n             ")
        // Left-to-right sum, same tree as the Scala reduce.
        val scoreExpr = Bm25Terms.map(t => s"c_$t").reduce((a, b) => s"($a + $b)")
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           st AS (SELECT COUNT(*) AS nd,
             SUM(CAST(len(toks) AS BIGINT)) AS sl FROM d),
           t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
             unnest(toks) AS term FROM d),
           tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM t
             WHERE term IN $inList GROUP BY 1, 2, 3),
           dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
           sc AS (SELECT doc_id, term,
             ((CAST(nd - df AS DOUBLE) + 0.5) /
               (CAST(df AS DOUBLE) + 0.5)) *
               (CAST(tf AS DOUBLE) * 2.2) /
               (CAST(tf AS DOUBLE) + 1.2 *
                 (0.25 + 0.75 * (CAST(dl * nd AS DOUBLE) / sl))) AS c
             FROM tf JOIN dft USING (term), st),
           a AS (SELECT doc_id,
             $pivots
             FROM sc GROUP BY doc_id)
           SELECT doc_id, $scoreExpr AS score FROM a
           ORDER BY score DESC, doc_id LIMIT $Bm25TopK"""
      },
    )
  }
}
