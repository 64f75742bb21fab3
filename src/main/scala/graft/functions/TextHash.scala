package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic text hashing primitives.
  *
  * Every dedup / fingerprint / similarity operator in this engine is
  * oracle-checked against DuckDB, so the hash arithmetic must produce
  * bit-identical BIGINTs in both engines. The one string-hash both
  * engines share exactly is MD5; we derive a 60-bit integer from its
  * hex prefix:
  *
  *   Spark :  CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)
  *   DuckDB:  CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)
  *
  * and fold everything else (shingles, MinHash permutations, band
  * keys, rolling fingerprints) with explicit modular arithmetic that
  * stays below 2^62 so neither engine overflows (DuckDB raises on
  * BIGINT overflow; Spark wraps — keeping the math small makes the
  * question moot).
  *
  * All helpers are pure `Column` expressions (higher-order functions
  * over arrays) — whole-stage-codegen'd, no UDFs, no closures — so
  * they vectorize and survive a 100 TB scan: per-row cost is
  * O(tokens × K) arithmetic, no shuffle implied.
  *
  * Reference lineage: the reference engine's only hash is djb2 over
  * C strings used for shuffle partitioning (`src/mapreduce.c:41-50`);
  * content hashing for dedup is a north-star extension (SURVEY.md §2,
  * [ext] rows).
  */
object TextHash {

  /** Modulus for all derived hashes: 2^31 - 1 (Mersenne prime). */
  val Prime = 2147483647L

  /** Tokenize to lowercase alphanumeric runs — the shared token
    * definition for all text operators. DuckDB mirror:
    * `regexp_extract_all(lower(text), '[a-z0-9]+')`.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** 60-bit md5-prefix hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 31-bit word hash: hash60 mod Prime (fits MinHash arithmetic). */
  def hash31(c: Column): Column = hash60(c) % Prime

  /** Array of 31-bit hashes for an array-of-tokens column. */
  def tokenHashes(toks: Column): Column =
    transform(toks, w => hash31(w))

  /** Positional (non-distinct) 3-token shingle hashes — the ordered
    * rolling k-gram sequence winnowing needs. Polynomial combine mod
    * Prime; fewer than 3 tokens yields an empty array.
    */
  def shingles3Seq(hs: Column): Column =
    when(size(hs) >= 3,
      transform(sequence(lit(0), size(hs) - 3), i =>
        (((element_at(hs, i + 1) * 131 + element_at(hs, i + 2)) % Prime)
          * 131 + element_at(hs, i + 3)) % Prime))
      .otherwise(array().cast("array<bigint>"))

  /** Distinct 3-token shingle hashes from an array of 31-bit token
    * hashes (set semantics — MinHash/Jaccard input). DuckDB mirror
    * uses `list_transform(range(1, len(h)-1), i -> ...)` with the
    * same constants.
    */
  def shingles3(hs: Column): Column =
    when(size(hs) >= 3,
      array_distinct(transform(sequence(lit(0), size(hs) - 3), i =>
        (((element_at(hs, i + 1) * 131 + element_at(hs, i + 2)) % Prime)
          * 131 + element_at(hs, i + 3)) % Prime)))
      .otherwise(array().cast("array<bigint>"))

  /** Winnowing (local-minimum) fingerprints over the positional
    * shingle sequence: one fingerprint per window of `w` consecutive
    * shingle hashes — the guarantee is that any match of length
    * ≥ w+k-1 tokens between two documents shares a fingerprint
    * (Schleimer, Wilkerson, Aiken: "Winnowing: Local Algorithms for
    * Document Fingerprinting", SIGMOD 2003). Documents shorter than
    * one window contribute their global minimum.
    */
  def winnowFingerprints(shSeq: Column, w: Int): Column =
    when(size(shSeq) >= w,
      transform(sequence(lit(1), size(shSeq) - (w - 1)), i =>
        array_min(slice(shSeq, i, lit(w)))))
      .otherwise(array(array_min(shSeq)))

  /** MinHash signature (K values) over a distinct-shingle array.
    * Permutation i is the universal hash
    * `h_i(x) = ((37 + 101·i)·x + 17 + 131·i) mod Prime` — coefficients
    * are fixed so the DuckDB oracle can restate them literally.
    * Empty shingle arrays produce an all-`Prime` signature (sentinel
    * larger than any real hash) rather than nulls.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      coalesce(
        array_min(transform(shingles, s =>
          ((lit(37) + lit(101) * i) * s + lit(17) + lit(131) * i) % Prime)),
        lit(Prime)))

  /** LSH band keys: split a K-signature into `bands` bands of
    * K/bands rows each and fold each band polynomially mod Prime.
    * Returns an array of `bands` BIGINT band hashes; two documents
    * are LSH candidates iff they agree on at least one (bandIndex,
    * bandHash) pair.
    */
  def bandKeys(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      (0 until rows).foldLeft(lit(0L): Column)((acc, r) =>
        (acc * 131 + element_at(sig, b * rows + r + 1)) % Prime))
  }

  /** Order-sensitive rolling fingerprint of a token-hash array:
    * left fold `acc = (acc·131 + h) mod Prime`, seed 0. DuckDB
    * mirror: `list_reduce(list_prepend(0, hs), (acc,h) -> ...)`.
    */
  def rollingFingerprint(hs: Column): Column =
    aggregate(hs, lit(0L), (acc, h) => (acc * 131 + h) % Prime)

  /** 60-bit SimHash over a token-hash-60 array (term-frequency
    * weighted): bit b of the result is 1 iff more tokens have bit b
    * set than clear. Folded MSB-first so the result is a nonnegative
    * BIGINT below 2^60.
    */
  def simhash60(hs60: Column): Column = {
    val n = size(hs60)
    aggregate(sequence(lit(59), lit(0), lit(-1)), lit(0L), (acc, b) => {
      val ones = aggregate(hs60, lit(0L),
        (c, h) => c + call_function("shiftright", h, b.cast("int")) % 2)
      acc * 2 + when(ones * 2 > n, 1L).otherwise(0L)
    })
  }

  /** The 16-bit chunks of a 60-bit simhash (4 chunks; top chunk has
    * 12 bits). Two hashes within Hamming distance 3 agree on at least
    * one chunk (pigeonhole) — the blocking key for simhash dedup.
    */
  def simhashChunks(sh: Column): Column =
    transform(sequence(lit(0), lit(3)), j =>
      call_function("shiftright", sh, (j * 16).cast("int")) % 65536)
}
