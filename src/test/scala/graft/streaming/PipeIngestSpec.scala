package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming corpus build's contracts the SQL oracle cannot
  * express, driven over a CRAFTED corpus through the public
  * build/ingest/publish APIs (the gate fixture cannot produce
  * unseen-byte pretokens or a controlled dup topology):
  *  - the store dup check (a streamed copy of a history keep is
  *    dropped), the greedy same-batch rule (smaller id survives),
  *    and the cross-batch rule (a copy of an EARLIER batch's
  *    survivor is dropped);
  *  - the trained NB gate drops a spam-shaped streamed doc it never
  *    saw, from the history labels alone;
  *  - a streamed doc with characters the history snapshot NEVER saw
  *    (astral-plane emoji) encodes through the stored tokenizer's
  *    merge replay with every pretoken segmented (zero OOV);
  *  - publish is exactly-once: the sealed delta is reported once,
  *    a second publish appends nothing, and the read set is
  *    identical before and after sealing.
  */
class PipeIngestSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val histRows = Seq(
    7L -> ("the alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron"),
    17L -> ("the one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen"),
    // rule-labelled DROPS (repetitive) — the NB gate's drop class.
    27L -> "spam spam spam spam spam spam spam spam spam spam",
    37L -> "junk junk junk junk junk junk junk junk junk junk junk")

  private val doc22 = "the red green blue cyan magenta yellow black " +
    "white orange purple pink brown silver gold bronze"
  private val doc32 = "the wind rain snow cloud storm thunder light " +
    "dark dawn dusk noon night morning evening sky"
  private val emojiText = "the quick brown fox jumps over lazy dog " +
    "near riverbank today 😀🚀 tokens flow"

  private val wave0 = Seq(
    21L -> histRows.head._2, // exact copy of history keep -> drop
    22L -> doc22,            // unique -> survives
    23L -> doc22,            // same-batch copy, larger id -> drop
    24L -> emojiText,        // unseen bytes -> survives, replay path
    25L -> ("spam spam spam spam spam spam spam spam spam spam spam " +
      "spam")) // NB gate predicts drop (never seen, drop-class words)
  private val wave1 = Seq(
    31L -> doc22,            // copy of an EARLIER batch's survivor
    32L -> doc32)            // unique -> survives

  private def survivorIds(s: DataFrame): Set[Long] =
    s.select("doc_id").collect().map(_.getLong(0)).toSet

  test("streamed pipeline: trained-gate drop, greedy dedup across " +
    "store/batch/earlier-batch, zero-OOV replay encode, " +
    "exactly-once publish") {
    val path = Files.createTempDirectory("graft_pipe_spec").toString
    PipeIngest.build(spark, docsDf(histRows), path)

    val src = s"$path/src"
    val ckpt = s"$path/ckpt"
    def stream = spark.readStream
      .schema(docsDf(wave0).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)

    docsDf(wave0).coalesce(1).write.mode("append").parquet(src)
    PipeIngest.ingest(spark, path, stream, ckpt)
    val after0 = PipeIngest.docsAll(spark, path).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(after0.keySet === Set(22L, 24L),
      "wave 0: unique + emoji survive; store-dup, batch-dup and " +
        s"spam are dropped (got ${after0.keySet})")

    // The emoji doc encoded through the STORED tokenizer: every
    // pretoken segmented (>= 1 piece each — OOV would lose pieces
    // to the inner dictionary join), non-empty content hash.
    val em = after0(24L)
    val np = em.getAs[Long]("n_pretokens")
    val npc = em.getAs[Long]("n_pieces")
    assert(np > 0 && npc >= np,
      s"emoji doc: $npc pieces for $np pretokens — a pretoken went " +
        "unsegmented (OOV must be impossible)")
    assert(em.getAs[String]("pieces_md5") !=
      "d41d8cd98f00b204e9800998ecf8427e")

    docsDf(wave1).coalesce(1).write.mode("append").parquet(src)
    PipeIngest.ingest(spark, path, stream, ckpt)
    val after1 = survivorIds(PipeIngest.docsAll(spark, path))
    assert(after1 === Set(22L, 24L, 32L),
      s"wave 1: copy of wave-0 survivor must drop (got $after1)")

    // Exactly-once publish: delta reported once, idempotent rerun,
    // identical read set sealed vs staged.
    val before = PipeIngest.docsAll(spark, path)
      .collect().map(_.toSeq).toSet
    assert(PipeIngest.publish(spark, path) === 3L)
    assert(PipeIngest.publish(spark, path) === 0L)
    val sealedRows = PipeIngest.docsAll(spark, path)
      .collect().map(_.toSeq).toSet
    assert(sealedRows === before)
    // Staging roots are gone; the sealed store carries the rows.
    assert(!new java.io.File(s"$path/staged_docs").exists())
    assert(new java.io.File(s"$path/docs").exists())

    // The sealed survivors' shingles joined keep_shingles: a THIRD
    // ingest of another copy of doc22 still dedups against the now-
    // SEALED survivor (the store grows with publishes).
    docsDf(Seq(41L -> doc22)).coalesce(1).write.mode("append")
      .parquet(src)
    PipeIngest.ingest(spark, path, stream, ckpt)
    assert(survivorIds(PipeIngest.docsAll(spark, path)) ===
      Set(22L, 24L, 32L))
  }

  test("greedy streaming dedup is a DOCUMENTED divergence from the " +
    "batch pipeline's connected-components rule: arrival order can " +
    "keep a non-minimal cluster member") {
    // Chain a ~ b ~ c (a < b < c): b streams FIRST (wave 0) and
    // survives; a and c arrive in wave 1 and both verify against the
    // earlier survivor b — greedy keeps {b}. The batch rule
    // (CorpusPipeline.dedupStage) on the same three docs keeps the
    // cluster MINIMUM {a}. Both outcomes are deterministic; the
    // divergence is the price of never re-deciding sealed docs, and
    // compaction with the batch rule is the reconciliation path.
    val base = ("the alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron").split(" ")
    val bTxt = base.mkString(" ")
    val aTxt = (base.dropRight(1) :+ "rho").mkString(" ")    // last≠
    val cTxt = ("sigma" +: base.drop(1)).mkString(" ")       // first≠
    val path = Files.createTempDirectory("graft_pipe_greedy").toString
    // History: unrelated keep + drop docs so the NB gate has both
    // classes and none of a/b/c matches the store.
    val hist = Seq(
      17L -> ("the one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen"),
      27L -> "spam spam spam spam spam spam spam spam spam spam")
    PipeIngest.build(spark, docsDf(hist), path)
    val src = s"$path/src"
    def stream = spark.readStream
      .schema(docsDf(Nil).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    docsDf(Seq(102L -> bTxt)).coalesce(1).write.mode("append")
      .parquet(src)
    PipeIngest.ingest(spark, path, stream, s"$path/ckpt")
    docsDf(Seq(101L -> aTxt, 103L -> cTxt)).coalesce(1).write
      .mode("append").parquet(src)
    PipeIngest.ingest(spark, path, stream, s"$path/ckpt")
    assert(survivorIds(PipeIngest.docsAll(spark, path)) === Set(102L),
      "greedy: the first-arrived chain member survives")

    // The batch rule on the same cluster keeps the minimum id.
    import graft.pipeline.CorpusPipeline
    val clean = CorpusPipeline.extractStage(docsDf(Seq(
      101L -> aTxt, 102L -> bTxt, 103L -> cTxt)))(spark)
    val batchKeep = CorpusPipeline.dedupStage(clean)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKeep === Set(101L),
      "batch CC: the cluster minimum survives")

    // RECONCILIATION (VERDICT r9 item 2): an unrelated singleton
    // streams in, everything is sealed, then compact() re-decides
    // the store under the batch rule — the greedy-kept non-minimal
    // member 102 is demoted, the cluster minimum 101 admitted with
    // batch_id = -1 through the stored-tokenizer encode, and the
    // untouched singleton's sealed row is bit-identical.
    val doc104 = "the wind rain snow cloud storm thunder light " +
      "dark dawn dusk noon night morning evening sky"
    docsDf(Seq(104L -> doc104)).coalesce(1).write.mode("append")
      .parquet(src)
    PipeIngest.ingest(spark, path, stream, s"$path/ckpt")
    PipeIngest.publish(spark, path)
    val sealedRows = PipeIngest.docsAll(spark, path).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(sealedRows.keySet === Set(102L, 104L))

    val corpus = docsDf(hist ++ Seq(
      101L -> aTxt, 102L -> bTxt, 103L -> cTxt, 104L -> doc104))
    PipeIngest.compact(spark, path, corpus)
    val after = PipeIngest.docsAll(spark, path).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(after.keySet === Set(101L, 104L),
      s"compaction must demote 102 and admit 101 (got ${after.keySet})")
    assert(after(104L) === sealedRows(104L),
      "the unaffected doc's sealed row must be untouched")
    assert(after(101L)(1) === -1L,
      "admitted docs carry the compaction batch_id -1")
    assert(after(101L)(2).asInstanceOf[Long] > 0L &&
      after(101L)(3).asInstanceOf[Long] >=
        after(101L)(2).asInstanceOf[Long],
      "admitted doc must be encoded through the stored tokenizer")
    // keep_shingles carries the same reconciled keep set (history
    // keeps + compacted streamed keeps), so future batches dedup
    // against the batch-rule store.
    val ks = spark.read.parquet(s"$path/keep_shingles")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ks === Set(17L, 101L, 104L),
      s"keep_shingles must hold history keep + reconciled keeps: $ks")

    // Exactly-once: a second compact over the same corpus changes
    // nothing — no demotions, no admissions, rows identical.
    assert(PipeIngest.compact(spark, path, corpus) === 0L)
    val again = PipeIngest.docsAll(spark, path).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(again === after)
  }

  test("compact crash recovery: an interrupted swap (marker present, " +
    "live tables stale) completes at the next compact entry") {
    val path = Files.createTempDirectory("graft_pipe_cswap").toString
    PipeIngest.build(spark, docsDf(histRows), path)
    docsDf(Seq(22L -> doc22)).coalesce(1).write.mode("append")
      .parquet(s"$path/src")
    def stream = spark.readStream.schema(docsDf(Nil).schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$path/src")
    PipeIngest.ingest(spark, path, stream, s"$path/ckpt")
    PipeIngest.publish(spark, path)
    // Simulate the crash window: staged tables + marker exist, live
    // tables still the pre-compaction state. Stage = live minus 22.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$path/docs").filter(col("doc_id") =!= 22L)
      .write.parquet(s"$path/compact_tmp/docs")
    spark.read.parquet(s"$path/keep_shingles")
      .filter(col("doc_id") =!= 22L)
      .write.parquet(s"$path/compact_tmp/keep_shingles")
    fs.create(new org.apache.hadoop.fs.Path(
      s"$path/compact_tmp/_COMMITTED"), true).close()
    // The next compact first completes the staged swap, THEN
    // re-decides: 22 is gone from the live store before the batch
    // rule runs, and (being a keeplist member) is re-admitted.
    PipeIngest.compact(spark, path,
      docsDf(histRows ++ Seq(22L -> doc22)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$path/compact_tmp")), "staging root must be gone")
    val ids = PipeIngest.docsAll(spark, path).collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(22L),
      s"the swapped-out doc must be re-admitted by the re-decide: $ids")
    assert(PipeIngest.docsAll(spark, path).first()
      .getAs[Long]("batch_id") === -1L)
  }
}
