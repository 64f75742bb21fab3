package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The video fingerprint near-dup tier (round 11): the properties the
  * oracle row can't pin — MP4 wire-format roundtrip through the real
  * box walk, the majority fold's order-invariance and damping, the
  * brightness-twin ball bound, blocking completeness through the
  * shared [[HammingBlock]] machinery, and planted-twin recovery at
  * the fixture.
  */
class VideoFpSpec extends SparkSpec {
  import spark.implicits._

  test("encodeMp4 → decodeMdat roundtrips the payload exactly " +
    "(incl. empty and frame-boundary sizes)") {
    val cases = Seq(
      Array.empty[Byte],
      Array.tabulate(1)(_.toByte),
      Array.tabulate(VideoFp.FrameBytes)(i => (i * 7 % 256).toByte),
      Array.tabulate(VideoFp.FrameBytes * 3 + 17)(i =>
        ((i * 131 + 9) % 256).toByte))
    cases.foreach { p =>
      assert(AvCodec.decodeMdat(VideoFp.encodeMp4(p, 600L)).toSeq ===
        p.toSeq)
    }
  }

  test("fingerprint: shorter than one frame is unhashable; the " +
    "majority fold is invariant under frame reordering") {
    assert(VideoFp.fingerprintOf(Array.fill(VideoFp.FrameBytes - 1)(
      1.toByte)).isEmpty)
    val fa = Array.tabulate(VideoFp.FrameBytes)(i =>
      ((i * 37 + 3) % 256).toByte)
    val fb = Array.tabulate(VideoFp.FrameBytes)(i =>
      ((i * 91 + 55) % 256).toByte)
    // FrameStep = 2 samples frames 0 and 2 of a 3-frame video; the
    // same two frames in either order must fold identically.
    val v1 = fa ++ fb ++ fb
    val v2 = fb ++ fa ++ fa
    assert(VideoFp.fingerprintOf(v1) === VideoFp.fingerprintOf(v2),
      "majority fold must be order-invariant over the sampled set")
  }

  test("the brightness-shift twin stays inside the MaxHam ball; a " +
    "structurally different video leaves it") {
    val streams = Seq(
      Array.tabulate(VideoFp.FrameBytes * 5)(i =>
        ((i * 131 + 7) % 240).toByte),
      Array.tabulate(VideoFp.FrameBytes * 2 + 11)(i =>
        ((i * 53 + 19) % 240).toByte),
      Array.tabulate(VideoFp.FrameBytes * 9)(i =>
        (math.abs(i * 1103515245 + 12345) % 240).toByte))
    streams.foreach { p =>
      val t = p.map(b => math.min(255, (b & 0xff) + VideoFp.TwinShift)
        .toByte)
      val d = java.lang.Long.bitCount(
        VideoFp.fingerprintOf(p).get ^ VideoFp.fingerprintOf(t).get)
      assert(d <= VideoFp.MaxHam,
        s"brightness twin must stay in the ball, got $d")
    }
    val p = streams.head
    val rev = VideoFp.fingerprintOf(p.reverse).get
    assert(java.lang.Long.bitCount(VideoFp.fingerprintOf(p).get ^ rev)
      > VideoFp.MaxHam, "reversed video must leave the ball")
  }

  test("HammingBlock pairs over vid frames ≡ brute force, column " +
    "prefix from the id column") {
    val h0 = 0x3FEDCBA987654321L & ((1L << 63) - 1)
    val rows = Seq(1L -> h0, 2L -> (h0 ^ 0x101L), // d 2
      3L -> (h0 ^ ((1L << 5) | (1L << 20) | (1L << 35) | (1L << 50))),
      4L -> (~h0 & ((1L << 63) - 1)))
    val got = HammingBlock.pairs(rows.toDF("vid_id", "ph"), "vid_id",
      VideoFp.Chunks, VideoFp.ChunkBits, VideoFp.MaxHam)
    assert(got.columns.toSeq === Seq("vid_a", "vid_b", "hamming"))
    val blocked = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= VideoFp.MaxHam
    } yield (a, b, d.toLong)).toSet
    assert(blocked === brute && brute.nonEmpty)
  }

  test("fixture: every plantable re-encode twin is recovered") {
    val pairs = VideoFp.videoDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Plantable = even doc_id AND at least one full frame (shorter
    // videos are unhashable by convention, on both sides).
    val evens = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id") % 2 === 0 &&
        length(encode(col("text"), "UTF-8")) >= VideoFp.FrameBytes)
      .select("doc_id").collect().map(_.getLong(0))
    assert(evens.nonEmpty)
    val missing = evens.filterNot(d => pairs.contains((2 * d, 2 * d + 1)))
    assert(missing.isEmpty,
      s"planted twins not recovered: ${missing.take(5).toSeq}")
  }
}
