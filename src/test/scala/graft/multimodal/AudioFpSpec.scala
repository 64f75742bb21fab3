package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The audio fingerprint near-dup tier (round 10): the properties the
  * oracle row can't pin — WAV wire-format roundtrip exactness, the
  * scale-invariance theorem of the sign-of-difference bits, blocking
  * completeness through the shared [[HammingBlock]] machinery, and
  * planted-twin recovery at the fixture.
  */
class AudioFpSpec extends SparkSpec {
  import spark.implicits._

  test("encodeWavS16 → decodePcm roundtrips samples exactly " +
    "(incl. negatives, extremes, empty)") {
    val cases = Seq(
      Array.empty[Int],
      Array(0),
      Array(-8192, 8128, 0, -1, 1, -16384, 16256),
      Array.tabulate(513)(i => ((i * 37) % 256 - 128) * 64))
    cases.foreach { s =>
      val pcm = AvCodec.decodePcm(AudioFp.encodeWavS16(s))
      assert(pcm.bits === 16L && pcm.channels === 1L &&
        pcm.sampleRate === 8000L)
      assert(pcm.samples.toSeq === s.toSeq)
    }
  }

  test("fingerprint is EXACTLY invariant under volume scaling and " +
    "moved by structural change") {
    val s = Array.tabulate(400)(i => ((i * 31) % 250 - 125) * 64)
    val fp = AudioFp.fingerprintOf(s)
    assert(AudioFp.fingerprintOf(s.map(_ * 2)) === fp,
      "×2 volume must not move a single bit")
    assert(AudioFp.fingerprintOf(s.map(_ * 3)) === fp,
      "×3 volume must not move a single bit")
    val reversed = AudioFp.fingerprintOf(s.reverse)
    assert(java.lang.Long.bitCount(fp ^ reversed) > AudioFp.MaxHam,
      "time-reversed audio must leave the ball")
  }

  test("the remaster twin (×2 + muted intro) stays inside the " +
    "MaxHam ball: only bits whose stencils touch cells 0..3 can move") {
    // Crafted and pseudo-random streams, several lengths incl. n<Cells.
    val streams = Seq(
      Array.tabulate(879)(i => ((i * 131 + 7) % 256 - 128) * 64),
      Array.tabulate(88)(i => ((i * 53) % 256 - 128) * 64),
      Array.tabulate(40)(i => ((i * 97) % 256 - 128) * 64),
      Array.tabulate(2000)(i => (math.abs(i * 1103515245 + 12345) %
        16257 - 8128)))
    streams.foreach { s =>
      val d = java.lang.Long.bitCount(
        AudioFp.fingerprintOf(s) ^
          AudioFp.fingerprintOf(AudioFp.remaster(s)))
      assert(d <= 3,
        s"muted-intro twin must flip <= 3 bits (stencil bound), got $d")
    }
  }

  test("HammingBlock pairs over aud frames ≡ brute force, and the " +
    "column prefix derives from the id column") {
    val h0 = 0x7EDCBA987654321L
    val rows = Seq(1L -> h0, 2L -> (h0 ^ 0x11L), // d 2
      3L -> (h0 ^ ((1L << 10) | (1L << 25) | (1L << 40) | (1L << 55))),
      4L -> (~h0 & ((1L << 63) - 1)))
    val df = rows.toDF("aud_id", "ph")
    val got = HammingBlock.pairs(df, "aud_id", AudioFp.Chunks,
        AudioFp.ChunkBits, AudioFp.MaxHam)
    assert(got.columns.toSeq === Seq("aud_a", "aud_b", "hamming"))
    val blocked = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= AudioFp.MaxHam
    } yield (a, b, d.toLong)).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty)
  }

  test("fixture: every planted remaster twin is recovered") {
    val pairs = AudioFp.audioDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val evens = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id") % 2 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(evens.nonEmpty)
    val missing = evens.filterNot(d => pairs.contains((2 * d, 2 * d + 1)))
    assert(missing.isEmpty,
      s"planted twins not recovered: ${missing.take(5).toSeq}")
  }
}
