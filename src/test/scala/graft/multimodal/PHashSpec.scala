package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The perceptual-hash near-dup tier (VERDICT r9 item 3): properties
  * the oracle row can't pin — blocking completeness against brute
  * force on crafted hashes, perceptual invariance of the hash itself,
  * and planted-twin recovery at the fixture.
  */
class PHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOfBytes(bs: Array[Int]): Long = {
    val img = ImageCodec.decodePng(
      java.util.HexFormat.of().parseHex(PixelPng.encodePngBytes(bs)))
    PHash.phashOf(img.pixels, img.height)
  }

  test("pHash is DC-shift tolerant and structure sensitive") {
    val base = Array.tabulate(160)(i => 40 + (i * 7) % 120)
    val bright = base.map(b => math.min(255, b + PHash.TwinShift))
    val hBase = hashOfBytes(base)
    val hBright = hashOfBytes(bright)
    val dTwin = java.lang.Long.bitCount(hBase ^ hBright)
    assert(dTwin <= PHash.MaxHam,
      s"a uniform brightness shift must stay in the ball (d=$dTwin)")
    // Structurally different content (reversed gradient + blocks).
    val other = Array.tabulate(160)(i =>
      if ((i / PixelPng.PixW) % 2 == 0) 230 - (i % 16) * 12 else 10)
    val dOther = java.lang.Long.bitCount(hBase ^ hashOfBytes(other))
    assert(dOther > PHash.MaxHam,
      s"different structure must leave the ball (d=$dOther)")
  }

  test("chunk blocking + exact verify ≡ brute force on crafted " +
    "hashes, including ball-boundary distances") {
    // Hand-built 63-bit hashes: distances 0..5 from h0 plus far ones.
    val h0 = 0x123456789ABCDL
    val rows = Seq(
      1L -> h0,
      2L -> h0,                       // d 0
      3L -> (h0 ^ 1L),                // d 1
      4L -> (h0 ^ ((1L << 5) | (1L << 20))),           // d 2
      5L -> (h0 ^ ((1L << 3) | (1L << 19) | (1L << 35))), // d 3
      6L -> (h0 ^ ((1L << 2) | (1L << 18) | (1L << 34)
        | (1L << 50))),               // d 4 — ON the ball boundary
      8L -> (h0 ^ ((1L << 2) | (1L << 18) | (1L << 34)
        | (1L << 50) | (1L << 61))),  // d 5 — outside the ball
      7L -> (~h0 & ((1L << 63) - 1))) // far
    val df = rows.toDF("img_id", "ph")
    val blocked = PHash.pairsOf(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= PHash.MaxHam
    } yield (a, b, d.toLong)).toSet
    assert(blocked === brute,
      s"blocked=$blocked\nbrute=$brute")
    assert(brute.exists(_._3 == PHash.MaxHam) &&
      !brute.exists(p => p._1 == 1L && p._2 == 8L),
      "the crafted frame must exercise both sides of the ball boundary")
  }

  test("capImages: exact below the cap, the deterministic hash " +
    "sample above it (the embed-cosine verify-tier discipline)") {
    import graft.functions.TextHash.hash60
    val hs = (0L until 10L).map(i => (i, i * 7L)).toDF("img_id", "ph")
    // Below cap: identity.
    assert(PHash.capImages(hs, 10).count() === 10L)
    // Above cap: ids with hash60(id) % ceil(10/4)=3 == 0, exactly.
    val kept = PHash.capImages(hs, 4)
      .select("img_id").collect().map(_.getLong(0)).toSet
    val want = hs.select(col("img_id"))
      .filter(hash60(col("img_id").cast("string")) % 3 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(kept === want && kept.nonEmpty && kept.size < 10)
  }

  test("fixture: every planted twin is recovered as a near-dup pair") {
    val pairs = PHash.phashDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val evens = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id") % 2 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(evens.nonEmpty)
    val missing = evens.filterNot(d =>
      pairs.contains((2 * d, 2 * d + 1)))
    assert(missing.isEmpty,
      s"planted twins not recovered: ${missing.take(5).toSeq}")
  }
}
