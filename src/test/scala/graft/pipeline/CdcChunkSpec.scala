package graft.pipeline

import graft.SparkSpec

/** Gates for `ta_cdc_chunk` beyond the DuckDB hash: the chunks tile
  * each document exactly (no gap, no overlap), and the defining CDC
  * property holds — an insertion near the front of a document
  * disturbs only the chunk it lands in, leaving every later chunk's
  * content (and therefore its dedup hash) unchanged. A fixed-stride
  * chunker fails the second test by construction.
  */
class CdcChunkSpec extends SparkSpec {

  /** Pure-Scala replay of the declared chunker (md5-token hashes,
    * 4-token polynomial window mod Prime, cut at ≡ 0 mod CdcMask).
    */
  private def hash31(w: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) %
      graft.functions.TextHash.Prime
  }

  private def chunksOf(toks: IndexedSeq[String]): Seq[Seq[String]] = {
    val p = graft.functions.TextHash.Prime
    val hs = toks.map(hash31)
    val n = toks.length
    val cuts = (CorpusOps.CdcWindow to n - 1).filter { i =>
      val h = ((((hs(i - 4) * 131 + hs(i - 3)) % p)
        * 131 + hs(i - 2)) % p * 131 + hs(i - 1)) % p // 0-based
      h % CorpusOps.CdcMask == 0
    }
    val starts = 1 +: cuts.map(_ + 1)
    val ends = cuts :+ n
    starts.zip(ends).map { case (s0, e0) => toks.slice(s0 - 1, e0) }
  }

  test("cdc chunks tile each fixture document exactly and match the " +
    "pure-Scala replay") {
    val rows = CorpusOps.cdcChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val texts = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val toks = texts(doc).split(" ", -1).toIndexedSeq
      val sorted = rs.sortBy(_._2)
      // tiling: starts chain, last end = n
      var expectStart = 1L
      sorted.foreach { case (_, _, st, nt, _) =>
        assert(st === expectStart); expectStart = st + nt
      }
      assert(expectStart - 1 === toks.length.toLong)
      // content: md5 of each replayed chunk matches
      val replay = chunksOf(toks)
      assert(replay.length === sorted.length)
      sorted.zip(replay).foreach { case ((_, _, _, _, md5), chunk) =>
        val want = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(md5 === want)
      }
    }
  }

  test("content-defined boundaries resynchronize after an edit: " +
    "all chunks past the edited one keep their hashes") {
    val base = (0 until 600).map(i => s"w${i * 7919 % 997}")
    val edited = (base.take(5) :+ "inserted") ++ base.drop(5)
    val a = chunksOf(base)
    val b = chunksOf(edited)
    assert(a.length >= 4, s"fixture too small: ${a.length} chunks")
    // common suffix: every chunk after the one containing the edit
    // position must survive verbatim
    val suffix = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
      .length
    assert(suffix >= a.length - 2,
      s"only $suffix of ${a.length} chunks survived a 1-token insert " +
        "— boundaries did not resynchronize")
    // and a FIXED-STRIDE chunker over the same edit keeps (almost)
    // nothing: every 32-token window after the insert shifts by one
    val fixedA = base.grouped(32).toSeq
    val fixedB = edited.grouped(32).toSeq
    val fixedSuffix = fixedA.reverse.zip(fixedB.reverse)
      .takeWhile { case (x, y) => x == y }.length
    assert(fixedSuffix <= 1, "fixed-stride unexpectedly stable")
  }
}
