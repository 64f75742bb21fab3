package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ta_chunk: the overlap-window chunker must tile every document
  * exactly — right chunk count, right boundaries, full coverage with
  * C−S overlap — checked against a direct sliding-window recompute.
  */
class ChunkSpec extends SparkSpec {

  private val C = CorpusOps.ChunkLen
  private val S = CorpusOps.ChunkStride

  test("chunks == direct sliding-window recompute, every document") {
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val got = CorpusOps.chunk(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3))))
      .toMap
    val expected = docs.flatMap { case (id, toks) =>
      val n = toks.length
      val nChunks = if (n <= C) 1 else ((n - C + S - 1) / S) + 1
      (0 until nChunks).map { i =>
        val piece = toks.slice(i * S, i * S + C)
        ((id, i.toLong), (piece.length.toLong, piece.mkString(" ")))
      }
    }
    assert(got === expected)
  }

  test("interior chunks are exactly C tokens with C-S token overlap") {
    val rows = CorpusOps.chunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    rows.groupBy(_._1).values.foreach { ch =>
      val sorted = ch.sortBy(_._2)
      // every chunk but the last is full-size
      sorted.dropRight(1).foreach(c => assert(c._3 === C.toLong))
      // consecutive chunks overlap in exactly C-S tokens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val at = a._4.split(" ")
          val bt = b._4.split(" ")
          assert(at.drop(S).sameElements(bt.take(C - S)))
        case _ =>
      }
    }
  }

  test("chunker plans no shuffle before the presentation sort") {
    val plan = CorpusOps.chunk(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty)
  }
}
