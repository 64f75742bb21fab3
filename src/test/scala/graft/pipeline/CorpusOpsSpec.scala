package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {

  test("vocab: contiguous ids, non-increasing counts, tie-broken by token") {
    val rows = CorpusOps.vocab(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).toSeq === (1L to rows.length))
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    pairs.zip(pairs.tail).foreach { case ((c1, t1), (c2, t2)) =>
      assert(c1 > c2 || (c1 == c2 && t1 < t2))
    }
  }

  test("split: valid buckets, ~80/10/10, stable across runs") {
    val rows = CorpusOps.split(spark, sf).collect()
    assert(rows.map(_.getLong(1)).forall(b => b >= 0 && b < 100))
    val n = rows.length.toDouble
    val frac = rows.groupBy(_.getString(2)).view.mapValues(_.length / n)
    assert(math.abs(frac("train") - 0.8) < 0.1)
    // the assignment is a pure function of doc_id — rerun is identical
    val again = CorpusOps.split(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("pack: per-bucket token conservation and monotone pack ids") {
    val d = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long")
          .as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedTokens = d.groupBy(_._1 % CorpusOps.PackBuckets).view
      .mapValues(_.map(_._2).sum).toMap
    val rows = CorpusOps.pack(spark, sf).collect()
    val gotTokens = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    assert(gotTokens === expectedTokens)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head === 0L)
      // docs shorter than PackLen can't skip more than one pack ahead
      assert(rs.map(_.getLong(2)).forall(_ >= 1L))
    }
  }
}
