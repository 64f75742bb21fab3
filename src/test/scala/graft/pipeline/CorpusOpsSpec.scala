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

  test("vocab: top-K is TakeOrdered — no full-vocabulary window sort") {
    // The scale guarantee: selection of the K survivors must be a
    // bounded per-partition heap (TakeOrderedAndProject), and the only
    // Window in the plan must sit ABOVE the global limit (id
    // assignment over ≤K rows), never over the full distinct-token
    // aggregate.
    val plan = CorpusOps.vocab(spark, sf).queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$planStr")
    // Every Window node's subtree must contain the TakeOrdered (i.e.
    // the window consumes the limited result, not the raw aggregate).
    import org.apache.spark.sql.execution.window.WindowExec
    plan.collect { case w: WindowExec => w }.foreach { w =>
      assert(w.child.toString.contains("TakeOrderedAndProject"),
        s"Window over un-limited input:\n$planStr")
    }
  }

  test("vocabFull: ids equal the global rank, with no global window") {
    val rows = CorpusOps.vocabFull(spark, sf).collect()
    // Exact size gate: one row per distinct token, computed
    // independently of the operator's own pipeline.
    val distinctTokens = graft.Tables(spark, sf, "documents")
      .select(explode(graft.functions.TextHash.tokens(col("text")))
        .as("token"))
      .distinct().count()
    assert(rows.length.toLong === distinctTokens)
    // ids are exactly 1..V in (cnt desc, token asc) rank order —
    // the same contract a single global row_number() would give,
    // reconstructed from range partitions + offsets.
    assert(rows.map(_.getLong(2)).toSeq === (1L to rows.length))
    val expected = rows.map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq
      === expected.toSeq)
    // Scale audit: every window in the plan runs over the
    // VocabParts-row offset frame (child aggregates per pid), never
    // over the full token aggregate.
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = CorpusOps.vocabFull(spark, sf)
      .queryExecution.executedPlan
    plan.collect { case w: WindowExec => w }.foreach { w =>
      assert(w.child.toString.contains("pid"),
        s"Window not over the per-partition offsets:\n$plan")
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

  test("mixture: exact ppm law, floor source kept whole, kept ⊆ in") {
    val rows = CorpusOps.mixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val tmin = rows.map(_.getLong(2)).min
    rows.foreach { r =>
      val (nIn, tokIn, ppm, nKept, tokKept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      // the integer rate law, recomputed independently
      assert(ppm === CorpusOps.MixPpm * tmin / tokIn)
      assert(nKept <= nIn && tokKept <= tokIn)
      // the smallest source draws at ppm = 10^6: every draw passes
      if (tokIn == tmin) {
        assert(ppm === CorpusOps.MixPpm)
        assert(nKept === nIn && tokKept === tokIn)
      }
    }
    // pure function of the corpus — rerun is identical
    val again = CorpusOps.mixture(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("lineDedup: matches sequential replay and actually drops " +
      "recurring segments") {
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val segsOf = (text: String) =>
      text.split(' ').grouped(CorpusOps.SegLen).map(_.mkString(" ")).toSeq
    val docCount = docs.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.length }
    val expected = docs.map { case (id, t) =>
      val segs = segsOf(t)
      val kept = segs.filter(docCount(_) < CorpusOps.LineDedupMinDocs)
      (id, kept.size.toLong, (segs.size - kept.size).toLong,
        kept.mkString(" "))
    }.toSet
    val got = CorpusOps.lineDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === expected)
    assert(got.exists(_._3 > 0L), "fixture must exercise the drop path")
    assert(got.exists(_._2 > 0L))
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
    val maxDocByBucket = d.groupBy(_._1 % CorpusOps.PackBuckets).view
      .mapValues(_.map(_._2).max).toMap
    rows.groupBy(_.getLong(0)).foreach { case (bucket, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head === 0L)
      // Contiguity invariant: a doc of n tokens starting inside pack p
      // ends in pack ≤ p + n/PackLen + 1, so successive OCCUPIED pack
      // ids within a bucket can differ by at most
      // maxDocTokens/PackLen + 1 — short docs can never skip a pack.
      val maxGap = maxDocByBucket(bucket) / CorpusOps.PackLen + 1
      ids.zip(ids.tail).foreach { case (a, b) =>
        assert(b - a <= maxGap,
          s"bucket $bucket: pack_id jumps $a -> $b (max gap $maxGap)")
      }
    }
  }
}
