package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** dd_fuzzy_edit: the deletion-neighborhood (FastSS) join must be
  * COMPLETE for edit distance ≤ 1 — proven by comparing against the
  * all-pairs brute force over the same derived corpus.
  */
class FuzzyEditSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Same corpus the operator derives: distinct names + planted typos. */
  private def corpus: Seq[(Long, String)] = {
    val names = graft.Tables(spark, sf, "part")
      .groupBy("p_name").agg(min("p_partkey").as("id"))
      .collect().map(r => (r.getLong(1), r.getString(0)))
    val typos = names.filter(_._1 % 2 == 0).map { case (id, name) =>
      val pos = ((id % (name.length - 2)) + 2).toInt // 1-based
      (id + Dedup.FuzzyIdOffset,
        name.substring(0, pos - 1) + name.substring(pos))
    }
    (names ++ typos).toSeq
  }

  test("fuzzy-edit join is COMPLETE: equals all-pairs brute force") {
    val u = corpus
    val expected = (for {
      (ia, na) <- u; (ib, nb) <- u
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib, na, nb, lev(na, nb).toLong)).toSet
    val got = Dedup.fuzzyEdit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("every planted typo is recovered as a distance-1 pair") {
    val pairs = Dedup.fuzzyEdit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    corpus.filter(_._1 >= Dedup.FuzzyIdOffset).foreach { case (tid, _) =>
      val orig = tid - Dedup.FuzzyIdOffset
      assert(pairs.contains((orig, tid)),
        s"typo of $orig not matched back to its original")
    }
  }

  test("candidate generation is linear: equi-join, no nested loop") {
    val plan = Dedup.fuzzyEdit(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
