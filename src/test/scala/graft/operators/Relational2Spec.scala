package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-2 relational additions: the salted join must be
  * row-identical to the plain join (the whole point of the recipe),
  * and the window/grouping-set queries must satisfy their internal
  * invariants (the exact values are DuckDB-oracle-gated).
  */
class Relational2Spec extends SparkSpec {

  test("saltedJoin == plain join, row for row") {
    val li = graft.Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity"))
    val fs = li.groupBy("l_returnflag").agg(count(lit(1)).as("c"))
    val salted = SkewTools.saltedJoin(li, fs, "l_returnflag", salts = 8)
      .select("l_returnflag", "l_orderkey", "l_quantity", "c")
    val plain = li.join(fs, "l_returnflag")
      .select("l_returnflag", "l_orderkey", "l_quantity", "c")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q31 window family: per-partition invariants") {
    val rows = Relational2.q31WindowFamily(spark, sf).collect()
    // percent_rank and cume_dist are in [0,1]; tiles are 1..4.
    assert(rows.forall { r =>
      val (pr, cd, tile) = (r.getDouble(3), r.getDouble(4), r.getLong(2))
      pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0 &&
        tile >= 1L && tile <= 4L
    })
    // last_key is constant within a nation and belongs to that nation.
    val byNation = rows.groupBy(_.getInt(1))
    assert(byNation.values.forall(rs => rs.map(_.getLong(6)).distinct.size == 1))
  }

  test("q32 grouping sets: set totals agree with the grand total") {
    val rows = Relational2.q32GroupingSets(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    val grand = rows.collect { case (1L, 1L, n) => n }.sum
    // each of the four grouping sets partitions all orders
    assert(rows.collect { case (0L, 0L, n) => n }.sum === grand)
    assert(rows.collect { case (0L, 1L, n) => n }.sum === grand)
    assert(rows.collect { case (1L, 0L, n) => n }.sum === grand)
  }

  test("q35 volume shipping: cross-nation pairs within the group") {
    val rows = Relational2.q35VolumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, c) = (r.getString(0), r.getString(1))
      assert(Relational2.TradeNations.contains(s))
      assert(Relational2.TradeNations.contains(c))
      assert(s !== c)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("q36 product profit: broadcasts the filtered part side") {
    val df = Relational2.q36ProductProfit(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(df.collect().nonEmpty)
  }

  test("q38 range frame == per-customer brute force over day windows") {
    val orders = graft.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("d"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(2)))
    val byCust = orders.groupBy(_._2)
    val expected = orders.map { case (ok, ck, d, _) =>
      ok -> byCust(ck)
        .filter(o => o._3 >= d - 90 && o._3 <= d)
        .map(_._4).sum.toDouble
    }.toMap
    val got = Relational2.q38RangeFrame(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === expected)
  }

  test("q40 unpivot: 3 measures per flag, melt is an Expand (no join)") {
    val df = Relational2.q40Unpivot(spark, sf)
    val rows = df.collect()
    // every id row melts into exactly one row per measure column
    val byFlag = rows.groupBy(_.getString(0))
    byFlag.values.foreach { rs =>
      assert(rs.map(_.getString(1)).sorted.toSeq ===
        Seq("sum_disc_price", "sum_price", "sum_qty"))
    }
    // melted values round-trip: each (flag, measure) value equals the
    // wide aggregate's column (pivot⁻¹ ∘ pivot = id)
    val wide = graft.Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(Exact.dsum(Exact.money(col("l_quantity"))).as("sum_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.filter(_.getString(1) == "sum_qty").foreach { r =>
      assert(r.getDouble(2) === wide(r.getString(0)))
    }
    // physical shape: one Expand, zero joins — the melt must not be
    // planned as a self-join or union of scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand in:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("q69 SQL UNPIVOT clause: identical rows to the typed q40 melt, " +
    "same Expand physical shape") {
    val sqlRows = Relational2.q69UnpivotSql(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    val typedRows = Relational2.q40Unpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(sqlRows === typedRows) // one operator, two declared spellings
    val plan = Relational2.q69UnpivotSql(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand in:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("q41 profile: pruned per-column passes, no Expand, " +
      "internally consistent") {
    val df = Relational2.q41Profile(spark, sf)
    val rows = df.collect()
    assert(rows.length === 6)
    // same table ⇒ same row count on every profile row; distincts and
    // nulls bounded by it; typed min/max populated per column kind
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) === n)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= n)
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n)
      val hasNum = !r.isNullAt(4)
      val hasStr = !r.isNullAt(6)
      assert(hasNum ^ hasStr) // exactly one typed min/max pair
      if (hasNum) assert(r.getDouble(4) <= r.getDouble(5))
      else assert(r.getString(6) <= r.getString(7))
    }
    // the profile is one COLUMN-PRUNED pass per column (the fused
    // single-pass alternative plans its multi-count_distinct as an
    // Expand that replicates every row ×6 — 400 s at sf1): each scan's
    // ReadSchema must carry exactly its own column, and no Expand may
    // appear anywhere
    // the AQE plan string repeats the tree under "== Initial Plan ==";
    // audit only the final plan section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Expand"), s"row-replicating Expand:\n$plan")
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.length === 6, s"expected 6 pruned scans:\n$plan")
    assert(reads.forall(r => !r.contains(",")),
      s"a profile scan read more than its own column: $reads")
  }

  test("q42 merge: deletes gone, updates patched, inserts present, " +
      "untouched rows identical") {
    val base = graft.Tables(spark, sf, "customer").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    val got = Relational2.q42MergeUpsert(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getString(3))).toMap
    base.keys.foreach { k =>
      if (k % 11 == 3 && k % 7 != 0) assert(!got.contains(k)) // deleted
      else if (k % 7 == 0) { // updated: +100.00 exactly
        assert(got(k)._3 === "updated")
        assert(got(k)._2 ===
          (BigDecimal(base(k)._2).setScale(2) + 100).toDouble)
      } else { // untouched
        assert(got(k)._3 === "base")
        assert(got(k)._1 === base(k)._1 && got(k)._2 === base(k)._2)
      }
      if (k % 13 == 5) { // inserted under the shifted key
        assert(got(k + 1000000L)._3 === "inserted")
        assert(got(k + 1000000L)._2 === 0.0)
      }
    }
    // no keys beyond base ∪ shifted-inserts
    assert(got.keySet.subsetOf(
      base.keySet ++ base.keySet.filter(_ % 13 == 5).map(_ + 1000000L)))
  }

  test("q43 stats: moment-derived stddev/corr match Spark built-ins") {
    val got = Relational2.q43StatsAgg(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // the built-ins fold doubles in arrival order (not hash-gateable),
    // but they agree with the exact-moment form to float tolerance
    val ref = graft.Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)), avg("l_quantity"), stddev_samp("l_quantity"),
        corr("l_quantity", "l_discount"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, (n, mean, sd, c)) =>
      val (rn, rMean, rSd, rC) = ref(k)
      assert(n === rn)
      assert(math.abs(mean - rMean) < 1e-9 * math.abs(rMean))
      assert(math.abs(sd - rSd) < 1e-9 * math.abs(rSd))
      assert(math.abs(c - rC) < 1e-6)
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("q44 histogram: buckets partition the table, edges monotone, " +
      "extremes land in the end bins") {
    val rows = Relational2.q44Histogram(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Relational2.HistBuckets)
    // counts conserve the table
    val total = graft.Tables(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(2)).sum === total)
    // bucket ids in range, lower edges strictly increasing
    val ids = rows.map(_.getLong(0))
    assert(ids.forall(b => b >= 0 && b < Relational2.HistBuckets))
    val los = rows.map(_.getDouble(1))
    los.zip(los.tail).foreach { case (a, b) => assert(a < b) }
    // the observed min/max land in the first/last occupied buckets
    val mm = graft.Tables(spark, sf, "lineitem")
      .agg(min("l_extendedprice"), max("l_extendedprice")).collect()(0)
    assert(los.head <= mm.getDouble(0))
    assert(los.last <= mm.getDouble(1))
    assert(ids.last === Relational2.HistBuckets - 1 ||
      mm.getDouble(1) < los.last + (los(1) - los(0)))
  }

  test("q59 skyline == brute-force dominance; no quadratic join") {
    val parts = graft.Tables(spark, sf, "part")
      .select("p_brand", "p_partkey", "p_retailprice", "p_size")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getInt(3).toLong))
    val expected = parts.filter { case (br, _, price, sz) =>
      !parts.exists { case (br2, _, p2, s2) =>
        br2 == br && p2 <= price && s2 >= sz && (p2 < price || s2 > sz)
      }
    }.sortBy { case (br, k, p, _) => (br, p, k) }.toSeq
    val got = Relational2.q59Skyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // the operator must use the sweep-line shape, never an O(n²)
    // dominance self-join
    val plan = Relational2.q59Skyline(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"quadratic join in skyline plan:\n$plan")
  }

  test("q37 market share: shares in [0,1]; weighted shares ≈ totals") {
    val rows = Relational2.q37MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getDouble(2) > 0.0)
    }
  }
}
