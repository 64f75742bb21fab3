package graft.operators

import graft.SparkSpec

/** q49/q50: association rules and triangle counts must equal a
  * driver-side brute-force recompute from the raw baskets.
  */
class GraphBasketSpec extends SparkSpec {

  private lazy val baskets: Seq[(Long, Long)] =
    graft.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private lazy val pairSupp: Map[(Long, Long), Long] =
    baskets.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("q49 rules == brute-force supports, confidences and lift") {
    val itemSupp = baskets.groupBy(_._2).map { case (p, xs) =>
      p -> xs.size.toLong
    }
    val nOrders = baskets.map(_._1).distinct.size.toLong
    val expected = pairSupp
      .filter(_._2 >= GraphBasket.MinRuleSupport)
      .map { case ((a, b), sab) =>
        (a, b, sab, itemSupp(a), itemSupp(b),
          sab.toDouble / itemSupp(a), sab.toDouble / itemSupp(b),
          (sab * nOrders).toDouble / (itemSupp(a) * itemSupp(b)))
      }.toSet
    val got = GraphBasket.q49BasketRules(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q50 triangle participation == brute-force enumeration") {
    val edges = pairSupp.filter(_._2 >= GraphBasket.MinEdgeSupport).keySet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def has(a: Long, b: Long) =
      edges.contains(if (a < b) (a, b) else (b, a))
    val counts = scala.collection.mutable.Map[Long, Long]()
    for {
      i <- verts.indices; j <- (i + 1) until verts.length
      if has(verts(i), verts(j))
      k <- (j + 1) until verts.length
      if has(verts(j), verts(k)) && has(verts(i), verts(k))
    } Seq(verts(i), verts(j), verts(k))
      .foreach(v => counts(v) = counts.getOrElse(v, 0L) + 1L)
    val got = GraphBasket.q50Triangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === counts.toMap)
    // every triangle credits exactly 3 corners
    assert(got.values.sum % 3 === 0)
  }

  test("q52 pagerank == sequential BigInt power iteration") {
    val edgeSet = pairSupp.filter(_._2 >= GraphBasket.MinEdgeSupport).keySet
    val out = edgeSet.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = out.view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    val S = BigInt(GraphBasket.PrScale)
    var r: Map[Long, BigInt] = deg.map { case (v, _) => v -> S / n }
    for (_ <- 1 to GraphBasket.PrIters) {
      val in = scala.collection.mutable.Map[Long, BigInt]()
        .withDefaultValue(BigInt(0))
      out.foreach { case (u, ws) =>
        val c = r(u) / deg(u)
        ws.foreach(w => in(w) += c)
      }
      r = deg.map { case (v, _) =>
        v -> ((15 * S) / (100 * n) + (85 * in(v)) / 100)
      }
    }
    val got = GraphBasket.q52PageRank(spark, sf).collect()
      .map(x => x.getLong(0) -> BigInt(x.getLong(1))).toMap
    assert(got === r)
    // truncating divs only ever LOSE quanta: total mass stays within
    // a few parts per thousand of one full unit of rank
    val mass = got.values.sum
    assert(mass <= S && mass > S * 9 / 10)
  }

  test("q60 bfs == sequential breadth-first search, capped at 4 hops") {
    val edgeSet = pairSupp.filter(_._2 >= GraphBasket.MinEdgeSupport).keySet
    val adj = edgeSet.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val src = adj.keys.min
    var dist = Map(src -> 0L)
    var frontier = Set(src)
    for (k <- 1 to GraphBasket.BfsRounds if frontier.nonEmpty) {
      val next = frontier.flatMap(adj(_)).filterNot(dist.contains)
      next.foreach(v => dist += v -> k.toLong)
      frontier = next
    }
    val got = GraphBasket.q60Bfs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === dist)
    assert(got.nonEmpty && got(src) === 0L)
  }

  test("pair generation joins on the order key, never cross-product") {
    val plan = GraphBasket.q49BasketRules(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val plan50 = GraphBasket.q50Triangles(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan50.contains("CartesianProduct"))
  }
}
