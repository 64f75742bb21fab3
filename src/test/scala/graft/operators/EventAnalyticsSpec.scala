package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-analytics tier (q45–q48) plus the corpus chunker and the
  * deletion-neighborhood fuzzy join added alongside: each operator's
  * defining invariant is checked against an independent in-memory
  * recomputation (the exact values are DuckDB-oracle-gated).
  */
class EventAnalyticsSpec extends SparkSpec {

  private def events =
    graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), expr("ts_ns DIV 1000").as("us"))

  test("q45 fill forward == per-user sequential LOCF replay") {
    val got = EventAnalytics.q45FillForward(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val rows = events.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4)))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      var lastPurchase: Option[Double] = None
      es.sortBy(e => (e._5, e._1)).map { e =>
        if (e._3 == "purchase") lastPurchase = Some(e._4)
        e._1 -> lastPurchase
      }.toSeq
    }.toMap
    assert(got === expected)
  }

  test("q45 plans exactly one exchange (the user_id window shuffle)") {
    val plan = EventAnalytics.q45FillForward(spark, sf)
      .queryExecution.executedPlan.toString
    // one hash exchange for the window; the final orderBy adds a range
    // exchange — nothing else may shuffle
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
  }

  test("q46 grid is contiguous per user, sums preserved, gaps empty") {
    val rows = EventAnalytics.q46Resample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val byUser = rows.groupBy(_._1)
    val eventCounts = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUser.keySet === eventCounts.keySet)
    byUser.foreach { case (u, ds) =>
      val days = ds.map(_._2).sorted
      // contiguous: day count equals span between endpoints
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head),
        java.time.LocalDate.parse(days.last)) + 1
      assert(days.length.toLong === span, s"user $u grid has holes")
      assert(ds.map(_._3).sum === eventCounts(u), s"user $u count drift")
      assert(ds.forall(d => d._4 === (d._3 == 0L)), s"user $u gap flags")
      // endpoints are active by construction (span is min..max)
      assert(!ds.minBy(_._2)._4 && !ds.maxBy(_._2)._4)
    }
  }

  test("q47 funnel counts are monotone non-increasing from stage 1") {
    val rows = EventAnalytics.q47Funnel(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq ===
      Seq("1_signup", "2_view", "3_click", "4_purchase"))
    val ns = rows.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
    assert(ns.head > 0)
  }

  test("q47 funnel == sequential per-user replay") {
    val rows = events.collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(4)))
    val W = EventAnalytics.FunnelStepUs
    val stages = Seq("signup", "view", "click", "purchase")
    val depths = rows.groupBy(_._1).values.map { es =>
      val sorted = es.sortBy(_._3)
      var depth = 0
      var t = Long.MinValue
      var bound = Long.MaxValue
      for (stage <- stages) {
        if (depth == stages.indexOf(stage)) {
          sorted.find(e => e._2 == stage && e._3 > t &&
              (depth == 0 || e._3 <= bound)) match {
            case Some(e) => depth += 1; t = e._3; bound = e._3 + W
            case None =>
          }
        }
      }
      depth
    }.toSeq
    val expected = (1 to 4).map(k => depths.count(_ >= k).toLong)
    val got = EventAnalytics.q47Funnel(spark, sf).collect().map(_.getLong(1))
    assert(got.toSeq === expected)
  }

  test("q48 cohort: offset-0 equals cohort size; totals consistent") {
    val rows = EventAnalytics.q48CohortRetention(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byCohort = rows.groupBy(_._1)
    // day-0 retention row exists for every cohort and is its max
    byCohort.foreach { case (c, rs) =>
      val d0 = rs.find(_._2 == 0L)
      assert(d0.isDefined, s"cohort $c missing day 0")
      assert(rs.forall(_._3 <= d0.get._3), s"cohort $c day0 not max")
    }
    // all purchasing users appear exactly once at offset 0
    val purchasers = events.filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum === purchasers)
  }

  test("q61 transitions == sequential replay; rows sum to 1 per source") {
    val ev = graft.Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "ts_ns DIV 1000 AS us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val pairCnt = ev.groupBy(_._1).values.flatMap { xs =>
      val types = xs.sortBy(x => (x._4, x._2)).map(_._3)
      types.zip(types.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTot = pairCnt.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val expected = pairCnt.toSeq.map { case ((f, t), n) =>
      (f, t, n, n.toDouble / fromTot(f).toDouble)
    }.sortBy(x => (x._1, x._2))
    val got = EventAnalytics.q61Transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // probabilities are a distribution per source type
    got.groupBy(_._1).values.foreach { rs =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-12)
    }
  }

  test("q64 plan: fan-out is shuffle-free; max-day clip is broadcast") {
    val plan = EventAnalytics.q64RollingDau(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the 1-row max frame joins via broadcast nested loop, never a
    // cartesian; the only hash exchanges are the (user,day) distinct
    // and the per-day distinct aggregate — the ×7 explode itself
    // never shuffles
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx <= 3, s"expected <=3 hash exchanges, got $hashEx")
  }

  test("q64 rolling DAU == windowed distinct replay") {
    val ud = events
      .selectExpr("user_id", "us DIV 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val maxDay = ud.map(_._2).max
    val minDay = ud.map(_._2).min
    // independent definition: for each report day, count users with
    // any active day inside the trailing window
    val expected = (minDay to maxDay).flatMap { d =>
      val n = ud.collect {
        case (u, a)
          if a >= d - (EventAnalytics.DauWindowDays - 1) && a <= d => u
      }.distinct.size.toLong
      if (n > 0) Some((d, n)) else None
    }
    val got = EventAnalytics.q64RollingDau(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
