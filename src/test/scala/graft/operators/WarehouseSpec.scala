package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q53–q56: each warehouse-maintenance operator checked against a
  * driver-side sequential recompute or a structural invariant the SQL
  * oracle cannot express.
  */
class WarehouseSpec extends SparkSpec {

  test("q53 sessions == sequential per-user replay") {
    val ev = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "ts_ns DIV 1000 AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2)).map(_._3)
      // replay: assign session index by walking the gap sequence
      val idx = sorted.scanLeft((0L, Long.MinValue)) {
        case ((i, prev), us) =>
          (if (prev == Long.MinValue ||
            us - prev > Warehouse.SessionGapUs) i + 1 else i, us)
      }.tail.map(_._1)
      sorted.zip(idx).groupBy(_._2).map { case (si, es) =>
        (u, si, es.size.toLong, es.map(_._1).min, es.map(_._1).max)
      }
    }.toSet
    val got = Warehouse.q53Sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q54 SCD2 intervals tile each customer's history") {
    val rows = Warehouse.q54Scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDate(3), Option(r.getDate(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, h0) =>
      val h = h0.sortBy(_._2)
      // versions contiguous from 1
      assert(h.map(_._2).toSeq === (1L to h.length).toSeq)
      // exactly one open (current) interval, and it is the last
      assert(h.count(_._5.isEmpty) === 1 && h.last._5.isEmpty)
      assert(h.forall(r => r._6 === r._5.isEmpty))
      // each interval closes exactly where the next opens, and the
      // tracked value actually changed at every boundary
      h.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4))
          assert(a._3 !== b._3)
        case _ =>
      }
    }
  }

  test("q55 decay score is bit-exact vs rational recompute") {
    val ev = Tables(spark, sf, "events")
      .selectExpr("user_id", "ts_ns DIV 1000 AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = ev.map(_._2).max
    val weekUs = 7L * 24 * 3600 * 1000 * 1000
    // exact rational sum: weights are 2^-k, k <= 16, so Σ·2^16 is an
    // integer — compare as scaled integers, then assert the double
    // the engine returns is exactly that rational
    val expected = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map { case (_, us) =>
        (1L << 16) >> math.min((mx - us) / weekUs, 16L).toInt
      }.sum
    }
    val got = Warehouse.q55Decay(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (u, _, score) =>
      assert(score * 65536.0 === expected(u).toDouble,
        s"user $u score not the exact dyadic rational")
    }
  }

  test("q56 merged partial states == single-pass recompute, bitwise") {
    import org.apache.spark.sql.functions._
    val direct = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Exact.money(col("o_totalprice"))).cast("double")
          .as("total_spend"))
      .orderBy("custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val merged = Warehouse.q56IncrementalMv(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(merged.toSeq === direct.toSeq)
    assert(merged.nonEmpty)
  }

  test("q53/q55 plans: one user-keyed exchange, no cartesian blowup") {
    val p53 = Warehouse.q53Sessionize(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p53.contains("CartesianProduct"))
    val p55 = Warehouse.q55Decay(spark, sf)
      .queryExecution.executedPlan.toString
    // the corpus-max scalar must ride a broadcast, not a cartesian
    assert(!p55.contains("CartesianProduct"))
    assert(p55.contains("BroadcastNestedLoopJoin")
      || p55.contains("BroadcastExchange"))
  }

  test("q63/q65 plans: ONE data-keyed hash exchange each (group keys " +
    "extend the window partitioning, so the aggregate reuses it)") {
    for (df <- Seq(Warehouse.q63Paths(spark, sf),
        Warehouse.q65IntervalMerge(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"))
      // all windows + the per-group aggregate ride one user/customer
      // hash exchange; only the final total-order sort adds a range
      // exchange (q63's top-k path count adds one more short-row one)
      val hashEx = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      assert(hashEx <= 2, s"expected <=2 hash exchanges, got $hashEx")
    }
  }

  test("q63 paths == sequential sessionize-and-render replay") {
    val ev = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "ts_ns DIV 1000 AS us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val paths = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(x => (x._4, x._2))
      // split into sessions at >30-min gaps, render first PathLen
      val sessions = sorted.foldLeft(List.empty[List[(String, Long)]]) {
        case (acc, e) =>
          acc match {
            case cur :: rest
              if e._4 - cur.head._2 <= Warehouse.SessionGapUs =>
              ((e._3, e._4) :: cur) :: rest
            case _ => List((e._3, e._4)) :: acc
          }
      }
      sessions.map(s =>
        s.reverse.take(Warehouse.PathLen).map(_._1).mkString(">"))
    }
    val expected = paths.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .map { case (p, n) => (p, n) }
      .sortBy { case (p, n) => (-n, p) }
      .take(Warehouse.PathTopK)
    val got = Warehouse.q63Paths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q65 interval islands == sequential sweep-line replay") {
    val iv = Tables(spark, sf, "orders")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')" +
          " AS BIGINT) AS s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = iv.groupBy(_._1).flatMap { case (ck, xs) =>
      val sorted = xs.map { case (_, ok, s) =>
        (s, s + ok % Warehouse.IntervalMaxDays, ok)
      }.sortBy(x => (x._1, x._2, x._3))
      // sweep: an interval joins the current island iff its start is
      // at or before the island's running max end
      val islands = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, (s, e, _)) => acc match {
          case (is, ie, n) :: rest if s <= ie =>
            (is, math.max(ie, e), n + 1) :: rest
          case _ => (s, e, 1L) :: acc
        }
      }.reverse
      islands.zipWithIndex.map { case ((s0, e0, n), i) =>
        (ck, (i + 1).toLong, s0, e0, n)
      }
    }.toSet
    val got = Warehouse.q65IntervalMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // and merging actually happened somewhere (islands < orders)
    assert(got.size < iv.length)
  }

  test("q66 native session_window == sequential replay with the " +
      "end-exclusive boundary; plan uses the merging-session operator") {
    val ev = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "ts_ns DIV 1000 AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2)).map(_._3)
      // end-exclusive rule: gap >= 30 min opens a new session
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (cur :: rest, us)
          if us - cur.head < Warehouse.SessionGapUs =>
          (us :: cur) :: rest
        case (acc, us) => List(us) :: acc
      }
      sessions.map(ses =>
        (u, ses.min, ses.max + Warehouse.SessionGapUs, ses.size.toLong))
    }.toSet
    val df = Warehouse.q66SessionWindow(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("UpdatingSessions")
      || plan.contains("MergingSessions")
      || plan.contains("session_window"),
      "the native session operator must drive the plan")
  }

  test("q67 snapshot diff == set replay; all three change classes fire") {
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val oldv = orders.filter(_._1 % Warehouse.DiffAddMod != 7)
      .map { case (k, p) => k -> p }.toMap
    val newv = orders.filter(_._1 % Warehouse.DiffRemoveMod != 3)
      .map { case (k, p) =>
        k -> (if (k % 5 == 0)
          (BigDecimal(p).setScale(2) + BigDecimal("50.00")).toDouble
        else p)
      }.toMap
    val expected = (oldv.keySet ++ newv.keySet).flatMap { k =>
      (oldv.get(k), newv.get(k)) match {
        case (None, Some(n))    => Some((k, "added", None, Some(n)))
        case (Some(o), None)    => Some((k, "removed", Some(o), None))
        case (Some(o), Some(n)) if o != n =>
          Some((k, "changed", Some(o), Some(n)))
        case _ => None
      }
    }
    val got = Warehouse.q67SnapshotDiff(spark, sf).collect().map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSet
    assert(got === expected)
    Seq("added", "removed", "changed").foreach(c =>
      assert(got.exists(_._2 == c), s"fixture must exercise '$c'"))
  }

  test("q68 bucketed join == plain shuffled join, zero hash exchanges") {
    val got = Warehouse.q68BucketedJoin(spark, sf)
    // The in-query require() already gated SortMergeJoin + no hash
    // exchange at plan time; here gate the ANSWER against the plain
    // (shuffle-as-Spark-likes) formulation of the same query.
    val plain = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Exact.money(col("o_totalprice"))).cast("double")
          .as("total_spend"))
    val toSet = (rows: Array[org.apache.spark.sql.Row]) => rows.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val gotSet = toSet(got.collect())
    assert(gotSet === toSet(plain.collect()))
    assert(gotSet.nonEmpty)
  }

  test("q62 outliers == driver recompute; stats join is broadcast") {
    val ev = Tables(spark, sf, "events")
      .selectExpr("event_id", "event_type", "value",
        "CAST(value AS DECIMAL(12,2)) AS xd")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDecimal(3)))
    val expected = ev.groupBy(_._2).values.flatMap { xs =>
      val n = xs.size.toLong
      // exact decimal sums, then the operator's double tree
      val sx = xs.map(_._4).reduce(_ add _).doubleValue()
      val sxx = xs.map(x => x._4.multiply(x._4))
        .reduce(_ add _).doubleValue()
      val mean = sx / n
      val sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
      xs.flatMap { x =>
        val z = (x._4.doubleValue() - mean) / sd
        if (math.abs(z) > Warehouse.OutlierSigmas)
          Some((x._1, x._2, x._3, z))
        else None
      }
    }.toSeq.sortBy(_._1)
    val got = Warehouse.q62Outliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    val plan = Warehouse.q62Outliers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats join must broadcast:\n$plan")
  }
}
