package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** Relational operator tier (SURVEY.md §2.2–§2.7): scans with
  * pushdown, projections/filters, every join kind, hash aggregation
  * with partial agg, rollup/cube, window functions, set ops, sorts and
  * top-k, and the scalar-function families — each expressed purely in
  * `Dataset`/`Column` built-ins so Catalyst plans them (predicate
  * pushdown to parquet, broadcast-vs-shuffle join selection, partial
  * aggregation, TakeOrderedAndProject for top-k, AQE at runtime).
  *
  * Every query here is paired with ANSI SQL in
  * [[Relational.oracles]] for the DuckDB differential gate. Float
  * discipline per [[Exact]]; all computed integers are surfaced as
  * BIGINT in both engines; every query ends in a total order so the
  * comparison is row-order insensitive.
  *
  * Scale notes are inline per query — the fixture is small but each
  * plan is written for the 1000-executor / 100 TB case.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Reference `events.ts` (int64 nanos) ↔ order dates, as exact i64
    * nanos on both sides.
    */
  private def ntzToNs(c: Column): Column =
    unix_micros(c.cast("timestamp")) * lit(1000L)

  // ---------------------------------------------------------------
  // q1: full-table hash aggregation (TPC-H Q1 shape).
  // Scale: partial agg (map-side combine) means the shuffle carries
  // 6 groups × partial buffers, not 600M rows; filter pushed to scan.
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '2001-09-02 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(money(col("l_quantity"))).as("sum_qty"),
        dsum(money(col("l_extendedprice"))).as("sum_base_price"),
        dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
          .as("sum_disc_price"),
        dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount")))
          * (one + rate(col("l_tax")))).as("sum_charge"),
        davg(money(col("l_quantity"))).as("avg_qty"),
        davg(money(col("l_extendedprice"))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // q2: projection + filter; predicate and column pruning must reach
  // the parquet scan (verified via explain in RelationalSpec).
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_size").between(10, 20) && col("p_type") === "STANDARD")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_u"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        col("p_retailprice"))
      .orderBy(col("p_partkey"))

  // q3: selective dims → fact join → agg → top-k (TPC-H Q3 shape).
  // Scale: customer-filter joined broadcast-style when small; top-k is
  // TakeOrderedAndProject (no global sort materialization).
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(
        col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        col("o_orderpriority"))
      .agg(dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  // q4: left-semi join (EXISTS) feeding an aggregation.
  def q4PriorityExists(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === big("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  // q5: multiway star join through region→nation→customer→orders→
  // lineitem. Scale: region/nation are broadcast (tiny dims); the
  // customer⋈orders⋈lineitem chain shuffles on the join keys once
  // each, and AQE re-plans if a side turns out broadcastable.
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val nat = broadcast(
      t(s, dir, "nation").join(
        broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")))
    val cust = t(s, dir, "customer")
      .join(nat, col("c_nationkey") === nat("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("n_name"))
      .agg(dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  // q6: left-anti join (NOT EXISTS) — customers with no in-progress
  // ('P') order.
  def q6CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "P").select("o_custkey")
    t(s, dir, "customer")
      .join(ord, col("c_custkey") === ord("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("c_nationkey"))
  }

  // q7: global top-k → physical TakeOrderedAndProject: each partition
  // keeps k rows, driver merges n_partitions×k — no full sort at scale.
  def q7TopOrderValues(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  // q8: ranking window + per-group top-k.
  def q8TopCustomersPerNation(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  // q9: running-frame aggregation window (exact decimal running sum).
  def q9RunningRevenue(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .filter(col("l_suppkey") <= 5)
      .select(
        col("l_suppkey"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
        col("l_orderkey"), col("l_linenumber"),
        sum(money(col("l_extendedprice"))).over(w).cast("double")
          .as("running_rev"))
      .orderBy(col("l_suppkey"), col("ship_day"), col("l_orderkey"),
        col("l_linenumber"))
  }

  // q10: lag/lead analytics windows.
  def q10OrderGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") <= 50)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        (ntzToNs(col("o_orderdate"))
          - ntzToNs(lag(col("o_orderdate"), 1).over(w)))
          .as("ns_since_prev"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
      .orderBy(col("o_custkey"), col("order_day"), col("o_orderkey"))
  }

  // q11: rollup (hierarchical grouping sets).
  def q11Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(money(col("l_quantity"))).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  // q12: cube (all grouping-set combinations).
  def q12Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(money(col("o_totalprice"))).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  // q13: set operations (INTERSECT / EXCEPT have SQL set semantics —
  // distinct — in both engines).
  def q13SetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    def keys(status: String) =
      ord.filter(col("o_orderstatus") === status).select("o_custkey")
    keys("F").intersect(keys("O")).except(keys("P"))
      .orderBy(col("o_custkey"))
  }

  // q14: CASE expression + aggregation.
  def q14CaseBuckets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("big").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(money(col("o_totalprice"))).as("total"))
      .orderBy(col("bucket"))

  // q15: date/time scalar functions + group by calendar month.
  def q15MonthlyOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(money(col("o_totalprice"))).as("revenue"))
      .orderBy(col("y"), col("m"))

  // q16: string scalar functions.
  def q16StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(element_at(split(col("p_name"), " "), 1).as("first_word"))
      .agg(
        count(lit(1)).as("n"),
        min(length(col("p_name"))).cast("long").as("min_len"),
        max(upper(col("p_name"))).as("max_name_u"))
      .orderBy(col("first_word"))

  // q17: math scalar functions (only IEEE-exact ones — sqrt, abs,
  // floor, ceil — so the oracle compare is bit-stable).
  def q17MathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        abs(col("l_quantity") - 25).as("abs_dev"),
        floor(col("l_extendedprice")).cast("long").as("floor_price"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // q18: JSON extraction (events.props) + aggregation.
  def q18JsonEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  // q19: as-of join — for each order, the most recent event of that
  // customer at-or-before the order date. No built-in Spark operator:
  // implemented scale-correctly in [[AsOfJoin]] via union + ordered
  // window (one shuffle on the key; never a per-row range scan).
  def q19AsOfLastEvent(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        ntzToNs(col("o_orderdate")).as("t_ns"))
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("ts_ns"))
    AsOfJoin
      .lastValueAtOrBefore(
        left = ord, leftKey = "o_custkey", leftTime = "t_ns",
        right = ev, rightKey = "user_id", rightTime = "ts_ns",
        valueCol = "ts_ns", as = "last_ev_ns")
      .select(col("o_orderkey"),
        coalesce(col("last_ev_ns"), lit(-1L)).as("last_ev_ns"))
      .orderBy(col("o_orderkey"))
  }

  // q20: range join — events within 24h after the order, same user.
  // Scale: the user-id equi key carries the shuffle; the time range is
  // a residual filter on the equi join, NOT a nested-loop join.
  def q20RangeJoinEvents(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        ntzToNs(col("o_orderdate")).as("od_ns"))
    val ev = t(s, dir, "events").select(col("user_id"), col("ts_ns"),
      col("event_id"))
    ord.join(ev,
        ev("user_id") === ord("o_custkey") &&
        ev("ts_ns") >= ord("od_ns") &&
        ev("ts_ns") < ord("od_ns") + lit(dayNs), "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("event_id")).as("n_ev"))
      .orderBy(col("o_orderkey"))
  }

  // q21: SQL surface — the same engine exposed through spark.sql
  // (Tables registered as temp views; Catalyst plans it identically
  // to the DataFrame form). Supplier ⋈ nation with a broadcast dim.
  def q21SupplierNation(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT n_name,
             COUNT(*) AS n_supp,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_bal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")
  }

  // q22: full outer join on pre-aggregated sides (nulls surfaced as
  // zero counts — nations having only customers or only suppliers).
  def q22FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, Seq("nk"), "full_outer")
      .select(col("nk").as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  // q39: right outer join — per-customer order counts kept for EVERY
  // customer (order-less customers surface with a zero count). The
  // mirror of q22's full-outer shape, preserving the whole right
  // side. Scale: the aggregate side arrives pre-shrunk (one row per
  // customer with orders), so the join shuffles |customers| rows on
  // the key — and the orders aggregation is partial-agg'd map-side.
  def q39RightOuter(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").groupBy(col("o_custkey").as("ck"))
      .agg(count(lit(1)).as("cnt"))
    val c = t(s, dir, "customer")
      .select(col("c_custkey").as("ck"), col("c_mktsegment"))
    o.join(c, Seq("ck"), "right_outer")
      .select(col("ck").as("custkey"), col("c_mktsegment"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .orderBy("custkey")
  }

  // q23: distinct aggregation — exact COUNT(DISTINCT) per group plus
  // a global dropDuplicates count. (approx_count_distinct is the
  // scale-path twin; being approximate it is spec-tested against the
  // exact value rather than oracle-checked — see PlanAuditSpec.)
  def q23DistinctCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  // q24: UNION ALL of two differently-shaped relations (tagged), then
  // re-aggregated — the Dataset union surface.
  def q24UnionBalances(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(lit("customer").as("side"),
      col("c_acctbal").as("bal"))
    val su = t(s, dir, "supplier").select(lit("supplier").as("side"),
      col("s_acctbal").as("bal"))
    c.unionByName(su)
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"),
        dsum(money(col("bal"))).as("sum_bal"),
        min(col("bal")).as("min_bal"),
        max(col("bal")).as("max_bal"))
      .orderBy(col("side"))
  }

  // q25: pure theta join (inequality-only condition → broadcast
  // nested loop; both sides are tiny dims, which is the only shape a
  // nested-loop join should ever take at scale).
  def q25ThetaNationPairs(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "nation").select(col("n_nationkey").as("ka"),
      col("n_name").as("na"))
    val b = t(s, dir, "nation").select(col("n_nationkey").as("kb"),
      col("n_name").as("nb"))
    a.join(b, col("ka") < col("kb") && length(col("na")) < length(col("nb")))
      .select(col("na"), col("nb"))
      .orderBy("na", "nb")
  }

  // q26: exact percentiles (linear interpolation) — Spark
  // `percentile` and DuckDB `quantile_cont` share the definition;
  // both interpolate on doubles, so the oracle compare is exact.
  def q26Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  // q27: skewed aggregation through the salted two-phase recipe
  // (SkewTools) — the result is identical to a plain GROUP BY because
  // the summed column is exact decimal, which is the whole point:
  // salt changes the partial grouping, never the answer.
  // l_returnflag has 3 values over 600k rows at sf0.1 — a genuinely
  // hot aggregation key.
  def q27SaltedAgg(s: SparkSession, dir: String): DataFrame =
    SkewTools.saltedAgg(
        t(s, dir, "lineitem")
          .withColumn("qty_dec", money(col("l_quantity"))),
        key = "l_returnflag", sums = Seq("qty_dec"), salts = 8)
      .select(col("l_returnflag"), col("n"),
        col("sum_qty_dec").cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))

  // q28: as-of join with tolerance — the classic time-series variant:
  // the most recent event at-or-before the order date, but only if it
  // is within 7 days; stale matches are rejected. Same single-shuffle
  // union-window plan as q19 with a residual recency predicate.
  def q28AsOfTolerance(s: SparkSession, dir: String): DataFrame = {
    val tolNs = 7L * 86400 * 1000 * 1000 * 1000
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        ntzToNs(col("o_orderdate")).as("t_ns"))
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("ts_ns"))
    AsOfJoin
      .lastValueAtOrBefore(
        left = ord, leftKey = "o_custkey", leftTime = "t_ns",
        right = ev, rightKey = "user_id", rightTime = "ts_ns",
        valueCol = "ts_ns", as = "last_ev_ns")
      .select(col("o_orderkey"),
        coalesce(
          when(col("t_ns") - col("last_ev_ns") <= tolNs, col("last_ev_ns")),
          lit(-1L)).as("recent_ev_ns"))
      .orderBy(col("o_orderkey"))
  }

  // q29: pivot — long→wide reshaping with an explicit value list
  // (explicit so the output schema is static and both engines agree;
  // at scale an implicit pivot would add a distinct-values job).
  // Oracle mirrors via conditional aggregation.
  def q29PivotStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  // q30: correlated scalar subqueries — customers with more than 2×
  // their nation's average balance. Catalyst decorrelates both
  // subqueries into aggregates + joins (SURVEY §4.1); the predicate
  // is cross-multiplied into exact decimal so no cross-engine
  // float-average ordering can flip a boundary row.
  def q30CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT c_custkey, c_nationkey FROM customer c
      WHERE CAST(c_acctbal AS DECIMAL(12,2)) *
            (SELECT COUNT(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey) >
            (SELECT CAST(2 AS DECIMAL(2,0)) *
                    SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
             FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_correlated_subquery" -> q30CorrelatedSubquery,
    "q29_pivot_status" -> q29PivotStatus,
    "q28_asof_tolerance" -> q28AsOfTolerance,
    "q27_salted_agg" -> q27SaltedAgg,
    "q26_percentiles" -> q26Percentiles,
    "q21_supplier_nation" -> q21SupplierNation,
    "q22_full_outer" -> q22FullOuter,
    "q39_right_outer" -> q39RightOuter,
    "q23_distinct_customers" -> q23DistinctCustomers,
    "q24_union_balances" -> q24UnionBalances,
    "q25_theta_nation_pairs" -> q25ThetaNationPairs,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_filter_project" -> q2FilterProject,
    "q3_top_orders" -> q3TopOrders,
    "q4_priority_exists" -> q4PriorityExists,
    "q5_nation_revenue" -> q5NationRevenue,
    "q6_cust_without_orders" -> q6CustomersWithoutOrders,
    "q7_top_order_values" -> q7TopOrderValues,
    "q8_top_cust_per_nation" -> q8TopCustomersPerNation,
    "q9_running_revenue" -> q9RunningRevenue,
    "q10_order_gaps" -> q10OrderGaps,
    "q11_rollup" -> q11Rollup,
    "q12_cube" -> q12Cube,
    "q13_setops" -> q13SetOps,
    "q14_case_buckets" -> q14CaseBuckets,
    "q15_monthly_orders" -> q15MonthlyOrders,
    "q16_string_funcs" -> q16StringFuncs,
    "q17_math_funcs" -> q17MathFuncs,
    "q18_json_events" -> q18JsonEvents,
    "q19_asof_last_event" -> q19AsOfLastEvent,
    "q20_range_join_events" -> q20RangeJoinEvents,
  )

  // DuckDB oracle SQL. Same aliases, same exact-decimal discipline,
  // same total order as the Spark plans above.
  private val sumDisc =
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"

  val oracles: Map[String, String] = Map(
    "q30_correlated_subquery" ->
      """SELECT c_custkey, c_nationkey FROM customer c
         WHERE CAST(c_acctbal AS DECIMAL(12,2)) *
               (SELECT COUNT(*) FROM customer c2
                WHERE c2.c_nationkey = c.c_nationkey) >
               (SELECT CAST(2 AS DECIMAL(2,0)) *
                       SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
                FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
         ORDER BY c_custkey""",
    "q29_pivot_status" ->
      """SELECT o_orderpriority,
         COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
         COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
         COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q28_asof_tolerance" ->
      """SELECT o_orderkey, COALESCE(
           (SELECT MAX(epoch_ns(e.ts)) FROM events e
            WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
              AND epoch_ns(e.ts) >= epoch_ns(o.o_orderdate)
                - 604800000000000),
           -1) AS recent_ev_ns
         FROM orders o ORDER BY o_orderkey""",
    "q27_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q26_percentiles" ->
      """SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.5) AS p50,
         quantile_cont(o_totalprice, 0.9) AS p90,
         COUNT(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q21_supplier_nation" ->
      """SELECT n_name, COUNT(*) AS n_supp,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q22_full_outer" ->
      """SELECT COALESCE(c.nk, s.nk) AS nationkey,
         COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY 1) c
         FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1) s ON c.nk = s.nk
         ORDER BY nationkey""",
    "q39_right_outer" ->
      """SELECT c.ck AS custkey, c_mktsegment,
         COALESCE(cnt, 0) AS n_orders
         FROM (SELECT o_custkey AS ck, COUNT(*) AS cnt
               FROM orders GROUP BY 1) o
         RIGHT OUTER JOIN (SELECT c_custkey AS ck, c_mktsegment
               FROM customer) c ON o.ck = c.ck
         ORDER BY custkey""",
    "q23_distinct_customers" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
         COUNT(*) AS n_orders FROM orders
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q24_union_balances" ->
      """SELECT side, COUNT(*) AS n,
         CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
         MIN(bal) AS min_bal, MAX(bal) AS max_bal
         FROM (SELECT 'customer' AS side, c_acctbal AS bal FROM customer
               UNION ALL
               SELECT 'supplier' AS side, s_acctbal AS bal FROM supplier)
         GROUP BY side ORDER BY side""",
    "q25_theta_nation_pairs" ->
      """SELECT a.n_name AS na, b.n_name AS nb FROM nation a, nation b
         WHERE a.n_nationkey < b.n_nationkey
           AND length(a.n_name) < length(b.n_name)
         ORDER BY na, nb""",
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         CAST($sumDisc AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_project" ->
      """SELECT p_partkey, upper(p_name) AS name_u,
         concat_ws('/', p_brand, p_type) AS brand_type,
         CAST(length(p_name) AS BIGINT) AS name_len, p_retailprice
         FROM part WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
         ORDER BY p_partkey""",
    "q3_top_orders" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
         o_orderpriority, CAST($sumDisc AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l_orderkey, order_day, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q5_nation_revenue" ->
      s"""SELECT n_name, CAST($sumDisc AS DOUBLE) AS revenue
         FROM region, nation, customer, orders, lineitem
         WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
           AND c_nationkey = n_nationkey AND o_custkey = c_custkey
           AND l_orderkey = o_orderkey
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q6_cust_without_orders" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q7_top_order_values" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q8_top_cust_per_nation" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
           FROM customer) WHERE rn <= 3
         ORDER BY c_nationkey, rn""",
    "q9_running_revenue" ->
      """SELECT l_suppkey, strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
         l_orderkey, l_linenumber,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_rev
         FROM lineitem WHERE l_suppkey <= 5
         ORDER BY l_suppkey, ship_day, l_orderkey, l_linenumber""",
    "q10_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS order_day,
         epoch_ns(o_orderdate) - epoch_ns(lag(o_orderdate, 1) OVER w)
           AS ns_since_prev,
         lead(o_orderkey, 1) OVER w AS next_orderkey
         FROM orders WHERE o_custkey <= 50
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, order_day, o_orderkey""",
    "q11_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         COALESCE(l_linestatus, 'ALL') AS linestatus,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q12_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         COALESCE(o_orderpriority, 'ALL') AS priority,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "q13_setops" ->
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
         ORDER BY o_custkey""",
    "q14_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'mid'
                     ELSE 'big' END AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
         FROM orders GROUP BY bucket ORDER BY bucket""",
    "q15_monthly_orders" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         FROM orders GROUP BY y, m ORDER BY y, m""",
    "q16_string_funcs" ->
      """SELECT split_part(p_name, ' ', 1) AS first_word, COUNT(*) AS n,
         CAST(MIN(length(p_name)) AS BIGINT) AS min_len,
         MAX(upper(p_name)) AS max_name_u
         FROM part GROUP BY first_word ORDER BY first_word""",
    "q17_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, sqrt(l_quantity) AS sqrt_qty,
         abs(l_quantity - 25) AS abs_dev,
         CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
         CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price
         FROM lineitem WHERE l_orderkey <= 100
         ORDER BY l_orderkey, l_linenumber""",
    "q18_json_events" ->
      """SELECT event_type, COUNT(*) AS n,
         MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
         MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q19_asof_last_event" ->
      """SELECT o_orderkey, COALESCE(
           (SELECT MAX(epoch_ns(e.ts)) FROM events e
            WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate),
           -1) AS last_ev_ns
         FROM orders o ORDER BY o_orderkey""",
    "q20_range_join_events" ->
      """SELECT o_orderkey, COUNT(e.event_id) AS n_ev
         FROM orders o LEFT JOIN events e
           ON e.user_id = o.o_custkey
          AND epoch_ns(e.ts) >= epoch_ns(o.o_orderdate)
          AND epoch_ns(e.ts) < epoch_ns(o.o_orderdate) + 86400000000000
         GROUP BY o_orderkey ORDER BY o_orderkey""",
  )
}
