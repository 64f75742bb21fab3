package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** Round-2 relational additions (SURVEY.md §2.4 A6 / §2.6 / §2.7
  * completions): the ranking-window family, explicit GROUPING SETS,
  * the map/struct scalar family, and the skew-safe replicated-salt
  * join — each oracle-checked like the rest of [[Relational]].
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---------------------------------------------------------------
  // q31: ranking-window family — ntile / percent_rank / cume_dist /
  // nth_value / last over a per-nation total order. The intra-
  // partition order includes c_custkey so ranks are tie-free and both
  // engines agree exactly; percent_rank and cume_dist are single IEEE
  // divisions of exact integers, so doubles match bitwise.
  // Scale: one hash-partition exchange on c_nationkey; each window
  // evaluates in one pass over its sorted partition.
  def q31WindowFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).cast("long").as("tile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("c_custkey"), 2).over(wf).as("second_key"),
        last(col("c_custkey")).over(wf).as("last_key"))
      .orderBy(col("c_custkey"))
  }

  // q32: explicit GROUPING SETS with grouping() indicators — the
  // general form behind rollup (q11) and cube (q12): four explicit
  // sets, NULLs disambiguated by grouping() and coalesced before the
  // ORDER BY (sidesteps the engines' differing NULL sort defaults).
  def q32GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        COALESCE(o_orderstatus, 'ALL') AS status,
        CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
        CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        (o_orderpriority), (o_orderstatus), ())
      ORDER BY g_pri, g_st, priority, status""")
  }

  // q33: map/struct scalar family — build a map from strings
  // (str_to_map), extend it (map_concat), extract (element_at), and
  // round-trip struct fields. Output columns are plain scalars so the
  // oracle states the expected values directly; what's under test is
  // that Spark's complex-type functions compose to the identity.
  def q33MapStruct(s: SparkSession, dir: String): DataFrame = {
    val m = str_to_map(
      concat(lit("brand="), col("p_brand"), lit(",type="), col("p_type")),
      lit(","), lit("="))
    t(s, dir, "part")
      .select(col("p_partkey"), m.as("m"),
        struct(col("p_size").as("sz"), col("p_retailprice").as("pr"))
          .as("st"),
        length(col("p_name")).as("name_len_i"))
      .select(col("p_partkey"),
        element_at(col("m"), "brand").as("brand_v"),
        element_at(col("m"), "type").as("type_v"),
        size(col("m")).cast("long").as("n_keys"),
        array_join(array_sort(map_keys(col("m"))), "|").as("keys_sorted"),
        element_at(
          map_concat(col("m"),
            map(lit("len"), col("name_len_i").cast("string"))),
          "len").cast("long").as("name_len"),
        col("st").getField("sz").cast("long").as("struct_size"),
        col("st").getField("pr").as("struct_price"))
      .orderBy(col("p_partkey"))
  }

  // q34: skew-safe replicated-salt join (SkewTools.saltedJoin) — the
  // classic big⋈small hot-key recipe, here joining lineitem back to
  // its own 3-row per-returnflag aggregate (every lineitem row hits
  // one of 3 keys — total skew). The oracle is the PLAIN join: the
  // salt must never change the answer. The above/below-average
  // predicate cross-multiplies in exact decimal.
  def q34SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), money(col("l_quantity")).as("qty"))
    val fs = li.groupBy("l_returnflag")
      .agg(sum(col("qty")).as("s"), count(lit(1)).as("c"))
    SkewTools.saltedJoin(li, fs, "l_returnflag", salts = 8)
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("qty") * col("c") > col("s"), 1L).otherwise(0L))
          .as("n_above"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  // q35: volume shipping (TPC-H Q7 shape) — bilateral trade volume
  // between nation groups by ship year: lineitem joins BOTH ends of
  // the trade (supplier side and order→customer side), each end
  // resolved to a nation name, keeping ordered cross-nation pairs
  // within a 4-nation group (wider than Q7's 2-nation pair so the
  // smallest fixture still produces trade rows).
  // Plan shape at scale: lineitem⋈orders and orders⋈customer are the
  // big shuffle joins (AQE picks the strategy); nation is broadcast
  // twice (25 rows); the pair predicate prunes before the final
  // 2×years-cell aggregate. Revenue is the exact-decimal discount
  // fold from q1.
  val TradeNations: Seq[String] =
    Seq("NATION_1", "NATION_2", "NATION_3", "NATION_4")

  def q35VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation").isin(TradeNations: _*)
        && col("cust_nation").isin(TradeNations: _*)
        && col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  // q36: product-type profit (TPC-H Q9 shape, minus partsupp — the
  // fixture has no supply-cost table, so cost is modeled as 10% of
  // retail price × quantity). Profit per supplier nation per order
  // year over the '%red%' part slice. The part filter runs BEFORE its
  // join (predicate pushdown to the scan) and the filtered part side
  // broadcasts; nation broadcasts; lineitem⋈orders carries the bulk.
  def q36ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val redParts = t(s, dir, "part")
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), money(col("p_retailprice")).as("p_cost"))
    val amount =
      money(col("l_extendedprice")) * (one - rate(col("l_discount"))) -
        col("p_cost") * money(col("l_quantity")) * rate(lit(0.10))
    t(s, dir, "lineitem")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(amount).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  // q37: national market share (TPC-H Q8 shape) — NATION_3's share of
  // EUROPE-customer revenue per order year: two exact-decimal sums
  // (the conditional numerator via a decimal-typed CASE, the
  // denominator over all rows), divided once in double — the same
  // single-IEEE-division discipline as Exact.davg, so both engines
  // round identically.
  def q37MarketShare(s: SparkSession, dir: String): DataFrame = {
    val vol = money(col("l_extendedprice")) * (one - rate(col("l_discount")))
    val euroCust = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(euroCust, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0).cast(Exact.Money))).cast("double")
          / sum(vol).cast("double")).as("mkt_share"),
        dsum(vol).as("total_vol"))
      .orderBy("o_year")
  }

  // q38: RANGE-frame window — per customer, rolling 90-day spend: the
  // frame is defined by VALUE distance on the order-date day number
  // (all peers within 90 days precede), not by row count, so same-day
  // orders are frame-peers and the result is order-insensitive. This
  // is the one window-frame kind (rangeBetween on a numeric key) the
  // q9/q31 family didn't cover. Exact-decimal sum per frame, cast to
  // double once.
  def q38RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
    val w = Window.partitionBy("o_custkey").orderBy(col("d"))
      .rangeBetween(-90, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), day.as("d"),
        money(col("o_totalprice")).as("p"))
      .select(col("o_orderkey"), col("o_custkey"),
        sum(col("p")).over(w).cast("double").as("spend_90d"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------
  // q40: UNPIVOT — the wide→long melt, inverse of q29's pivot. A
  // per-returnflag aggregate (3 rows × 3 measure columns) melts into
  // (l_returnflag, measure, value) rows via the relational UNPIVOT
  // operator on both sides: Spark's `Dataset.unpivot` (planned as an
  // Expand — one pass, no join, no shuffle beyond the aggregate's)
  // and DuckDB's `UNPIVOT … INTO NAME … VALUE`. Measures are exact
  // decimal sums surfaced as double ([[Exact]] discipline) so the
  // melted value column is a single well-defined type.
  def q40Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(dsum(money(col("l_quantity"))).as("sum_qty"),
        dsum(money(col("l_extendedprice"))).as("sum_price"),
        dsum(money(col("l_extendedprice")) *
          (one - rate(col("l_discount")))).as("sum_disc_price"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc_price")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")

  // ---------------------------------------------------------------
  // q69: the SQL-SYNTAX twin of q40 — Spark 4 parses the relational
  // UNPIVOT clause natively (`… UNPIVOT (value FOR measure IN (…))`),
  // so the same wide→long melt is declared in pure SQL and must plan
  // to the same Expand as the Dataset.unpivot form (the gate that the
  // SQL surface and the typed surface are one operator, VERDICT r4
  // item 8). Same Exact-decimal measure discipline; same oracle shape
  // as q40.
  def q69UnpivotSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(s"""
      SELECT l_returnflag, measure, value FROM (
        SELECT l_returnflag,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
            AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
            AS sum_price,
          CAST($sumDisc AS DOUBLE) AS sum_disc_price
        FROM lineitem GROUP BY l_returnflag
      ) UNPIVOT (value FOR measure IN (sum_qty, sum_price,
        sum_disc_price))
      ORDER BY l_returnflag, measure""")
  }

  // ---------------------------------------------------------------
  // q41: data PROFILING — the ANALYZE-style per-column statistics
  // table (row count, null count, exact distinct count, min/max)
  // every catalog/maintenance layer computes before planning or
  // after ingest. Min/max stay TYPED (numeric → double, string →
  // string, date → canonical yyyy-MM-dd text) rather than forcing
  // everything through a lossy to-string cast, so the gate is exact.
  //
  // Plan shape (re-engineered after an sf1 adjudication): the
  // original single-pass form used one aggregate with six
  // `count_distinct`s, which Catalyst plans as an Expand — every row
  // replicated ×6 into one 6M×6-entry partial-dedup hash aggregate;
  // at sf1 that hash table (dominated by the near-unique l_orderkey
  // replicas dragging five null'd columns each) measured 150–400 s.
  // The profile is now one aggregate PER COLUMN, unioned: each pass
  // scans only its own column (parquet column pruning — ReadSchema
  // is single-column, so at 100 TB the six passes together read the
  // same bytes the fused pass did), each distinct dedups only its
  // own values with map-side partial aggregation, and no row is ever
  // replicated. sf1: 406 s → 5.2 s. "One scan, all columns" is only
  // the right shape when the aggregate doesn't multiply the input.
  private val ProfileCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "num", "l_quantity" -> "num",
    "l_extendedprice" -> "num", "l_returnflag" -> "str",
    "l_linestatus" -> "str", "l_shipdate" -> "date")

  def q41Profile(s: SparkSession, dir: String): DataFrame = {
    val perCol = ProfileCols.map { case (c, kind) =>
      val (mn, mx) = kind match {
        case "num" => (min(col(c)).cast("double"),
          max(col(c)).cast("double"))
        case "str" => (min(col(c)), max(col(c)))
        case _ => (date_format(min(col(c)), "yyyy-MM-dd"),
          date_format(max(col(c)), "yyyy-MM-dd"))
      }
      val isNum = kind == "num"
      t(s, dir, "lineitem")
        .select(col(c))
        .agg(count(lit(1)).as("n"), count(col(c)).as("nn"),
          count_distinct(col(c)).as("n_distinct"),
          mn.as("mn"), mx.as("mx"))
        .select(lit(c).as("column"), col("n"),
          (col("n") - col("nn")).as("n_null"), col("n_distinct"),
          (if (isNum) col("mn") else lit(null).cast("double"))
            .as("min_num"),
          (if (isNum) col("mx") else lit(null).cast("double"))
            .as("max_num"),
          (if (isNum) lit(null).cast("string") else col("mn"))
            .as("min_str"),
          (if (isNum) lit(null).cast("string") else col("mx"))
            .as("max_str"))
    }
    perCol.reduce(_ unionByName _).orderBy("column")
  }

  // ---------------------------------------------------------------
  // q42: MERGE / UPSERT — the lakehouse table-maintenance operator
  // (MERGE INTO base USING changes): a change batch carrying
  // update / delete / insert ops is applied to the customer base in
  // one pass. Spark has no MERGE statement outside table-format
  // extensions, so this is the operator re-expressed Spark-first —
  // exactly the join shape those extensions plan underneath:
  //
  //   base  LEFT JOIN changes(update|delete)  → drop deletes, patch
  //                                             updates,
  //   UNION ALL changes(insert)               → append new keys.
  //
  // (Probed on Spark 4.1: the parser accepts MERGE INTO, but
  // execution requires a v2 catalog whose tables implement row-level
  // operations — `[UNSUPPORTED_FEATURE.TABLE_OPERATION]` against any
  // built-in source — so this join re-expression IS the executable
  // surface without a lakehouse-format dependency; the q69 UNPIVOT
  // twin covers the SQL-syntax side of VERDICT r4 item 8.)
  //
  // The change batch is derived deterministically from the base
  // (update ≡ 0 mod 7: acctbal += 100; delete ≡ 3 mod 11; insert: a
  // shifted key +1e6 per ≡ 5 mod 13 source row) so both engines build
  // the identical batch with no side fixture. Balance arithmetic in
  // exact decimal, surfaced as double once.
  //
  // Scale shape: ONE shuffle join keyed on c_custkey (changes are
  // small relative to base → broadcast in practice; left as a shuffle
  // join here so the shape also covers the big-changes case), plus a
  // union — no window, no second pass over base.
  def q42MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
    val upd = base.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        (money(col("c_acctbal")) + money(lit(100.00)))
          .as("new_bal"), lit("update").as("op"))
    val del = base.filter(col("c_custkey") % 11 === 3 &&
        col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey"), lit(null).cast(Money).as("new_bal"),
        lit("delete").as("op"))
    val ins = base.filter(col("c_custkey") % 13 === 5)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("NEW Customer#"), col("c_custkey").cast("string"))
          .as("c_name"),
        lit(0.0).cast(Money).cast("double").as("c_acctbal"),
        lit("inserted").as("src"))
    val merged = base
      .join(upd.unionByName(del), Seq("c_custkey"), "left")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(col("c_custkey"), col("c_name"),
        when(col("op") === "update", col("new_bal").cast("double"))
          .otherwise(col("c_acctbal")).as("c_acctbal"),
        when(col("op") === "update", lit("updated"))
          .otherwise(lit("base")).as("src"))
    merged.unionByName(ins).orderBy("c_custkey")
  }

  // ---------------------------------------------------------------
  // q43: statistical aggregates — stddev / variance / correlation per
  // group, computed the only way a float fold can be oracle-exact:
  // the MOMENTS (Σx, Σx², Σy, Σy², Σxy) accumulate in exact decimal
  // (order-insensitive, so partition scheduling cannot move the
  // result), and the statistics derive from them in ONE deterministic
  // double expression per value. Spark's built-in `stddev`/`corr`
  // fold doubles in arrival order — bit-unstable across runs, let
  // alone engines — which is why they cannot be hash-gated directly;
  // the moment form is the mergeable partial-aggregate shape a
  // distributed engine wants anyway (same partial/final tree as sum).
  // The variable pair is (quantity, discount), both value-bounded, so
  // every moment stays under ~1e15 scaled quanta through sf10 —
  // inside double's 2^53 exact range; the decimal→double casts are
  // exact and both engines' IEEE arithmetic agrees bitwise.
  // (price² moments would overflow the exact range at sf0.01 already,
  // where the two engines' decimal→double rounding paths can differ
  // by an ulp — the same reason the built-ins aren't gateable.)
  def q43StatsAgg(s: SparkSession, dir: String): DataFrame = {
    val qty = money(col("l_quantity"))
    val dsc = rate(col("l_discount"))
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(qty).cast("double").as("sx"),
        sum(qty * qty).cast("double").as("sxx"),
        sum(dsc).cast("double").as("sy"),
        sum(dsc * dsc).cast("double").as("syy"),
        sum(qty * dsc).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        (col("sx") / col("n")).as("mean_qty"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n") * (col("n") - lit(1)))).as("stddev_qty"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_qty_disc"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------
  // q44: equi-width HISTOGRAM — the other half of profiling (q41
  // gives the endpoints, this gives the shape): l_extendedprice
  // bucketed into HistBuckets equal-width bins between the observed
  // min/max. Bucketing is EXACT integer arithmetic on the decimal's
  // cent quanta — bucket = (v−min)·B div (max−min+ε) with ε = one
  // cent so the max value lands in bucket B−1 — because a double
  // `(v-min)/(max-min)*B` floors differently at bin edges across
  // engines (the ulp-at-boundary class the Exact discipline exists
  // for).
  //
  // Scale shape: pass 1 computes (min, max) — a 2-value aggregate;
  // pass 2 buckets and counts with map-side partial aggregation on
  // ≤B keys. The min/max scalar joins in as a broadcast 1-row frame,
  // NOT a collected driver value, so the whole thing is one job and
  // the scan stays distributed.
  val HistBuckets = 10L

  def q44Histogram(s: SparkSession, dir: String): DataFrame = {
    val cents = (money(col("l_extendedprice")) * lit(100))
      .cast("long")
    val li = t(s, dir, "lineitem").select(cents.as("c"))
    val mm = li.agg(min("c").as("cmin"), max("c").as("cmax"))
    li.crossJoin(broadcast(mm))
      .select(expr(s"((c - cmin) * $HistBuckets) div (cmax - cmin + 1)")
        .as("bucket"), col("cmin"), col("cmax"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), first(col("cmin")).as("cmin"),
        first(col("cmax")).as("cmax"))
      // reconstruct the bin's lower edge in cents — integral div, not
      // `/` (long `/` is double division in Spark)
      .select(col("bucket"),
        (expr(s"cmin + (bucket * (cmax - cmin + 1)) div $HistBuckets")
          .cast("double") / 100.0).as("lo_value"),
        col("n"))
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------
  // q59: per-brand Pareto SKYLINE — within each p_brand, the parts no
  // other part of the brand dominates (dominates = price ≤ AND size ≥
  // with at least one strict). The multi-objective frontier query
  // (Börzsönyi et al., ICDE '01) that product/offer pipelines run;
  // nothing else in the registry exercises dominance semantics.
  //
  // Shape: the O(n²) NOT-EXISTS self-join (which the oracle runs —
  // fine at DuckDB fixture scale) is replaced by the sweep-line
  // identity: a part is on the frontier iff its size equals its
  // brand+price group's max AND that max strictly exceeds every
  // max at a strictly lower price in the brand. So: (1) aggregate to
  // one row per (brand, price) — the massive reducer; (2) a
  // rows-frame prefix max over the per-brand price-sorted groups
  // (strict prefix ⇒ "strictly cheaper", since each row is a distinct
  // price); (3) semi-join survivors back to recover part rows.
  //
  // Hash-gate discipline: price is compared and equi-joined, never
  // arithmetic'd, so double is safe; everything else is int/long.
  //
  // Scale shape: one partial-aggregated shuffle on (brand, price);
  // the window partitions BY BRAND (parallel, never a single global
  // partition); the survivor set is frontier-sized, so the final join
  // broadcasts. The part scan reads 4 columns (pruned).
  def q59Skyline(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select(col("p_brand"), col("p_partkey"),
      col("p_retailprice"), col("p_size").cast("long").as("p_size"))
    val grp = p.groupBy("p_brand", "p_retailprice")
      .agg(max("p_size").as("gmax"))
    val w = Window.partitionBy("p_brand").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = grp
      .withColumn("pmax", max("gmax").over(w))
      .filter(col("pmax").isNull || col("gmax") > col("pmax"))
      .select(col("p_brand"), col("p_retailprice"),
        col("gmax").as("p_size"))
    p.join(broadcast(frontier),
        Seq("p_brand", "p_retailprice", "p_size"))
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("p_size"))
      .orderBy("p_brand", "p_retailprice", "p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_range_frame" -> q38RangeFrame,
    "q59_skyline" -> q59Skyline,
    "q40_unpivot" -> q40Unpivot,
    "q69_unpivot_sql" -> q69UnpivotSql,
    "q41_profile" -> q41Profile,
    "q42_merge_upsert" -> q42MergeUpsert,
    "q43_stats_agg" -> q43StatsAgg,
    "q44_histogram" -> q44Histogram,
    "q31_window_family" -> q31WindowFamily,
    "q32_grouping_sets" -> q32GroupingSets,
    "q33_map_struct" -> q33MapStruct,
    "q34_salted_join" -> q34SaltedJoin,
    "q35_volume_shipping" -> q35VolumeShipping,
    "q36_product_profit" -> q36ProductProfit,
    "q37_market_share" -> q37MarketShare,
  )

  // Shared exact-decimal revenue fold, same as Relational.sumDisc.
  private val sumDisc =
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"
  private val volExpr =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  val oracles: Map[String, String] = Map(
    "q40_unpivot" ->
      s"""WITH a AS (SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_price,
         CAST($sumDisc AS DOUBLE) AS sum_disc_price
         FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, measure, value
         FROM (UNPIVOT a ON sum_qty, sum_price, sum_disc_price
           INTO NAME measure VALUE value)
         ORDER BY l_returnflag, measure""",
    // Same melt as q40 — the gate is that Spark's native UNPIVOT SQL
    // clause produces the identical long table.
    "q69_unpivot_sql" ->
      s"""WITH a AS (SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_price,
         CAST($sumDisc AS DOUBLE) AS sum_disc_price
         FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, measure, value
         FROM (UNPIVOT a ON sum_qty, sum_price, sum_disc_price
           INTO NAME measure VALUE value)
         ORDER BY l_returnflag, measure""",
    "q44_histogram" ->
      s"""WITH c AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2))
           * 100 AS BIGINT) AS c FROM lineitem),
         mm AS (SELECT MIN(c) AS cmin, MAX(c) AS cmax FROM c),
         b AS (SELECT ((c - cmin) * $HistBuckets) // (cmax - cmin + 1)
             AS bucket, cmin, cmax FROM c, mm)
         SELECT bucket,
           CAST(cmin + (bucket * (cmax - cmin + 1)) // $HistBuckets
             AS DOUBLE) / 100.0 AS lo_value,
           COUNT(*) AS n
         FROM b GROUP BY bucket, cmin, cmax ORDER BY bucket""",
    "q43_stats_agg" ->
      """WITH a AS (SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))
             * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS syy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n, sx / n AS mean_qty,
           sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_qty,
           (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx)
             * sqrt(n * syy - sy * sy)) AS corr_qty_disc
         FROM a ORDER BY l_returnflag""",
    "q42_merge_upsert" ->
      """WITH upd AS (SELECT c_custkey,
           CAST(c_acctbal AS DECIMAL(12,2))
             + CAST(100.00 AS DECIMAL(12,2)) AS new_bal,
           'update' AS op FROM customer WHERE c_custkey % 7 = 0),
         del AS (SELECT c_custkey, CAST(NULL AS DECIMAL(12,2)) AS new_bal,
           'delete' AS op FROM customer
           WHERE c_custkey % 11 = 3 AND c_custkey % 7 <> 0),
         ch AS (SELECT * FROM upd UNION ALL SELECT * FROM del),
         m AS (SELECT b.c_custkey, b.c_name,
           CASE WHEN ch.op = 'update' THEN CAST(ch.new_bal AS DOUBLE)
                ELSE b.c_acctbal END AS c_acctbal,
           CASE WHEN ch.op = 'update' THEN 'updated'
                ELSE 'base' END AS src
           FROM customer b LEFT JOIN ch USING (c_custkey)
           WHERE ch.op IS NULL OR ch.op <> 'delete'),
         ins AS (SELECT c_custkey + 1000000 AS c_custkey,
           'NEW Customer#' || CAST(c_custkey AS VARCHAR) AS c_name,
           CAST(0.0 AS DOUBLE) AS c_acctbal, 'inserted' AS src
           FROM customer WHERE c_custkey % 13 = 5)
         SELECT c_custkey, c_name, c_acctbal, src FROM m
         UNION ALL SELECT c_custkey, c_name, c_acctbal, src FROM ins
         ORDER BY c_custkey""",
    "q41_profile" -> {
      def row(c: String, kind: String): String = {
        val (mnN, mxN, mnS, mxS) = kind match {
          case "num" => (s"CAST(MIN($c) AS DOUBLE)",
            s"CAST(MAX($c) AS DOUBLE)", "CAST(NULL AS VARCHAR)",
            "CAST(NULL AS VARCHAR)")
          case "str" => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"MIN($c)", s"MAX($c)")
          case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"strftime(MIN($c), '%Y-%m-%d')",
            s"strftime(MAX($c), '%Y-%m-%d')")
        }
        s"""SELECT '$c' AS "column", COUNT(*) AS n,
           COUNT(*) - COUNT($c) AS n_null,
           COUNT(DISTINCT $c) AS n_distinct,
           $mnN AS min_num, $mxN AS max_num,
           $mnS AS min_str, $mxS AS max_str FROM lineitem"""
      }
      Seq("l_orderkey" -> "num", "l_quantity" -> "num",
        "l_extendedprice" -> "num", "l_returnflag" -> "str",
        "l_linestatus" -> "str", "l_shipdate" -> "date")
        .map { case (c, k) => row(c, k) }
        .mkString("", " UNION ALL ", " ORDER BY \"column\"")
    },
    // The oracle is the definition itself: dominance as NOT EXISTS —
    // quadratic within brand, which DuckDB handles at fixture scale;
    // the Spark side's sweep-line plan must reproduce it exactly.
    "q59_skyline" ->
      """SELECT p_brand, p_partkey, p_retailprice,
         CAST(p_size AS BIGINT) AS p_size
         FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM part q
           WHERE q.p_brand = p.p_brand
             AND q.p_retailprice <= p.p_retailprice
             AND q.p_size >= p.p_size
             AND (q.p_retailprice < p.p_retailprice
               OR q.p_size > p.p_size))
         ORDER BY p_brand, p_retailprice, p_partkey""",
    "q38_range_frame" ->
      """SELECT o_orderkey, o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY date_diff('day', DATE '1995-01-01',
             CAST(o_orderdate AS DATE))
           RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS spend_90d
         FROM orders ORDER BY o_orderkey""",
    "q35_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST($sumDisc AS DOUBLE) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
           AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
           AND n1.n_name <> n2.n_name
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q36_product_profit" ->
      s"""SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM($volExpr
           - CAST(p_retailprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))
             * CAST(0.10 AS DECIMAL(4,2))) AS DOUBLE) AS profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    "q37_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN $volExpr
             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST($sumDisc AS DOUBLE) AS mkt_share,
         CAST($sumDisc AS DOUBLE) AS total_vol
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'EUROPE'
         GROUP BY 1 ORDER BY o_year""",
    "q31_window_family" ->
      """SELECT c_custkey, c_nationkey,
         CAST(ntile(4) OVER w AS BIGINT) AS tile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         nth_value(c_custkey, 2) OVER wf AS second_key,
         last_value(c_custkey) OVER wf AS last_key
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY c_acctbal, c_custkey),
           wf AS (PARTITION BY c_nationkey
             ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY c_custkey""",
    "q32_grouping_sets" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
         COALESCE(o_orderstatus, 'ALL') AS status,
         CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
         CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
           (o_orderpriority), (o_orderstatus), ())
         ORDER BY g_pri, g_st, priority, status""",
    "q33_map_struct" ->
      """SELECT p_partkey, p_brand AS brand_v, p_type AS type_v,
         CAST(2 AS BIGINT) AS n_keys,
         'brand|type' AS keys_sorted,
         CAST(length(p_name) AS BIGINT) AS name_len,
         CAST(p_size AS BIGINT) AS struct_size,
         p_retailprice AS struct_price
         FROM part ORDER BY p_partkey""",
    "q34_salted_join" ->
      """WITH fs AS (SELECT l_returnflag,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s, COUNT(*) AS c
           FROM lineitem GROUP BY l_returnflag)
         SELECT l.l_returnflag,
           CAST(COUNT(*) FILTER (
             CAST(l.l_quantity AS DECIMAL(12,2)) * fs.c > fs.s)
             AS BIGINT) AS n_above,
           COUNT(*) AS n
         FROM lineitem l JOIN fs USING (l_returnflag)
         GROUP BY l.l_returnflag ORDER BY l.l_returnflag""",
  )
}
