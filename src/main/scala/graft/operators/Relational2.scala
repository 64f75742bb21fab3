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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_window_family" -> q31WindowFamily,
    "q32_grouping_sets" -> q32GroupingSets,
    "q33_map_struct" -> q33MapStruct,
    "q34_salted_join" -> q34SaltedJoin,
  )

  val oracles: Map[String, String] = Map(
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
