package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-analytics tier: the product-analytics query family every
  * event warehouse runs daily — forward fill, time-grid resampling,
  * ordered funnels, cohort retention. The reference has no temporal
  * operators at all (its only inputs are static text files,
  * `/root/reference/src/mapreduce.c:190-205`), so this whole tier is
  * [ext] north-star surface; it exercises four Spark capabilities no
  * other declared query covers: IGNORE-NULLS window fill,
  * `sequence`/`explode` grid densification, stage-chained conditional
  * aggregation, and distinct-count cohort matrices.
  *
  * Timestamp discipline is the same as [[graft.streaming.EventOps]]:
  * the fixture's nanosecond timestamps truncate to microseconds in
  * both engines (`ts_ns DIV 1000` ↔ DuckDB `epoch_ns(ts) // 1000`),
  * so all bucketing is exact integer arithmetic on µs.
  */
object EventAnalytics {

  private val TsUsCol = "ts_ns DIV 1000"
  private val HourUs = 3600L * 1000 * 1000
  private val DayUs = 24L * HourUs

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  // ---------------------------------------------------------------
  // q45: forward fill (LOCF — last observation carried forward) via an
  // IGNORE-NULLS window: every event row carries the value of the SAME
  // user's most recent purchase at or before it (NULL until the first
  // purchase). This is the standard sparse→dense feature derivation
  // ("state of X as of each event") that sessionless scoring joins
  // need.
  //
  // Scale shape: ONE hash exchange on user_id, then a single sorted
  // pass per partition — `last(..., ignoreNulls)` over a running ROWS
  // frame evaluates incrementally (O(1) per row, no frame rescan).
  // The (us, event_id) order key is tie-free, so the fill is
  // deterministic across engines.
  def q45FillForward(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), expr(TsUsCol).as("us"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w).as("last_purchase_value"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------
  // q46: time-grid resampling — densify each user's event history to
  // a continuous daily grid between their first and last active day,
  // marking the gap days explicitly (n=0, is_gap). Downstream
  // time-series models need the regular grid, not the sparse log.
  //
  // Scale shape: two aggregates on the same user_id key (daily counts;
  // per-user span) — AQE reuses the exchange — then `explode(
  // sequence(d0, d1))` generates the grid WITHOUT a driver-side
  // calendar table or a cross join against one: grid size is
  // Σ_user span_days, linear in users, and generation is
  // partition-local on the already-shuffled span frame. The left join
  // back to counts keys on (user_id, day) — co-partitioned.
  def q46Resample(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      // Integral DIV, not `/`: a double quotient correctly rounded to
      // ~1e-12 relative error can cross a day boundary for events
      // within ~2 ms of midnight, flipping the bucket vs DuckDB's
      // integer `//`.
      .select(col("user_id"), expr(s"($TsUsCol) DIV $DayUs").as("day"))
    val perDay = e.groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"))
    val grid = e.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    grid.join(perDay, Seq("user_id", "day"), "left")
      .select(col("user_id"),
        date_format(timestamp_micros(col("day") * lit(DayUs)),
          "yyyy-MM-dd").as("day_str"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNull.as("is_gap"))
      .orderBy("user_id", "day_str")
  }

  // ---------------------------------------------------------------
  // q47: ordered funnel — how many users progress
  // signup → view → click → purchase where each stage happens AFTER
  // the previous stage's earliest completion and within a 24-hour
  // conversion window of it. The min-timestamp chaining (t2 = earliest
  // qualifying view after t1, …) is the standard strict-order funnel
  // definition; the step window is what makes it a funnel rather than
  // an EXISTS cascade (on this fixture: 150 → 39 → 16 → 5).
  //
  // Scale shape: each stage is (join on user_id) + (filter) + (min
  // aggregate on user_id) — every one of the four hops keys on
  // user_id, so the plan is a chain of co-partitioned exchanges over
  // shrinking frames (stage n+1's input ≤ stage n's users), never a
  // window over the full log. The 4-row output union aggregates each
  // stage frame independently; the lag() for conversion runs on a
  // 4-row frame.
  val FunnelStepUs: Long = DayUs

  def q47Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), col("event_type"), expr(TsUsCol).as("us"))
    def stage(prev: DataFrame, prevT: String, etype: String,
        outT: String): DataFrame =
      e.join(prev, Seq("user_id"))
        .filter(col("event_type") === etype && col("us") > col(prevT) &&
          col("us") <= col(prevT) + lit(FunnelStepUs))
        .groupBy("user_id").agg(min("us").as(outT))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("us").as("t1"))
    val s2 = stage(s1, "t1", "view", "t2")
    val s3 = stage(s2, "t2", "click", "t3")
    val s4 = stage(s3, "t3", "purchase", "t4")
    def cnt(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(
        lit(name).as("stage"), col("n_users"))
    val counts = cnt(s1, "1_signup")
      .unionByName(cnt(s2, "2_view"))
      .unionByName(cnt(s3, "3_click"))
      .unionByName(cnt(s4, "4_purchase"))
    val w = Window.orderBy("stage")
    counts
      .select(col("stage"), col("n_users"),
        (col("n_users").cast("double") /
          lag(col("n_users"), 1, null).over(w)).as("conv"))
      .orderBy("stage")
  }

  // ---------------------------------------------------------------
  // q48: cohort retention — users bucketed by their first-purchase
  // day (the cohort), counted distinct on each subsequent active-
  // purchase day offset. The (cohort_day × day_offset) matrix is THE
  // retention report; day granularity on the purchase subset keeps it
  // non-degenerate on this fixture (~40% daily purchase activity).
  //
  // Scale shape: first-touch aggregate on user_id, join back on
  // user_id (co-partitioned), then a distinct-count aggregate on the
  // (cohort, offset) key — whose cardinality is bounded by span²/2,
  // tiny; the expensive distinct runs as a two-phase partial
  // (user_id is already integer — no pre-hash needed).
  def q48CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"($TsUsCol) DIV $DayUs").as("day"))
    val first = e.groupBy("user_id").agg(min("day").as("cohort"))
    e.join(first, Seq("user_id"))
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .select(
        date_format(timestamp_micros(col("cohort") * lit(DayUs)),
          "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  // ---------------------------------------------------------------
  // q61: event-type TRANSITION MATRIX — first-order Markov counts and
  // probabilities over each user's time-ordered event stream (the
  // "what happens after an error?" product-analytics staple, and the
  // empirical transition model session-simulation needs).
  //
  // Hash-gate discipline: counts are integers; each probability is a
  // SINGLE division of two exactly-represented longs (the denominator
  // is a window SUM of counts — integer, associative), so every cell
  // is bit-identical across engines. The (us, event_id) order key is
  // tie-free, so lag() picks the same predecessor everywhere.
  //
  // Scale shape: one hash exchange on user_id for the lag pass, then
  // a partial-aggregated groupBy on (from, to) — at most |types|²
  // groups; the normalizing window runs over that tiny frame, never
  // the events.
  def q61Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wf = Window.partitionBy("from_type")
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr(TsUsCol).as("us"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") / sum("n").over(wf).cast("double"))
      .orderBy("from_type", "to_type")
  }

  // ---------------------------------------------------------------
  // q64: rolling 7-day distinct active users (the DAU/WAU board
  // metric). A sliding COUNT(DISTINCT) cannot partial-aggregate — the
  // naive collect_set-over-frame shape materializes every window's
  // full user set per row. Instead each distinct (user, active-day)
  // pair fans out to the ≤[[DauWindowDays]] report days it supports
  // (a bounded, shuffle-free explode), turning the rolling distinct
  // into a plain two-phase COUNT(DISTINCT) per report day.
  //
  // Report days past the corpus's last active day are clipped via a
  // broadcast 1-row max frame (q44's histogram-extent pattern — no
  // collect); days before the first active day cannot arise because
  // fan-out only moves forward.
  //
  // Scale shape: distinct on (user_id, day) with map-side partial
  // agg, ×7 narrow fan-out, then one distinct-aggregate exchange on
  // day — fan-out volume is bounded by 7×|user-days| regardless of
  // window length semantics, vs the frame shape's |days|×|window
  // users| state.
  def q64RollingDau(s: SparkSession, dir: String): DataFrame = {
    val ud = events(s, dir)
      .select(col("user_id"), expr(s"($TsUsCol) DIV $DayUs").as("day"))
      .distinct()
    val hi = ud.agg(max("day").as("max_day"))
    ud.select(col("user_id"),
        explode(sequence(col("day"),
          col("day") + lit(DauWindowDays - 1L))).as("day"))
      .crossJoin(broadcast(hi))
      .filter(col("day") <= col("max_day"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("dau7"))
      .orderBy("day")
  }

  /** Rolling-window length, in days. */
  val DauWindowDays = 7L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_fill_forward" -> q45FillForward,
    "q46_resample" -> q46Resample,
    "q47_funnel" -> q47Funnel,
    "q48_cohort_retention" -> q48CohortRetention,
    "q61_transitions" -> q61Transitions,
    "q64_rolling_dau" -> q64RollingDau,
  )

  // DuckDB oracles — µs integer bucketing identical to the Spark side.
  private val TsUs = "CAST(epoch_ns(ts) // 1000 AS BIGINT)"

  val oracles: Map[String, String] = Map(
    // DuckDB's window SUM(BIGINT) yields HUGEINT; the value is small
    // and exact, so the cast to DOUBLE produces the identical
    // denominator Spark divides by.
    "q61_transitions" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
           $TsUs AS us FROM events),
         l AS (SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY us, event_id) AS prev FROM e),
         c AS (SELECT prev AS from_type, event_type AS to_type,
           COUNT(*) AS n FROM l WHERE prev IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER (
             PARTITION BY from_type) AS DOUBLE) AS p
         FROM c ORDER BY from_type, to_type""",
    // Same fan-out construction: the inner `day + o AS day` rebinds
    // the column to the report day the pair supports.
    "q64_rolling_dau" ->
      s"""WITH ud AS (SELECT DISTINCT user_id, $TsUs // $DayUs AS day
           FROM events),
         g AS (SELECT user_id, day + o AS day
           FROM ud, range($DauWindowDays) t(o))
         SELECT day, COUNT(DISTINCT user_id) AS dau7 FROM g
         WHERE day <= (SELECT MAX(day) FROM ud)
         GROUP BY day ORDER BY day""",
    "q45_fill_forward" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, value,
           $TsUs AS us FROM events)
         SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
             IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
         FROM e ORDER BY event_id""",
    "q46_resample" ->
      s"""WITH e AS (SELECT user_id, $TsUs // $DayUs AS day FROM events),
         pd AS (SELECT user_id, day, COUNT(*) AS n FROM e GROUP BY 1, 2),
         sp AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
           FROM e GROUP BY 1),
         grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
           FROM sp)
         SELECT grid.user_id AS user_id,
           strftime(make_timestamp(grid.day * $DayUs), '%Y-%m-%d')
             AS day_str,
           COALESCE(pd.n, 0) AS n, (pd.n IS NULL) AS is_gap
         FROM grid LEFT JOIN pd
           ON grid.user_id = pd.user_id AND grid.day = pd.day
         ORDER BY user_id, day_str""",
    "q47_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, $TsUs AS us FROM events),
         s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
           WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id AS user_id, MIN(us) AS t2
           FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'view' AND us > t1
             AND us <= t1 + $FunnelStepUs GROUP BY 1),
         s3 AS (SELECT e.user_id AS user_id, MIN(us) AS t3
           FROM e JOIN s2 USING (user_id)
           WHERE event_type = 'click' AND us > t2
             AND us <= t2 + $FunnelStepUs GROUP BY 1),
         s4 AS (SELECT e.user_id AS user_id, MIN(us) AS t4
           FROM e JOIN s3 USING (user_id)
           WHERE event_type = 'purchase' AND us > t3
             AND us <= t3 + $FunnelStepUs GROUP BY 1),
         c AS (SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
           UNION ALL SELECT '2_view', COUNT(*) FROM s2
           UNION ALL SELECT '3_click', COUNT(*) FROM s3
           UNION ALL SELECT '4_purchase', COUNT(*) FROM s4)
         SELECT stage, n_users,
           CAST(n_users AS DOUBLE) / lag(n_users) OVER (ORDER BY stage)
             AS conv
         FROM c ORDER BY stage""",
    "q48_cohort_retention" ->
      s"""WITH e AS (SELECT user_id, $TsUs // $DayUs AS day FROM events
           WHERE event_type = 'purchase'),
         f AS (SELECT user_id, MIN(day) AS cohort FROM e GROUP BY 1)
         SELECT strftime(make_timestamp(cohort * $DayUs), '%Y-%m-%d')
             AS cohort_day,
           CAST(day - cohort AS BIGINT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_users
         FROM e JOIN f USING (user_id)
         GROUP BY cohort, day_offset ORDER BY cohort_day, day_offset""",
  )
}
