package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Streaming tier over the `events` fixture (north-star [ext];
  * entirely absent in the reference, which is single-file batch —
  * SURVEY.md §2.9).
  *
  * The same transforms run in BOTH execution modes — that is
  * Structured Streaming's contract and the reason this module is
  * plain `DataFrame => DataFrame` functions:
  *
  *  - batch: [[tumblingHour]] / [[slidingHalfHour]] / [[sessionAgg]]
  *    applied to the parquet table, DuckDB-oracle-checked
  *    (`st_*` queries below);
  *  - streaming: the exact same functions applied to a
  *    `readStream`/`MemoryStream` source in `EventsStreamingSpec`,
  *    plus the streaming-only surfaces (watermarks, append-mode
  *    finalization, `dropDuplicatesWithinWatermark`, and
  *    `flatMapGroupsWithState` sessionization) which have no batch
  *    oracle and are spec-tested instead.
  *
  * Scale shape: tumbling/sliding aggregation is hash-partitioned by
  * (window, key) with partial aggregation; session windows shuffle by
  * user then sort-merge locally; state stores are per-key and bounded
  * by the watermark — the standard Structured Streaming story, which
  * is exactly what holds at 100 TB/day ingest.
  *
  * All value sums go through decimal (the fixture `value` has 2
  * decimal digits) per the [[graft.operators.Exact]] discipline.
  */
object EventOps {

  private val Val = DecimalType(14, 2)

  /** Tumbling 1-hour windows: count + min/max + exact sum of value. */
  def tumblingHour(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Val)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("event_type"), col("n"),
        col("sum_value"), col("min_value"), col("max_value"))

  /** Sliding 1-hour windows every 30 minutes (each event lands in 2). */
  def slidingHalfHour(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Val)).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("n"), col("sum_value"))

  /** Per-user session windows with a 30-minute inactivity gap. */
  def sessionAgg(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Val)).cast("double").as("sum_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"), col("n_events"), col("sum_value"))

  // -----------------------------------------------------------------
  // Batch entry points (the driver's oracle gate runs these).
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  def stTumbling(s: SparkSession, dir: String): DataFrame =
    tumblingHour(events(s, dir))
      .orderBy("window_start", "event_type")

  def stSliding(s: SparkSession, dir: String): DataFrame =
    slidingHalfHour(events(s, dir))
      .orderBy("window_start")

  def stSession(s: SparkSession, dir: String): DataFrame =
    sessionAgg(events(s, dir))
      .orderBy("user_id", "session_start")

  /** Event-time INTERVAL JOIN — the batch twin of the stream-stream
    * join surface (EventsStreamingSpec proves the same join shape
    * under watermarks on two streams): every `view` event matched to
    * the SAME user's `purchase` events within the 30 minutes after
    * it. Attribution — which purchases followed an ad view — is the
    * canonical use.
    *
    * Scale shape: an equi-join on user_id with the time window as a
    * residual range predicate — NOT a theta join; the shuffle keys on
    * user_id, so it broadcasts nothing, AQE can skew-split a hot
    * user, and in streaming mode the watermark bounds both join
    * buffers (state ≤ 30 min + delay per side). Distinct from
    * `q20_range_join_events` (bucketed value-range join against a
    * dimension); this is the two-event-stream temporal shape.
    * Microsecond integer arithmetic end to end: the fixture's ns
    * timestamps truncate to µs in BOTH readers (`ts_ns DIV 1000` ↔
    * DuckDB `epoch_ns(ts) // 1000` — DuckDB's TIMESTAMP is µs), so
    * µs is the exact common precision and the gate is bit-exact.
    */
  val AttributionWindowUs: Long = 30L * 60 * 1000 * 1000

  def stIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        expr("ts_ns DIV 1000").as("v_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        expr("ts_ns DIV 1000").as("p_us"), col("value").as("purchase_value"))
    v.join(p, Seq("user_id"))
      .filter(col("p_us") >= col("v_us") &&
        col("p_us") <= col("v_us") + AttributionWindowUs)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (col("p_us") - col("v_us")).as("lag_us"), col("purchase_value"))
      .orderBy("user_id", "view_id", "purchase_id")
  }

  /** LEFT OUTER variant of [[stIntervalJoin]] — attribution with the
    * non-converting views kept (purchase columns null). The streaming
    * twin is the harder operator: an outer stream-stream join can
    * only emit the null-extended row once the watermark proves no
    * matching purchase can still arrive, i.e. unmatched state is held
    * exactly `window + delay` and then evicted with a null join —
    * EventsStreamingSpec gates that emission timing on MemoryStreams.
    * Batch semantics (this query) are the plain left outer; the
    * shuffle still keys on user_id only, same as the inner form.
    */
  def stIntervalLeft(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        expr("ts_ns DIV 1000").as("v_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        expr("ts_ns DIV 1000").as("p_us"), col("value").as("purchase_value"))
    v.join(p, col("user_id") === col("p_user") &&
        col("p_us") >= col("v_us") &&
        col("p_us") <= col("v_us") + AttributionWindowUs, "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (col("p_us") - col("v_us")).as("lag_us"), col("purchase_value"))
      .orderBy(asc_nulls_first("user_id"), asc_nulls_first("view_id"),
        asc_nulls_first("purchase_id"))
  }

  /** STREAM-STATIC enrichment join — the standard ingest shape where
    * a fact stream is decorated with slowly-changing dimensions before
    * aggregation: events joined to the static customer → nation chain,
    * then tumbling-hour spend per nation. Written as a
    * `DataFrame => DataFrame` transform over the event side so the
    * SAME function runs in batch (this oracle gate) and as a
    * streaming query (EventsStreamingSpec diffs a readStream run
    * against this batch answer).
    *
    * Scale shape: the dimension side is BROADCAST (stream-static joins
    * are stateless in Structured Streaming — no watermark, no join
    * state; each micro-batch hash-probes the dim), so the only
    * shuffle is the windowed aggregate's partial/final exchange on
    * (window, nation). At 100 TB/day the dim table re-broadcasts per
    * batch — the documented trade: for dims too big to broadcast the
    * recipe becomes a pre-bucketed shuffle join, which this module's
    * batch form would plan automatically once the hint is dropped.
    */
  def staticEnrich(ev: DataFrame, cust: DataFrame,
      nat: DataFrame): DataFrame =
    ev.join(broadcast(cust.select(col("c_custkey").as("user_id"),
        col("c_nationkey"))), "user_id")
      .join(broadcast(nat.select(col("n_nationkey").as("c_nationkey"),
        col("n_name"))), "c_nationkey")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Val)).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("n_name"), col("n"), col("sum_value"))

  def stStaticEnrich(s: SparkSession, dir: String): DataFrame =
    staticEnrich(events(s, dir), Tables(s, dir, "customer"),
      Tables(s, dir, "nation"))
      .orderBy("window_start", "n_name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_static_enrich" -> stStaticEnrich,
    "st_tumbling_hour" -> stTumbling,
    "st_sliding_halfhour" -> stSliding,
    "st_session_30m" -> stSession,
    "st_interval_join" -> stIntervalJoin,
    "st_interval_left" -> stIntervalLeft,
  )

  // ---------------------------------------------------------------
  // DuckDB oracles. The fixture `ts` is TIMESTAMP(ns); Spark reads it
  // as int64 nanos and truncates to microseconds (Tables.apply), so
  // the oracles bucket on the micro-truncated timestamp too —
  // epoch_ns(ts) // 1000 microseconds — to keep boundary behavior
  // identical.
  private val TsUs = "CAST(epoch_ns(ts) // 1000 AS BIGINT)"
  private val HourUs = 3600L * 1000 * 1000
  private val HalfUs = 1800L * 1000 * 1000

  private def fmtUs(expr: String) =
    s"strftime(make_timestamp($expr), '%Y-%m-%d %H:%M:%S')"

  val oracles: Map[String, String] = Map(
    "st_static_enrich" ->
      s"""WITH e AS (SELECT $TsUs AS us, user_id, value FROM events),
         j AS (SELECT us, value, n_name FROM e
           JOIN customer ON user_id = c_custkey
           JOIN nation ON c_nationkey = n_nationkey)
         SELECT ${fmtUs(s"us // $HourUs * $HourUs")} AS window_start,
           n_name, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         FROM j GROUP BY 1, 2 ORDER BY window_start, n_name""",
    "st_interval_join" ->
      s"""WITH v AS (SELECT user_id, event_id AS view_id,
           $TsUs AS v_us FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, event_id AS purchase_id,
           $TsUs AS p_us, value AS purchase_value
           FROM events WHERE event_type = 'purchase')
         SELECT v.user_id, view_id, purchase_id,
           CAST(p_us - v_us AS BIGINT) AS lag_us, purchase_value
         FROM v JOIN p ON v.user_id = p.user_id
           AND p_us >= v_us AND p_us <= v_us + $AttributionWindowUs
         ORDER BY v.user_id, view_id, purchase_id""",
    "st_interval_left" ->
      s"""WITH v AS (SELECT user_id, event_id AS view_id,
           $TsUs AS v_us FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id AS p_user, event_id AS purchase_id,
           $TsUs AS p_us, value AS purchase_value
           FROM events WHERE event_type = 'purchase')
         SELECT user_id, view_id, purchase_id,
           CAST(p_us - v_us AS BIGINT) AS lag_us, purchase_value
         FROM v LEFT JOIN p ON user_id = p_user
           AND p_us >= v_us AND p_us <= v_us + $AttributionWindowUs
         ORDER BY user_id NULLS FIRST, view_id NULLS FIRST,
           purchase_id NULLS FIRST""",
    "st_tumbling_hour" ->
      s"""WITH e AS (SELECT $TsUs AS us, event_type, value FROM events)
         SELECT ${fmtUs(s"us // $HourUs * $HourUs")} AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
         FROM e GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "st_sliding_halfhour" ->
      s"""WITH e AS (SELECT $TsUs AS us, value FROM events),
         x AS (SELECT unnest([us // $HalfUs * $HalfUs,
             us // $HalfUs * $HalfUs - $HalfUs]) AS ws, value FROM e)
         SELECT ${fmtUs("ws")} AS window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         FROM x GROUP BY ws ORDER BY window_start""",
    "st_session_30m" ->
      s"""WITH e AS (SELECT user_id, $TsUs AS us, value FROM events),
         g AS (SELECT user_id, us, value,
           CASE WHEN us - lag(us) OVER w >= $HalfUs OR
             lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         sid AS (SELECT user_id, us, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM g)
         SELECT user_id, ${fmtUs("MIN(us)")} AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         FROM sid GROUP BY user_id, sess
         ORDER BY user_id, session_start""",
  )
}
