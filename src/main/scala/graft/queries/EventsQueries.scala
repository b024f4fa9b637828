package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.Events

/** Declared event-stream queries (batch formulations of the streaming
  * surface). Window starts are emitted as formatted strings so the
  * hash compare is immune to timestamp-precision differences (fixture
  * ns vs Spark µs). All five are DuckDB-oracle-checked.
  */
object EventsQueries {
  private val Fmt = "yyyy-MM-dd HH:mm:ss"
  private val DuckFmt = "%Y-%m-%d %H:%M:%S"

  def window(s: SparkSession, dir: String): DataFrame =
    Events.tumbling(Tables.events(s, dir))
      .select(date_format(col("window_start"), Fmt).as("window_start"),
        col("event_type"), col("n"), round(col("sum_value"), 6).as("sum_value"))
      .orderBy("window_start", "event_type")

  def windowSliding(s: SparkSession, dir: String): DataFrame =
    Events.sliding(Tables.events(s, dir))
      .select(date_format(col("window_start"), Fmt).as("window_start"),
        col("event_type"), col("n"), round(col("sum_value"), 6).as("sum_value"))
      .orderBy("window_start", "event_type")

  def session(s: SparkSession, dir: String): DataFrame =
    Events.sessionize(Tables.events(s, dir))
      .select(col("user_id"), col("session_id"),
        date_format(col("session_start"), Fmt).as("session_start"),
        date_format(col("session_end"), Fmt).as("session_end"),
        col("n_events"), round(col("sum_value"), 6).as("sum_value"))
      .orderBy("user_id", "session_id")

  def sessionWindowQ(s: SparkSession, dir: String): DataFrame =
    Events.sessionWindow(Tables.events(s, dir))
      .select(col("user_id"),
        date_format(col("session_start"), Fmt).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  def sequenceMatchQ(s: SparkSession, dir: String): DataFrame =
    Events.sequenceMatch(Tables.events(s, dir))
      .select(col("user_id"), col("n_pairs"))
      .orderBy("user_id")

  def funnelQ(s: SparkSession, dir: String): DataFrame =
    Events.funnel(Tables.events(s, dir))
      .select(col("user_id"), col("n_signups"), col("n_converted"))
      .orderBy("user_id")

  def json(s: SparkSession, dir: String): DataFrame =
    Events.jsonAgg(Tables.events(s, dir))
      .select(col("event_type"), col("n"), col("sum_k"),
        round(col("avg_k"), 6).as("avg_k"))
      .orderBy("event_type")

  /** Key-skew report ([[graft.operators.Skew.keySkewReport]]) on the
    * event stream's user_id — the pre-salting observability pass:
    * heaviest 10 keys, their row share and their ratio to the mean
    * key load, both integer permille. */
  def skewReport(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.keySkewReport(Tables.events(s, dir), "user_id", 10)

  def topUsers(s: SparkSession, dir: String): DataFrame =
    Events.topUsers(Tables.events(s, dir))
      .select(col("user_id"), round(col("total_value"), 6).as("total_value"),
        col("n_events"))

  def runningTotal(s: SparkSession, dir: String): DataFrame =
    Events.runningTotals(Tables.events(s, dir))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), Fmt).as("ts"),
        col("n_so_far"),
        round(col("value_so_far") * 100).cast("long").as("value_cents_so_far"))
      .orderBy("user_id", "event_id")

  /** Trailing 1-hour RANGE frame per user (Events.trailingRange) —
    * integer epoch-µs bounds and exact cents sums, both
    * engine-portable. */
  def rangeFrame(s: SparkSession, dir: String): DataFrame =
    Events.trailingRange(Tables.events(s, dir))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), Fmt).as("ts"),
        col("n_trailing"), col("cents_trailing"))
      .orderBy("user_id", "event_id")

  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    Events.cohortRetention(Tables.events(s, dir))
      .orderBy("cohort_week", "week_offset")

  /** SCD2 dimension build from the event stream: each user's "tier"
    * (a small derived attribute with natural repeats) observed at
    * every signup/purchase, compressed into validity intervals. The
    * feed is made unique per (user, ts) by max_by on the unique event
    * id, so interval boundaries are deterministic. */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    val changes = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .groupBy("user_id", "ts")
      .agg(expr("max_by(CAST(FLOOR(value) AS BIGINT) % 3, event_id)").as("tier"))
    Events.scd2Intervals(changes, key = "user_id", ts = "ts", attr = "tier")
      .select(col("user_id"), col("version").cast("int").as("version"),
        date_format(col("valid_from"), Fmt).as("valid_from"),
        date_format(col("valid_to"), Fmt).as("valid_to"),
        col("is_current"), col("tier"))
      .orderBy("user_id", "version")
  }

  /** Daily resample + forward fill over each user's activity span —
    * the fill copies exact cents, so the densified frame hash-matches
    * across engines. */
  def gapFill(s: SparkSession, dir: String): DataFrame =
    Events.gapFillDaily(Tables.events(s, dir))
      .orderBy("user_id", "day")

  /** Rolling z-score anomalies (z = 3, 20-row trailing baseline) —
    * the flag test is pure BIGINT, so the alert set is bit-portable. */
  def anomaly(s: SparkSession, dir: String): DataFrame =
    Events.anomalyZscore(Tables.events(s, dir))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), Fmt).as("ts"),
        col("cents"), col("n_prev"), col("s_prev"))
      .orderBy("user_id", "event_id")

  /** Exact DAU + trailing-7-day WAU per observed epoch day
    * ([[Events.rollingActiveUsers]]) — the contribution decomposition
    * that keeps windowed COUNT DISTINCT linear. */
  def rollingWau(s: SparkSession, dir: String): DataFrame =
    Events.rollingActiveUsers(Tables.events(s, dir), windowDays = 7)
      .orderBy("day")

  /** First-order event-type transition matrix
    * ([[Events.transitionMatrix]]): type²-bounded output, permille
    * rows integer-exact. */
  def markov(s: SparkSession, dir: String): DataFrame =
    Events.transitionMatrix(Tables.events(s, dir))
      .orderBy("from_type", "to_type")

  /** Last-touch attribution ([[Events.lastTouchAttribution]]):
    * view/click touches, purchase conversions, 24 h window. The NULL
    * bucket is labeled 'unattributed' so the result carries no NULLs
    * (Spark and DuckDB disagree on NULL sort position). */
  def attribution(s: SparkSession, dir: String): DataFrame =
    Events.lastTouchAttribution(Tables.events(s, dir))
      .select(coalesce(col("touch_type"), lit("unattributed")).as("touch_type"),
        col("n_conversions"), col("sum_cents"))
      .orderBy("touch_type")

  /** 3-step ordered funnel (signup → view → purchase) depth histogram
    * ([[Events.funnelDepth]]): each step's earliest occurrence
    * at-or-after the previous step; all joins user-keyed. */
  def funnelDepthQ(s: SparkSession, dir: String): DataFrame =
    Events.funnelDepth(Tables.events(s, dir))
      .orderBy("depth")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_markov_transitions" -> (markov _),
    "events_attribution" -> (attribution _),
    "events_funnel_depth" -> (funnelDepthQ _),
    "events_rolling_wau" -> (rollingWau _),
    "events_anomaly_zscore" -> (anomaly _),
    "events_gap_fill" -> (gapFill _),
    "events_scd2_intervals" -> (scd2 _),
    "events_cohort_retention" -> (cohortRetention _),
    "events_running_total" -> (runningTotal _),
    "events_window" -> (window _),
    "events_window_sliding" -> (windowSliding _),
    "events_session" -> (session _),
    "events_session_window" -> (sessionWindowQ _),
    "events_funnel" -> (funnelQ _),
    "events_sequence_match" -> (sequenceMatchQ _),
    "events_json" -> (json _),
    "events_topk_users" -> (topUsers _),
    "events_skew_report" -> (skewReport _),
    "events_range_frame" -> (rangeFrame _))

  val oracles: Map[String, String] = Map(
    // key counts -> totals -> rank (count DESC, key), integer shares
    "events_skew_report" ->
      """WITH c AS (SELECT user_id AS key, COUNT(*) AS n_rows FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total, COUNT(*) AS nkeys FROM c),
        |r AS (SELECT key, n_rows,
        |      row_number() OVER (ORDER BY n_rows DESC, key) AS rank FROM c)
        |SELECT CAST(rank AS INTEGER) AS rank, key, n_rows,
        |  CAST((1000 * n_rows) // total AS BIGINT) AS share_permille,
        |  CAST((CAST(1000 AS HUGEINT) * n_rows * nkeys) // total AS BIGINT) AS x_mean_permille
        |FROM r CROSS JOIN t WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "events_markov_transitions" ->
      """WITH p AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |m AS (SELECT event_type AS from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST((1000 * n) // (SUM(n) OVER (PARTITION BY from_type)) AS BIGINT) AS p_permille
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    // the chained conditional-min formulation, step i's earliest
    // occurrence at-or-after step i-1 (inclusive, the as-of convention)
    "events_funnel_depth" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |r1 AS (SELECT user_id, MIN(us) AS t FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |r2 AS (SELECT e.user_id, MIN(e.us) AS t FROM e JOIN r1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.us >= r1.t
        |         AND e.us - r1.t <= 86400000000 GROUP BY 1),
        |r3 AS (SELECT e.user_id, MIN(e.us) AS t FROM e JOIN r2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us >= r2.t
        |         AND e.us - r2.t <= 86400000000 GROUP BY 1),
        |d AS (SELECT u.user_id,
        |        CASE WHEN r3.user_id IS NOT NULL THEN 3
        |             WHEN r2.user_id IS NOT NULL THEN 2
        |             WHEN r1.user_id IS NOT NULL THEN 1 ELSE 0 END AS depth
        |      FROM u LEFT JOIN r1 USING (user_id) LEFT JOIN r2 USING (user_id)
        |        LEFT JOIN r3 USING (user_id))
        |SELECT CAST(depth AS BIGINT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_attribution" ->
      """WITH w AS (SELECT user_id, ts, event_id, event_type, value,
        |    last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
        |      OVER u AS last_touch,
        |    last_value(CASE WHEN event_type IN ('view', 'click') THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER u AS last_touch_us
        |  FROM events
        |  WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |c AS (SELECT
        |    CASE WHEN epoch_us(ts) - last_touch_us <= 86400000000 THEN last_touch END AS touch_type,
        |    CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents
        |  FROM w WHERE event_type = 'purchase')
        |SELECT coalesce(touch_type, 'unattributed') AS touch_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1 ORDER BY touch_type""".stripMargin,
    // integer-only z-score test: (x·n − S)² > 9·(n·Q − S²), matching
    // Events.anomalyZscore's BIGINT algebra term for term
    "events_anomaly_zscore" ->
      s"""WITH e AS (SELECT user_id, event_id, ts,
         |    CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents FROM events),
         |w AS (SELECT *, COUNT(*) OVER f AS n_prev, SUM(cents) OVER f AS s_prev,
         |    SUM(cents * cents) OVER f AS q_prev
         |  FROM e WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
         |                      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
         |SELECT user_id, event_id, strftime(ts, '$DuckFmt') AS ts,
         |  cents, n_prev, CAST(s_prev AS BIGINT) AS s_prev
         |FROM w
         |WHERE n_prev >= 8
         |  AND (cents * n_prev - s_prev) * (cents * n_prev - s_prev)
         |      > 9 * (n_prev * q_prev - s_prev * s_prev)
         |ORDER BY user_id, event_id""".stripMargin,
    // the same contribution decomposition: distinct (user, day),
    // explode to the 7 report days, distinct, count — restricted to
    // observed days
    "events_rolling_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
        |       FROM events),
        |dau AS (SELECT d AS day, COUNT(*) AS dau FROM ud GROUP BY 1),
        |contrib AS (SELECT DISTINCT u.user_id, u.d + g.o AS day
        |            FROM ud u, (SELECT unnest(generate_series(0, 6)) AS o) g),
        |wau AS (SELECT c.day, COUNT(*) AS wau FROM contrib c
        |        JOIN dau ON dau.day = c.day GROUP BY 1)
        |SELECT d.day, d.dau, w.wau
        |FROM dau d JOIN wau w ON w.day = d.day
        |ORDER BY d.day""".stripMargin,
    // epoch-day = floored integer division (DuckDB // floors natively;
    // Spark side subtracts pmod first); the forward fill is DuckDB's
    // IGNORE NULLS window copy of the exact-cents daily total
    "events_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS n_events,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DECIMAL(24,2)) * 100 AS BIGINT) AS day_cents
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(MIN(day), MAX(day))) AS day
        |  FROM daily GROUP BY user_id)
        |SELECT g.user_id, g.day,
        |  COALESCE(d.n_events, 0) AS n_events,
        |  last_value(d.day_cents IGNORE NULLS)
        |    OVER (PARTITION BY g.user_id ORDER BY g.day ROWS UNBOUNDED PRECEDING) AS filled_cents
        |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin,
    // change-point compression (lag) then interval build (lead) —
    // row_number/is_current cast to INTEGER so no DuckDB BIGINT/
    // BOOLEAN drift reaches the hasher
    "events_scd2_intervals" ->
      s"""WITH c AS (SELECT user_id, ts,
         |    arg_max(CAST(FLOOR(value) AS BIGINT) % 3, event_id) AS tier
         |  FROM events WHERE event_type IN ('signup', 'purchase') GROUP BY 1, 2),
         |d AS (SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM c),
         |ch AS (SELECT user_id, ts, tier FROM d WHERE prev IS NULL OR prev <> tier),
         |v AS (SELECT user_id, tier,
         |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS INTEGER) AS version,
         |    ts AS valid_from,
         |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
         |  FROM ch)
         |SELECT user_id, version,
         |  strftime(valid_from, '$DuckFmt') AS valid_from,
         |  strftime(valid_to, '$DuckFmt') AS valid_to,
         |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current,
         |  tier
         |FROM v ORDER BY user_id, version""".stripMargin,
    // integer epoch-weeks (µs DIV week-µs) — no calendar semantics
    "events_cohort_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY 1)
        |SELECT c.cohort_week, wk.week - c.cohort_week AS week_offset, COUNT(*) AS n_active
        |FROM wk JOIN c ON wk.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // integer RANGE frame over epoch micros: cents are summed as exact
    // BIGINTs inside the frame, so no decimal/round drift is possible
    "events_range_frame" ->
      s"""SELECT user_id, event_id, strftime(ts, '$DuckFmt') AS ts,
         |  COUNT(*) OVER w AS n_trailing,
         |  CAST(SUM(CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)) OVER w AS BIGINT) AS cents_trailing
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin,
    "events_running_total" ->
      s"""SELECT user_id, event_id, strftime(ts, '$DuckFmt') AS ts,
         |  COUNT(*) OVER w AS n_so_far,
         |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DECIMAL(24,2)) * 100 AS BIGINT) AS value_cents_so_far
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
         |ORDER BY user_id, event_id""".stripMargin,
    "events_window" ->
      s"""SELECT strftime(date_trunc('hour', ts), '$DuckFmt') AS window_start,
         |  event_type, COUNT(*) AS n,
         |  round(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE), 6) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_window_sliding" ->
      s"""WITH starts AS (
         |  SELECT *, make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS ws FROM events
         |  UNION ALL
         |  SELECT *, make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000) AS ws FROM events)
         |SELECT strftime(ws, '$DuckFmt') AS window_start, event_type, COUNT(*) AS n,
         |  round(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE), 6) AS sum_value
         |FROM starts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_session" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events),
         |w AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
         |n AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS is_new FROM w),
         |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                                  ROWS UNBOUNDED PRECEDING) AS session_id FROM n)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         |  strftime(min(ts), '$DuckFmt') AS session_start,
         |  strftime(max(ts), '$DuckFmt') AS session_end,
         |  COUNT(*) AS n_events,
         |  round(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE), 6) AS sum_value
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_session_window" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
         |w AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
         |n AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS is_new FROM w),
         |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                                  ROWS UNBOUNDED PRECEDING) AS session_id FROM n)
         |SELECT user_id, strftime(min(ts), '$DuckFmt') AS session_start, COUNT(*) AS n_events
         |FROM s GROUP BY user_id, session_id ORDER BY 1, 2""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS us FROM events),
        |n AS (SELECT *, min(CASE WHEN event_type = 'purchase' THEN us END)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_us
        |      FROM e)
        |SELECT user_id, COUNT(*) AS n_signups,
        |  CAST(SUM(CASE WHEN next_purchase_us IS NOT NULL
        |       AND next_purchase_us - us <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM n WHERE event_type = 'signup'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_sequence_match" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER w AS next_type,
        |    lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, COUNT(*) AS n_pairs
        |FROM seq
        |WHERE event_type = 'purchase' AND next_type = 'error'
        |  AND gap_us <= 600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_sequence_match" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER w AS next_type,
        |    lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, COUNT(*) AS n_pairs
        |FROM seq
        |WHERE event_type = 'purchase' AND next_type = 'error'
        |  AND gap_us <= 600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_json" ->
      """WITH k AS (SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events)
        |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  round(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS avg_k
        |FROM k WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_topk_users" ->
      """WITH t AS (SELECT user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total_value,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1)
        |SELECT user_id, round(total_value, 6) AS total_value, n_events
        |FROM t ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin)
}
