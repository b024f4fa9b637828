package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window / sessionization / JSON operators over the
  * stream-shaped `events` table (event_id, ts, user_id, event_type,
  * value, props). Batch formulations here; the Structured Streaming
  * equivalents (readStream + watermark + the same window exprs) live
  * in [[graft.streaming.StreamOps]].
  *
  * Scale notes: tumbling/sliding aggregation is a single partial+final
  * hash aggregate (shuffle = |groups|); sessionization shuffles once on
  * user_id (the window partition key) — the canonical layout for a
  * sessionized store. Money-grade sums are cast to decimal(38,2) —
  * the scale where the fixture values are EXACT — so partition order
  * cannot perturb results; higher scales (e.g. (38,12)) on money
  * magnitudes diverge between engines and are the documented
  * cross-engine trap (SURVEY.md §5.2).
  */
object Events {

  /** Tumbling-window aggregate per event_type using the streaming
    * `window()` operator. Output: (window_start, event_type, n,
    * sum_value). */
  def tumbling(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window aggregate (each event lands in len/slide windows).
    * Output: (window_start, event_type, n, sum_value). */
  def sliding(events: DataFrame, windowLen: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user reaches `gapSeconds` — the
    * STRICT boundary (`>=`), matching Spark's native `session_window`
    * (whose windows are [start, last+gap), so an event exactly gap
    * after the last one falls outside) — [[sessionWindow]] and this
    * operator share one oracle and must agree at the boundary.
    * Output: (user_id, session_id, session_start, session_end,
    * n_events, sum_value). Deterministic ordering on (ts, event_id). */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapSeconds * 1000000L
    val withNew = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= gapUs, 1).otherwise(0))
    withNew
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,2)")).cast("double").as("sum_value"))
  }

  /** Gap sessionization via Spark's native `session_window` operator —
    * same semantics as [[sessionize]], including the strict gap
    * boundary (an event exactly `gap` after the previous one starts a
    * new session); both are declared queries checked against the SAME
    * DuckDB oracle. Output: (user_id, session_start, n_events). */
  def sessionWindow(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Funnel conversion: per user, signup events followed by a purchase
    * within `horizonHours`. One pass with a window function — for each
    * signup, the time of the next purchase by the same user. */
  def funnel(events: DataFrame, horizonHours: Int = 24): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val nextPurchaseUs = min(when(col("event_type") === "purchase",
        unix_micros(col("ts")))).over(
      byUser.rowsBetween(1, Window.unboundedFollowing))
    val horizonUs = horizonHours.toLong * 3600L * 1000000L
    events
      .withColumn("next_purchase_us", nextPurchaseUs)
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_signups"),
        sum(when(col("next_purchase_us").isNotNull &&
          col("next_purchase_us") - unix_micros(col("ts")) <= horizonUs, 1)
          .otherwise(0)).as("n_converted"))
  }

  /** Ordered-pair sequence match — the simplest MATCH_RECOGNIZE
    * shape: per user, count occurrences of `first` IMMEDIATELY
    * followed (the next event in (ts, event_id) order) by `second`
    * within `withinUs` micros. One lead() pass over the per-user sort
    * — no self-join of the events fact, so the only exchange is the
    * user_id window partitioning and cost is O(events), independent
    * of the match-window width. Gap arithmetic is integer epoch
    * micros (engine-portable). Output: (user_id, n_pairs), matched
    * users only. */
  def sequenceMatch(events: DataFrame, first: String = "purchase",
                    second: String = "error",
                    withinUs: Long = 10L * 60L * 1000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .withColumn("gap_us",
        lead(unix_micros(col("ts")), 1).over(byUser) - unix_micros(col("ts")))
      .filter(col("event_type") === first && col("next_type") === second &&
        col("gap_us") <= withinUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** JSON property extraction + aggregate: parse `props` (e.g.
    * {"k": 87}) and aggregate k per event_type. Output: (event_type,
    * n, sum_k, avg_k). */
  def jsonAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))

  /** Top-k users by total value (order/limit surface). */
  /** Explicit window-frame surface: per-user running event count and
    * running value total in (ts, event_id) order — ROWS UNBOUNDED
    * PRECEDING. The running sum accumulates exact decimals, so every
    * prefix is deterministic, not just the final total. Scale: one
    * user_id exchange; frames evaluate incrementally within each
    * sorted partition. */
  def runningTotals(events: DataFrame): DataFrame = {
    val frame = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col("user_id"), col("event_id"), col("ts"),
      count(lit(1)).over(frame).as("n_so_far"),
      sum(col("value").cast("decimal(38,2)")).over(frame).cast("double")
        .as("value_so_far"))
  }

  /** TIME-RANGE window frame — per-user trailing-window aggregates
    * (`RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW`), the
    * rate-limit / rolling-exposure primitive ROWS frames can't express
    * (a row's frame depends on event-time distance, not row count).
    * Ordering is by exact epoch micros — integer RANGE bounds are
    * engine-portable where interval arithmetic may not be — and sums
    * accumulate in cents (exact integers), so every frame value is
    * deterministic cross-engine. RANGE includes order-key peers in
    * both engines, so duplicate-timestamp rows agree by construction.
    * Scale: one user_id exchange; frames evaluate with a sliding
    * two-pointer pass within each sorted partition (cost O(rows), not
    * O(rows·frame)). */
  def trailingRange(events: DataFrame, trailing: Long = 3600L * 1000000L): DataFrame = {
    val frame = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-trailing, Window.currentRow)
    events.select(
      col("user_id"), col("event_id"), col("ts"),
      count(lit(1)).over(frame).as("n_trailing"),
      sum((col("value").cast("decimal(38,2)") * 100).cast("long"))
        .over(frame).as("cents_trailing"))
  }

  /** COHORT RETENTION — the product-analytics staple: users are
    * cohorted by the epoch-week of their FIRST event (integer week =
    * unix_micros DIV week-µs, engine-portable arithmetic — no
    * calendar/timezone semantics to disagree on), then each
    * (cohort, week-offset) cell counts the cohort's users active that
    * week. Offset 0 equals the cohort size by construction (every
    * user is active in their own first week — spec-pinned).
    *
    * Scale shape: the activity set is DISTINCT (user, week) — map-
    * side dedup collapses the event stream to at most users×weeks
    * rows before any exchange; the first-week aggregate and the
    * cohort join are both keyed on user_id (one partitioning, reused);
    * the final cell aggregate is cohorts×offsets-sized. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // FLOOR division, not DIV: Spark's DIV truncates toward zero while
    // DuckDB's // floors, so a pre-1970 timestamp (negative micros)
    // would bucket into different weeks on the two engines. Subtracting
    // the always-non-negative pmod first makes the numerator an exact
    // multiple — integer floor division on both sides.
    val wk = events
      .select(col("user_id"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $weekUs)) DIV $weekUs").as("week"))
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
    wk.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active")) // (user, week) is distinct ⇒ count = users
  }

  def topUsers(events: DataFrame, k: Int = 10): DataFrame =
    events
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(38,2)")).cast("double").as("total_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(k)

  /** SCD TYPE-2 interval construction — turn a change log into the
    * versioned dimension a warehouse keeps: collapse consecutive
    * observations of the SAME attribute value into one validity
    * interval `[valid_from, valid_to)` per key, with `valid_to` NULL
    * (and `is_current` = 1) on the open latest version.
    *
    * Requires unique (key, ts) with a non-null attribute — pre-
    * aggregate the feed if not (the declared query does, via max_by
    * on the unique event id).
    *
    * Scale shape: ONE exchange on the key serves both window stages
    * (change-point detection via lag, then version numbering + lead —
    * identical partitioning AND sort order, so the sort is done once);
    * per-key work is a sequential scan, inherent to versioning, and
    * bounded by one entity's history, never the table. */
  def scd2Intervals(changes: DataFrame, key: String, ts: String,
                    attr: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val changed = changes
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attr))
    changed
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col("version"),
        col(ts).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"),
        col(attr))
  }

  /** CALENDAR GAP FILL — the time-series resample+forward-fill pass:
    * per-user daily totals densified onto every epoch day between the
    * user's first and last activity, empty days carrying the LAST
    * OBSERVED day's total (`filled_cents`) and an explicit
    * `n_events = 0`. Epoch-day bucketing is floor integer division on
    * unix micros (pmod-adjusted, same portable arithmetic as
    * [[cohortRetention]]); totals accumulate in decimal(38,2) and emit
    * as exact cents, and the fill is a COPY of an exact value — no
    * arithmetic happens across engines, so the densified frame
    * hash-matches anywhere.
    *
    * Scale shape: the daily pre-aggregate collapses the event stream
    * map-side to ≤ users×days rows before any exchange; span, grid
    * explode, the left join back and the fill window are ALL keyed on
    * user_id — one partitioning reused end-to-end (the join and window
    * reuse the aggregate's exchange). Grid size is users×span-days —
    * output-sized, which is what a densification produces by
    * definition; no per-user funnel because each user's grid explodes
    * from its own span row in parallel. */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val dayUs = 86400L * 1000000L
    val day = expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $dayUs)) DIV $dayUs")
    val daily = events
      .select(col("user_id"), day.as("day"),
        col("value").cast("decimal(38,2)").as("v"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
        (sum(col("v")).cast("decimal(24,2)") * 100).cast("long").as("day_cents"))
    val grid = daily
      .groupBy("user_id").agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val fill = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_cents"), ignoreNulls = true).over(fill).as("filled_cents"))
  }

  /** ROLLING ACTIVE USERS — exact trailing-window distinct users per
    * observed epoch day (DAU + `windowDays`-day WAU): windowed COUNT
    * DISTINCT is not sum-decomposable, so the scalable exact plan is
    * the CONTRIBUTION decomposition — reduce events to distinct
    * (user, active-day) pairs (map-side partial DISTINCT collapses
    * each user's events per day before anything shuffles), explode
    * each pair to the `windowDays` report days it contributes to,
    * DISTINCT again (a user active twice in one window still counts
    * once), and count per day. Work is user-days × windowDays —
    * linear, no per-day state, no sliding-window buffer; the per-day
    * report joins DAU and WAU day-count-sized frames. Days are
    * epoch-day integers ([[gapFillDaily]]'s representation — no
    * DATE-type or timezone drift can reach the hasher). */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val dayUs = 86400L * 1000000L
    val day = expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $dayUs)) DIV $dayUs")
    val ud = events.select(col("user_id"), day.as("d")).distinct()
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("d"), col("d") + (windowDays - 1))).as("day"))
      .distinct()
      .join(broadcast(dau.select("day")), "day") // observed days only
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"))
  }

  /** ROLLING Z-SCORE ANOMALY DETECTION — flag events whose value
    * deviates from the user's own trailing baseline: a row is
    * anomalous when (x − μ)² > z²·σ² over the `lookback` PRECEDING
    * rows (current row excluded — the candidate must not contaminate
    * its own baseline), with at least `minPrev` prior observations.
    *
    * The test runs ENTIRELY in BIGINT: with cents x, trailing count n,
    * trailing sum S and sum-of-squares Q, the population-variance test
    * (x−μ)² > z²σ² multiplies through by n² to
    * `(x·n − S)² > z²·(n·Q − S²)` — no division, no doubles, so the
    * flag (and hence the result set) is bit-portable across engines.
    * Overflow bound: |x·n − S| ≤ 2·maxCents·n, so with n = 20 the test
    * stays inside int64 for values up to ~10⁷ cents ($100k) — far
    * above the fixture domain; wider domains scale cents down first.
    *
    * Scale shape: one user_id exchange serves the single window pass
    * (count/sum/sumsq over one shared frame evaluate in one sliding
    * scan); the filter then discards all but the anomalies, so the
    * output is alert-sized, not data-sized. */
  def anomalyZscore(events: DataFrame, lookback: Int = 20,
                    minPrev: Int = 8, zSq: Int = 9): DataFrame = {
    val frame = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-lookback, -1)
    val scored = events
      .withColumn("cents", (col("value").cast("decimal(38,2)") * 100).cast("long"))
      // pre-project the square: an inline cents*cents inside the sum
      // makes Catalyst split a SECOND Window pass for it (same sort,
      // extra traversal); projected first, all three aggs share one
      .withColumn("cents_sq", col("cents") * col("cents"))
      .withColumn("n_prev", count(lit(1)).over(frame))
      .withColumn("s_prev", sum(col("cents")).over(frame))
      .withColumn("q_prev", sum(col("cents_sq")).over(frame))
    val dev = col("cents") * col("n_prev") - col("s_prev")
    val varN2 = col("n_prev") * col("q_prev") - col("s_prev") * col("s_prev")
    scored
      .filter(col("n_prev") >= minPrev && dev * dev > lit(zSq) * varN2)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("cents"), col("n_prev"), col("s_prev"))
  }

  /** MULTI-STEP ORDERED FUNNEL DEPTH — for a step sequence
    * (s₁, s₂, …, sₖ), how far each user progresses taking each step's
    * EARLIEST occurrence at-or-after the previous step AND within
    * `stepWindowUs` of it (the standard product-analytics funnel with
    * a per-step conversion deadline: a later s₁ cannot resurrect a
    * funnel, equal timestamps chain — the as-of family's inclusive
    * convention — and a step past the deadline breaks the chain).
    * Output: (depth, n_users) for the observed depths over ALL users.
    *
    * Scale shape: k chained conditional-min aggregates, every one
    * keyed on user_id — the per-step join is user-keyed against a
    * users-sized frame (one row per user who reached the previous
    * step), so AQE broadcasts it once the funnel narrows and no
    * exchange ever carries more than the events fact once per step.
    * The final depth histogram is k+1 rows. */
  def funnelDepth(events: DataFrame,
                  steps: Seq[String] = Seq("signup", "view", "purchase"),
                  stepWindowUs: Long = 24L * 3600L * 1000000L): DataFrame = {
    require(steps.nonEmpty)
    val e = events.select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("_us"))
    val users = e.select("user_id").distinct()
    // reached(i) = (user_id, _t) the earliest time user completed step i
    val first = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("_us")).as("_t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      e.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("_t").as("_pt")), "user_id")
        .filter(col("_us") >= col("_pt") &&
          col("_us") - col("_pt") <= stepWindowUs)
        .groupBy("user_id").agg(min(col("_us")).as("_t"))
    }
    val depth = reached.zipWithIndex.foldLeft(
        users.withColumn("_d", lit(0))) { case (acc, (r, i)) =>
      acc.join(r.select(col("user_id"), lit(1).as(s"_r$i")), Seq("user_id"), "left")
        .withColumn("_d", when(col(s"_r$i").isNotNull, lit(i + 1)).otherwise(col("_d")))
        .drop(s"_r$i")
    }
    depth.groupBy(col("_d").cast("long").as("depth"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** EVENT-TYPE TRANSITION MATRIX — the first-order Markov summary of
    * user journeys: for every ordered (from_type → to_type) pair of
    * CONSECUTIVE events per user (same (ts, event_id) total order as
    * [[sequenceMatch]]), the occurrence count and the row-conditional
    * transition probability in integer permille
    * (`1000·n DIV Σ_to n`). The sequence-statistics report a
    * curriculum/session-model stage reads before sampling.
    *
    * Scale shape: one user_id window exchange produces the pairs; the
    * aggregation is a type²-bounded groupBy (map-side partials make
    * the shuffle carry ≤ |types|² rows per task), and the permille
    * normalizer is a window over the already-tiny matrix — no second
    * pass over the data. All-integer outputs hash-exactly. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val byFrom = Window.partitionBy("from_type")
    events
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_permille",
        expr("(1000 * n) DIV sum(n) OVER (PARTITION BY from_type)"))
      .select(col("from_type"), col("to_type"), col("n"), col("p_permille"))
  }

  /** LAST-TOUCH ATTRIBUTION — credit each conversion event to the
    * most recent PRECEDING touch event by the same user within
    * `windowUs` micros: the standard marketing-attribution reduction,
    * and the window-function shape the rest of the repo lacks —
    * `last(expr, ignoreNulls) OVER (... ROWS UNBOUNDED PRECEDING TO 1
    * PRECEDING)` (DuckDB: `LAST_VALUE(x IGNORE NULLS)`). Output: one
    * row per touch type (plus the unattributed bucket as NULL) with
    * conversion counts and cents totals.
    *
    * Scale shape: the one user_id window exchange both finds the last
    * touch and carries its timestamp; the conversion filter then
    * shrinks the frame to conversions only, and the final groupBy is
    * |touch types|-bounded. No self-join of the fact against itself —
    * the naive formulation — so cost is O(events), independent of the
    * attribution-window width. */
  def lastTouchAttribution(events: DataFrame,
                           touchTypes: Seq[String] = Seq("view", "click"),
                           conversionType: String = "purchase",
                           windowUs: Long = 24L * 3600L * 1000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isInCollection(touchTypes)
    events
      .withColumn("last_touch",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(byUser))
      .withColumn("last_touch_us",
        last(when(isTouch, unix_micros(col("ts"))), ignoreNulls = true).over(byUser))
      .filter(col("event_type") === conversionType)
      .withColumn("touch_type",
        when(unix_micros(col("ts")) - col("last_touch_us") <= windowUs,
          col("last_touch")))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_conversions"),
        sum((col("value").cast("decimal(38,2)") * 100).cast("long")).as("sum_cents"))
  }
}
