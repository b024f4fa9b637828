package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.Events

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf001).cache()

  test("keySkewReport: planted hot key ranks first with exact share and mean ratio; uniform ~1000") {
    import spark.implicits._
    // 9 keys x 10 rows + one hot key x 110 rows = 200 rows, 10 keys
    val d = ((1 to 9).flatMap(k => (1 to 10).map(_ => k.toLong)) ++
      Seq.fill(110)(99L)).toDF("user_id")
    val r = graft.operators.Skew.keySkewReport(d, "user_id", 3)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.length === 3)
    // hot key: 110/200 rows = 550 permille, 5.5x the mean key load
    assert(r(0) === ((1, 99L, 110L, 550L, 5500L)))
    // runners-up tie at 10 rows, break toward the smaller key
    assert(r(1)._2 === 1L && r(2)._2 === 2L)
    assert(r(1)._4 === 50L && r(1)._5 === 500L)
    // uniform corpus: every key sits at the mean (1000 permille)
    val u = (1 to 8).flatMap(k => (1 to 5).map(_ => k.toLong)).toDF("user_id")
    graft.operators.Skew.keySkewReport(u, "user_id", 8).collect()
      .foreach(x => assert(x.getLong(4) === 1000L))
  }

  test("tumbling windows cover every event exactly once") {
    val t = Events.tumbling(events)
    assert(t.agg(sum("n")).collect()(0).getLong(0) === events.count())
  }

  test("sliding 1h/30m windows cover every event exactly twice") {
    val sl = Events.sliding(events)
    assert(sl.agg(sum("n")).collect()(0).getLong(0) === events.count() * 2)
  }

  test("sessionization: session count and boundaries on a synthetic user") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      (1L, ts(0), 7L, "a", 1.0, "{}"),
      (2L, ts(10), 7L, "a", 2.0, "{}"),
      (3L, ts(55), 7L, "a", 3.0, "{}"),   // 45 min gap -> new session
      (4L, ts(60), 7L, "a", 4.0, "{}"),
      (5L, ts(200), 7L, "a", 5.0, "{}"),  // new session
      (6L, ts(0), 8L, "b", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = Events.sessionize(df).orderBy("user_id", "session_id").collect()
    assert(s.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq ===
      Seq((7L, 1L, 2L), (7L, 2L, 2L), (7L, 3L, 1L), (8L, 1L, 1L)))
  }

  test("sessions partition all events; session_end >= session_start") {
    val s = Events.sessionize(events)
    assert(s.agg(sum("n_events")).collect()(0).getLong(0) === events.count())
    assert(s.filter(col("session_end") < col("session_start")).count() === 0)
  }

  test("sequence match agrees with a pure per-user scan") {
    val got = Events.sequenceMatch(events)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      u -> sorted.sliding(2).count {
        case Array(a, b) =>
          a._4 == "purchase" && b._4 == "error" && b._2 - a._2 <= 600000000L
        case _ => false
      }
    }.filter(_._2 > 0)
    assert(got === expected.map { case (k, v) => k -> v.toLong })
  }

  test("json extraction parses every fixture props row") {
    val k = events.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
    assert(k.filter(col("k").isNull).count() === 0)
  }

  test("running totals: last frame row equals the per-user aggregate") {
    val rt = Events.runningTotals(events)
    val last = rt.groupBy("user_id")
      .agg(max("n_so_far").as("n"),
        max(struct(col("n_so_far"), col("value_so_far"))).as("m"))
      .select(col("user_id"), col("n"), col("m.value_so_far").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val agg = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,2)")).cast("double").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last === agg)
    // one output row per event, and n_so_far really is the running
    // 1..n sequence along each user's (ts, event_id) frame order
    assert(rt.count() === events.count())
    rt.orderBy("user_id", "ts", "event_id")
      .select("user_id", "n_so_far").collect()
      .groupBy(_.getLong(0)).foreach { case (u, rows) =>
        assert(rows.map(_.getLong(1)).toSeq === (1L to rows.length).toSeq, s"user=$u")
      }
  }

  test("scd2: consecutive repeats collapse, intervals abut, latest version open") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val changes = Seq(
      (7L, ts(0), 1L), (7L, ts(10), 1L),  // repeat -> same interval
      (7L, ts(20), 2L), (7L, ts(30), 2L), (7L, ts(40), 1L), // back to 1 = NEW version
      (8L, ts(5), 9L))
      .toDF("user_id", "ts", "tier")
    val got = Events.scd2Intervals(changes, "user_id", "ts", "tier")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getTimestamp(2), if (r.isNullAt(3)) null else r.getTimestamp(3),
        r.getInt(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (7L, 1, ts(0), ts(20), 0, 1L),
      (7L, 2, ts(20), ts(40), 0, 2L),
      (7L, 3, ts(40), null, 1, 1L),
      (8L, 1, ts(5), null, 1, 9L)))
  }

  test("scd2 intervals reconstruct the attribute at every original observation") {
    // the defining property of a type-2 dimension: point-in-time
    // lookup through the intervals returns the attribute as observed
    val changes = events.filter(col("event_type").isin("signup", "purchase"))
      .groupBy("user_id", "ts")
      .agg(expr("max_by(CAST(FLOOR(value) AS BIGINT) % 3, event_id)").as("tier"))
      .cache()
    val iv = Events.scd2Intervals(changes, "user_id", "ts", "tier")
    val joined = changes.as("c").join(iv.as("i"),
      col("c.user_id") === col("i.user_id") &&
        col("c.ts") >= col("i.valid_from") &&
        (col("i.valid_to").isNull || col("c.ts") < col("i.valid_to")))
    // every observation falls in exactly one interval, with its tier
    assert(joined.count() === changes.count())
    assert(joined.filter(col("c.tier") =!= col("i.tier")).count() === 0L)
    // exactly one open interval per user
    val open = iv.filter(col("is_current") === 1).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1).count() === 0L)
    changes.unpersist()
  }

  test("top users returns k rows in strictly non-increasing order") {
    val t = Events.topUsers(events, 10).collect()
    assert(t.length === 10)
    val vals = t.map(_.getDouble(1))
    assert(vals.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("cohort retention: offset-0 cell equals the cohort size, cells bounded by it") {
    val ev = graft.io.Tables.events(spark, sf001)
    val ret = Events.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val weekUs = 7L * 86400L * 1000000L
    val cohortSizes = ev
      .select(col("user_id"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $weekUs)) DIV $weekUs").as("week"))
      .groupBy("user_id").agg(min("week").as("cw"))
      .groupBy("cw").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ret.keySet.map(_._1) === cohortSizes.keySet)
    cohortSizes.foreach { case (cw, size) =>
      assert(ret((cw, 0L)) === size, s"cohort $cw offset 0")
    }
    ret.foreach { case ((cw, off), n) =>
      assert(off >= 0 && n >= 1 && n <= cohortSizes(cw), s"cell ($cw, $off)")
    }
  }

  test("cohort weeks FLOOR for pre-epoch timestamps (DuckDB // parity)") {
    import spark.implicits._
    // 1969-12-31 is negative micros: floor → week −1, truncation → 0.
    // Both users must land in week-floor cohorts matching Math.floorDiv.
    val weekUs = 7L * 86400L * 1000000L
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val ev = Seq(
      (1L, ts("1969-12-31T00:00:00Z")),
      (2L, ts("1970-01-02T00:00:00Z")))
      .toDF("user_id", "ts")
    val got = graft.operators.Events.cohortRetention(ev).collect()
      .map(r => r.getLong(0)).toSet
    def wk(s: String) = Math.floorDiv(
      java.time.Instant.parse(s).toEpochMilli * 1000L, weekUs)
    assert(got === Set(wk("1969-12-31T00:00:00Z"), wk("1970-01-02T00:00:00Z")))
    assert(wk("1969-12-31T00:00:00Z") === -1L)
  }

  test("gap fill densifies each span, zero-counts empty days, forward-fills cents") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val ev = Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 1.25),
      (1L, ts("2024-01-01T12:00:00Z"), 2.00),
      (1L, ts("2024-01-04T09:00:00Z"), 0.50),
      (2L, ts("2024-02-10T00:00:00Z"), 3.75))
      .toDF("user_id", "ts", "value")
    val got = graft.operators.Events.gapFillDaily(ev)
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d1 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val d2 = java.time.LocalDate.parse("2024-02-10").toEpochDay
    assert(got === Seq(
      (1L, d1, 2L, 325L),      // 1.25 + 2.00 observed
      (1L, d1 + 1, 0L, 325L),  // gap day carries the last total
      (1L, d1 + 2, 0L, 325L),
      (1L, d1 + 3, 1L, 50L),   // new observation replaces the fill
      (2L, d2, 1L, 375L)))     // single-day span: no gap rows
  }

  test("trailingRange: 1h RANGE frame sums exactly, includes ts peers, resets past the horizon") {
    import spark.implicits._
    val t0 = 1704067200000000L // epoch µs
    val h = 3600L * 1000000L
    val rows = Seq(
      // user 1: three events inside one hour, a fourth 2h later
      (1L, t0, 1L, 1.25), (2L, t0 + h / 2, 1L, 2.00), (3L, t0 + h, 1L, 0.75),
      (4L, t0 + 3 * h, 1L, 5.00),
      // user 2: duplicate timestamps — RANGE includes peers both ways
      (5L, t0, 2L, 1.00), (6L, t0, 2L, 2.00))
    val ev = rows.toDF("event_id", "us", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = graft.operators.Events.trailingRange(ev)
      .select("event_id", "n_trailing", "cents_trailing")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L, 125L),
      (2L, 2L, 325L),
      (3L, 3L, 400L),  // t0 is exactly 1h back — inclusive bound
      (4L, 1L, 500L),  // horizon passed: frame is just itself
      (5L, 2L, 300L),  // peer rows see each other
      (6L, 2L, 300L)))
  }

  test("anomaly z-score: flags a planted spike, never flags a flat series") {
    import spark.implicits._
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // user 1: ten identical values then one spike; user 2: flat noise-free
    val rows = (1 to 10).map(i => (i.toLong, ts(i), 1L, "a", 10.00, "{}")) ++
      Seq((11L, ts(11), 1L, "a", 500.00, "{}")) ++
      (20 to 35).map(i => (i.toLong, ts(i), 2L, "a", 25.00, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.anomalyZscore(ev)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 11L))) // zero-variance baseline: only the spike
  }

  test("anomaly z-score: integer test agrees with the double z-score on fixture data") {
    // replay the BIGINT algebra in doubles: a flagged row must satisfy
    // (x-mu)^2 > 9 sigma^2 (population) over its trailing frame, and an
    // unflagged row with n_prev >= 8 must not (strict inequality both
    // ways holds because the integer test is exact)
    import org.apache.spark.sql.expressions.Window
    val frame = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    val cents = (col("value").cast("decimal(38,2)") * 100).cast("long")
    val stats = events
      .withColumn("x", cents.cast("double"))
      .withColumn("n", count(lit(1)).over(frame).cast("double"))
      .withColumn("mu", avg(col("x")).over(frame))
      .withColumn("q", avg(col("x") * col("x")).over(frame))
      .filter(col("n") >= 8)
      .withColumn("lhs", (col("x") - col("mu")) * (col("x") - col("mu")))
      .withColumn("rhs", lit(9.0) * (col("q") - col("mu") * col("mu")))
    val doubleFlags = stats.filter(col("lhs") > col("rhs") * 1.0000001)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val doubleNoFlags = stats.filter(col("lhs") < col("rhs") * 0.9999999)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val flagged = Events.anomalyZscore(events)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(doubleFlags.subsetOf(flagged))
    assert(flagged.intersect(doubleNoFlags).isEmpty)
    assert(flagged.nonEmpty)
  }

  test("rolling WAU equals naive trailing-window distinct; DAU <= WAU") {
    val got = Events.rollingActiveUsers(events, windowDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // driver recompute from distinct (user, epoch-day)
    val dayUs = 86400L * 1000000L
    val ud = events
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $dayUs").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = ud.groupBy(_._2)
    got.foreach { case (day, dau, wau) =>
      assert(dau === byDay(day).map(_._1).distinct.length.toLong)
      val naive = ud.filter { case (_, d) => d >= day - 6 && d <= day }
        .map(_._1).distinct.length.toLong
      assert(wau === naive, s"day $day")
      assert(dau <= wau)
    }
    // toy: re-activity within one window counts once
    val t0 = 1700000000L
    val toy = Seq((1L, t0), (1L, t0 + 3 * 86400L), (2L, t0 + 3 * 86400L))
      .toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val tg = Events.rollingActiveUsers(toy, windowDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).map(t => (t._2, t._3)).toSeq
    assert(tg === Seq((1L, 1L), (2L, 2L)))
  }

  test("transition matrix: hand-checked counts and permille on a synthetic journey") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(1), 7L, "click", 1.0, "{}"),
      (3L, ts(2), 7L, "view", 1.0, "{}"),
      (4L, ts(3), 7L, "click", 1.0, "{}"),
      (5L, ts(4), 7L, "purchase", 1.0, "{}"),
      (6L, ts(0), 8L, "view", 1.0, "{}"),
      (7L, ts(1), 8L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.transitionMatrix(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // view→click ×2, view→error ×1: view row normalizes 666/333
    assert(got === Seq(
      ("click", "purchase", 1L, 500L), ("click", "view", 1L, 500L),
      ("view", "click", 2L, 666L), ("view", "error", 1L, 333L)))
  }

  test("transition matrix: counts conserve (n events minus one per active user)") {
    val m = Events.transitionMatrix(events)
    val total = m.agg(sum("n")).collect()(0).getLong(0)
    val users = events.select("user_id").distinct().count()
    assert(total === events.count() - users)
  }

  test("funnel depth: ordered chaining, per-step deadline, no resurrection") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val day = 24 * 60
    val df = Seq(
      // user 7: signup -> view -> purchase inside the deadlines: depth 3
      (1L, ts(0), 7L, "signup", 0.0, "{}"),
      (2L, ts(10), 7L, "view", 0.0, "{}"),
      (3L, ts(20), 7L, "purchase", 0.0, "{}"),
      // user 8: view BEFORE signup never counts; none after: depth 1
      (4L, ts(5), 8L, "view", 0.0, "{}"),
      (5L, ts(10), 8L, "signup", 0.0, "{}"),
      // user 9: view past the 24h step deadline: depth 1
      (6L, ts(0), 9L, "signup", 0.0, "{}"),
      (7L, ts(day + 1), 9L, "view", 0.0, "{}"),
      // user 10: no signup at all: depth 0
      (8L, ts(0), 10L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.funnelDepth(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
  }

  test("funnel depth conserves users on the fixture") {
    val d = Events.funnelDepth(events)
    assert(d.agg(sum("n_users")).collect()(0).getLong(0) ===
      events.select("user_id").distinct().count())
  }

  test("last-touch attribution: window expiry, override, and the unattributed bucket") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      // user 7: view then click then purchase — click wins (most recent)
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(5), 7L, "click", 1.0, "{}"),
      (3L, ts(10), 7L, "purchase", 10.0, "{}"),
      // user 8: touch outside the 24h window — unattributed
      (4L, ts(0), 8L, "view", 1.0, "{}"),
      (5L, ts(25 * 60), 8L, "purchase", 20.0, "{}"),
      // user 9: no touch at all — unattributed
      (6L, ts(0), 9L, "purchase", 30.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.lastTouchAttribution(df)
      .collect().map(r => (Option(r.getString(0)).getOrElse("null"),
        r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq(("click", 1L, 1000L), ("null", 2L, 5000L)))
  }

  test("attribution conserves conversions across buckets") {
    val buckets = Events.lastTouchAttribution(events)
    val total = buckets.agg(sum("n_conversions")).collect()(0).getLong(0)
    assert(total === events.filter(col("event_type") === "purchase").count())
  }
}
