package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the same window/session/stat
  * semantics as the batch [[graft.operators.Events]] operators,
  * expressed over `readStream` with watermarks and keyed state.
  *
  * Scale notes: windowed aggregation is incremental state keyed by
  * (window, type); sessionization state is per-user and bounded by the
  * gap timeout (state is dropped on session emission); no operator
  * buffers unbounded history.
  */
object StreamOps {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long, sum_value: Double)

  /** start/end are MICROSECONDS since epoch: the fixture timestamps
    * carry sub-millisecond precision (ns parquet truncated to µs), so
    * gap comparisons must run in µs to agree with the batch
    * [[graft.operators.Events.sessionize]] and its DuckDB oracle —
    * `Timestamp.getTime` (ms) would silently move exact-gap
    * boundaries by up to 1 ms. */
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** µs since epoch from a Timestamp (getTime carries ms; the nanos
    * field carries the full fractional second). */
  def tsToUs(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  def usToTs(us: Long): Timestamp = {
    val ts = new Timestamp(math.floorDiv(us, 1000L))
    ts.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** File-source stream over an events parquet directory, normalized
    * to session TimestampType at µs precision — mirroring
    * [[graft.io.Tables.events]] for both fixture generations
    * (TIMESTAMP(NANOS) read as long via `nanosAsLong`, and plain
    * TIMESTAMP(MICROS)). A file stream needs an explicit schema, and a
    * wrong `ts` type here silently mangles every event time (µs read
    * as ns ⇒ 1970 timestamps ⇒ watermarks drop everything), so the
    * schema is probed from the files via a one-off batch read of the
    * footer rather than hardcoded. */
  /** Memo for the probed file schema, keyed by the DIRECTORY's content
    * identity (sorted child names + mtimes + sizes): every stream
    * parity query probes the same fixture dir, and the one-off batch
    * footer read behind it measurably showed up in the round-7 bench
    * (stream_running_stats 0.87→2.92 s cluster). Regenerating the
    * fixture writes new part files, which changes the listing and
    * invalidates the entry — the [[graft.io.FixtureCache]] staleness
    * discipline, adapted to a directory. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.sql.types.StructType]

  private def dirIdentity(dir: String): String = {
    val files = Option(new java.io.File(dir).listFiles).getOrElse(Array.empty)
    files.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.lastModified}:${f.length}").mkString("|")
  }

  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val fileSchema = schemaCache.getOrElseUpdate((dir, dirIdentity(dir)), {
      try spark.read.parquet(dir).schema
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"cannot probe an events schema from '$dir' — the directory is empty " +
          "or holds no parquet footers. Populate it first, or check the session " +
          "was built by GraftSession (nanosAsLong for TIMESTAMP(NANOS) fixtures).", e)
      }
    })
    val stream = spark.readStream.schema(fileSchema).parquet(dir)
    fileSchema("ts").dataType match {
      case LongType      => stream.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => stream
      case _             => stream.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling-window counts + value sums with a watermark; identical
    * aggregation expressions to the batch `Events.tumbling`, including
    * the decimal(38,2) sum — the fixture values are exact 2-dp, and
    * casting at the data's true scale is the documented cross-engine
    * determinism rule (higher scales diverge between engines near ~15
    * significant digits). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Keyed running totals per user via mapGroupsWithState (update
    * mode): the minimal custom-state operator. */
  def runningUserStats(events: Dataset[Event]): Dataset[(Long, Long, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          evs.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          (user, n, s)
      }
  }

  /** Gap-based streaming sessionization via flatMapGroupsWithState +
    * event-time timeout: a session is emitted once the watermark
    * passes its end + gap. Batch-equivalent of `Events.sessionize`. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, evs, state: GroupState[SessionState]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            // watermark passed session end + gap: emit and clear
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, usToTs(s.start),
              usToTs(s.end), s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(e => (tsToUs(e.ts), e.event_id))
            var emitted = List.empty[SessionOut]
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              val t = tsToUs(e.ts)
              cur = cur match {
                case null => SessionState(t, t, 1L, e.value)
                // strict boundary (>=): matches session_window and the
                // batch Events.sessionize
                case c if t - c.end >= gapUs =>
                  emitted ::= SessionOut(user, usToTs(c.start),
                    usToTs(c.end), c.n, c.total)
                  SessionState(t, t, 1L, e.value)
                case c =>
                  SessionState(c.start, math.max(c.end, t), c.n + 1, c.total + e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              // timeout is ms-resolution: round UP so the state never
              // times out before the µs-exact end+gap boundary passes
              state.setTimeoutTimestamp(math.floorDiv(cur.end + gapUs + 999L, 1000L))
            }
            emitted.reverseIterator
          }
      }
  }

  /** STREAMING TRANSITION PAIRS — the stateful face of
    * [[graft.operators.Events.transitionMatrix]]'s pair extraction:
    * per user, keep the LAST (µs, event_id, type) as state, sort each
    * micro-batch's events by (ts, event_id) (arrival within a batch
    * is unordered), and emit one (user, from, to) row per consecutive
    * pair — the state tuple chains pairs ACROSS batch boundaries, so
    * batching never loses a transition. State is one small tuple per
    * user (watermark-free because it never grows); the matrix
    * reduction (counts + permille) is type²-bounded and runs on the
    * drained sink. */
  def transitionsStream(events: Dataset[Event]): Dataset[(Long, String, String)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, String), (Long, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[(Long, Long, String)]) =>
          val sorted = evs.toSeq.sortBy(e => (tsToUs(e.ts), e.event_id))
          var out = List.empty[(Long, String, String)]
          var last = state.getOption.orNull
          sorted.foreach { e =>
            if (last != null) out ::= ((user, last._3, e.event_type))
            last = (tsToUs(e.ts), e.event_id, e.event_type)
          }
          if (last != null) state.update(last)
          out.reverseIterator
      }
  }

  /** STREAMING LAST-TOUCH ATTRIBUTION — the stateful face of
    * [[graft.operators.Events.lastTouchAttribution]]: per user, the
    * state is the single most-recent touch (µs, type); each
    * micro-batch sorts its events by (ts, event_id) and every
    * conversion emits (attributed-touch-or-'unattributed', exact
    * cents), with touches updating state as the scan passes them —
    * so a touch in one batch attributes a conversion in a later one.
    * State is one tuple per user; emission is conversion-sized; the
    * bucket totals are a |touch types|-bounded reduction on the
    * drained sink. Cents go through [[centsOf]] (the decimal(38,2)
    * bridge) so sums are bit-identical to the batch operator's. */
  def attributionStream(events: Dataset[Event],
                        touchTypes: Set[String] = Set("view", "click"),
                        conversionType: String = "purchase",
                        windowUs: Long = 24L * 3600L * 1000000L)
      : Dataset[(String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, String), (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, evs, state: GroupState[(Long, String)]) =>
          val sorted = evs.toSeq.sortBy(e => (tsToUs(e.ts), e.event_id))
          var last = state.getOption.orNull
          var out = List.empty[(String, Long)]
          sorted.foreach { e =>
            val us = tsToUs(e.ts)
            if (e.event_type == conversionType) {
              val attr = if (last != null && us - last._1 <= windowUs) last._2
                         else "unattributed"
              out ::= ((attr, centsOf(e.value)))
            }
            if (touchTypes(e.event_type)) last = (us, e.event_type)
          }
          if (last != null) state.update(last)
          out.reverseIterator
      }
  }

  /** Exact cents the way Spark SQL's `CAST(value AS DECIMAL(38,2))`
    * produces them: the cast goes through `Double.toString` (shortest
    * round-trip) then HALF_UP — replicated here so the streaming
    * anomaly flags are bit-identical to the batch operator's. */
  def centsOf(value: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(value))
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** STREAMING ANOMALY DETECTION — the stateful twin of
    * [[graft.operators.Events.anomalyZscore]]: per user, keep the
    * trailing `lookback` cents as a bounded ring of state (≤ 20 longs
    * per key — watermark-free because the state never grows), sort
    * each micro-batch's new events by (ts, event_id) (arrival within
    * a batch is unordered; the trailing baseline is order-sensitive),
    * and emit a row whenever the BIGINT test
    * `(x·n − S)² > z²·(n·Q − S²)` fires with ≥ `minPrev` priors.
    * With the whole fixture in one micro-batch this equals the batch
    * operator row-for-row — the parity oracle. At scale the in-batch
    * sort is bounded by one user's per-trigger volume, and emission
    * is alert-sized. */
  def anomalyStream(events: Dataset[Event], lookback: Int = 20,
                    minPrev: Int = 8, zSq: Long = 9L)
      : Dataset[(Long, Long, Timestamp, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], (Long, Long, Timestamp, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[List[Long]]) =>
          var buf = state.getOption.getOrElse(Nil) // oldest first, ≤ lookback
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Timestamp, Long, Long, Long)]
          evs.toSeq.sortBy(e => (tsToUs(e.ts), e.event_id)).foreach { e =>
            val cents = centsOf(e.value)
            val n = buf.length.toLong
            if (n >= minPrev) {
              var s = 0L; var q = 0L
              buf.foreach { c => s += c; q += c * c }
              val dev = cents * n - s
              if (dev * dev > zSq * (n * q - s * s))
                out += ((user, e.event_id, e.ts, cents, n, s))
            }
            buf = (buf :+ cents).takeRight(lookback)
          }
          state.update(buf)
          out.iterator
      }
  }
}
