package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed agg equals batch tumbling agg on the fixture") {
    val batch = Events.tumbling(graft.io.Tables.events(spark, sf001))
      .select(col("window_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val q = graft.queries.StreamQueries.windowParity(spark, sf001)
    // parity query formats timestamps and rounds sums; reshape batch
    // the same way — sum_value must participate: it is the value whose
    // batch/stream scale mismatch would otherwise go untested
    val batchFmt = Events.tumbling(graft.io.Tables.events(spark, sf001))
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), round(col("sum_value"), 6).as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = q.select("window_start", "event_type", "n", "sum_value")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batchFmt)
    assert(batch.size === batchFmt.size)
  }

  test("mapGroupsWithState running totals accumulate across batches") {
    val input = MemoryStream[Event](spark)
    val q = StreamOps.runningUserStats(input.toDS())
      .toDF("user_id", "n", "total")
      .writeStream.outputMode("update").format("memory")
      .queryName("running_stats").start()
    def ev(id: Long, min: Int, u: Long, v: Double) =
      Event(id, new Timestamp(1700000000000L + min * 60000L), u, "a", v)
    input.addData(ev(1, 0, 7, 1.0), ev(2, 1, 7, 2.0), ev(3, 0, 8, 5.0))
    q.processAllAvailable()
    input.addData(ev(4, 2, 7, 3.0))
    q.processAllAvailable()
    val last = spark.table("running_stats")
      .groupBy("user_id").agg(max("n").as("n"), max("total").as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    q.stop()
    assert(last(7L) === ((3L, 6.0)))
    assert(last(8L) === ((1L, 5.0)))
  }

  test("streaming K-Means converges to cluster means across micro-batches") {
    val input = MemoryStream[(Long, Array[Double])](spark)
    val init = Array(Array(-1.0, 0.0), Array(1.0, 0.0))
    val (q, model) = graft.streaming.StreamingKMeans.fitStream(
      input.toDS().toDF("id", "v"), "v", init, decay = 1.0, queryName = "skm_test")
    input.addData((1L, Array(-10.0, -10.0)), (2L, Array(-10.2, -9.8)),
      (3L, Array(10.0, 10.0)), (4L, Array(9.8, 10.2)))
    q.processAllAvailable()
    val c1 = model.centers
    assert(math.abs(c1(0)(0) - (-10.1)) < 0.2, c1(0).toSeq)
    assert(math.abs(c1(1)(0) - 9.9) < 0.2, c1(1).toSeq)
    // second batch pulls centers toward new points (equal-weight history)
    input.addData((5L, Array(-12.0, -12.0)), (6L, Array(12.0, 12.0)))
    q.processAllAvailable()
    val c2 = model.centers
    q.stop()
    assert(c2(0)(0) < c1(0)(0), "left center must move further left")
    assert(c2(1)(0) > c1(1)(0), "right center must move further right")
    assert(model.weights.forall(_ > 0))
  }

  test("streaming K-Means over two micro-batches equals sequential mini-batch updates") {
    // multi-batch parity: feeding the fixture through the streaming
    // machinery in TWO micro-batches must give bit-identical centers
    // to calling the model's mini-batch update twice on the same
    // splits — the foreachBatch path adds nothing nondeterministic.
    // (Exact equality is legitimate: per-batch sums go through the
    // exact-decimal bridge, so each update is bit-deterministic.)
    import graft.streaming.{StreamingKMeans, StreamingKMeansModel}
    val emb = graft.io.Tables.embeddings(spark, sf001)
      .select(col("vec_id"),
        graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
    val init = graft.cluster.KMeansNative.firstKCenters(emb, "vec_id", "v", 10)
    val halves = Seq(
      emb.filter(pmod(col("vec_id"), lit(2)) === 0),
      emb.filter(pmod(col("vec_id"), lit(2)) === 1))

    val ref = new StreamingKMeansModel(init, decay = 1.0)
    halves.foreach(h => ref.update(h, "v"))

    val input = MemoryStream[(Long, Seq[Double])](spark)
    val (q, streamed) = StreamingKMeans.fitStream(
      input.toDS().toDF("vec_id", "v"), "v", init, decay = 1.0,
      queryName = "skm_multibatch")
    halves.foreach { h =>
      input.addData(h.collect().map(r =>
        (r.getLong(0), r.getSeq[Double](1))).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(streamed.centers.map(_.toSeq).toSeq === ref.centers.map(_.toSeq).toSeq)
    assert(streamed.weights.toSeq === ref.weights.toSeq)
    assert(streamed.weights.sum === emb.count().toDouble)
  }

  test("stream-stream interval join pairs purchases with errors within the hour") {
    val purchases = MemoryStream[Event](spark)
    val errors = MemoryStream[Event](spark)
    val p = purchases.toDS().toDF("p_id", "p_ts", "p_user", "p_type", "p_value")
      .withWatermark("p_ts", "2 hours")
    val e = errors.toDS().toDF("e_id", "e_ts", "e_user", "e_type", "e_value")
      .withWatermark("e_ts", "2 hours")
    val joined = p.join(e,
      expr("p_user = e_user AND e_ts BETWEEN p_ts AND p_ts + INTERVAL 1 HOUR"))
    val q = joined.select("p_id", "e_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_join").start()
    def ev(id: Long, min: Int, u: Long, t: String) =
      Event(id, new Timestamp(1700000000000L + min * 60000L), u, t, 1.0)
    purchases.addData(ev(1, 0, 7, "purchase"), ev(2, 300, 8, "purchase"))
    errors.addData(ev(10, 30, 7, "error"),   // within 1h of purchase 1
      ev(11, 90, 7, "error"),                // outside window
      ev(12, 290, 8, "error"))               // before purchase 2
    q.processAllAvailable()
    val pairs = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs === Set((1L, 10L)))
  }

  test("streaming dedup with watermark drops late duplicate ids") {
    val input = MemoryStream[Event](spark)
    val deduped = input.toDS().toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup").start()
    def ev(id: Long, min: Int) =
      Event(id, new Timestamp(1700000000000L + min * 60000L), 7L, "a", 1.0)
    input.addData(ev(1, 0), ev(2, 5), ev(1, 0))   // in-batch duplicate
    q.processAllAvailable()
    input.addData(ev(2, 5), ev(3, 10))             // cross-batch duplicate
    q.processAllAvailable()
    val ids = spark.table("stream_dedup").select("event_id")
      .collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("declared streaming queries match batch equivalents at sf0.001") {
    import graft.queries.StreamQueries
    val ev = graft.io.Tables.events(spark, sf001)
    // streaming dedup vs batch distinct
    val sd = StreamQueries.dedupDistinct(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bd = ev.select("user_id", "event_type").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sd === bd)
    // stream-stream interval join vs batch join
    val sj = StreamQueries.joinPairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val su = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("u"), col("ts").as("sts"))
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val bj = su.join(pu, col("u") === col("pu") && col("pts") > col("sts") &&
        col("pts") <= col("sts") + expr("INTERVAL 24 HOURS"))
      .groupBy("u").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sj === bj)
    // streamed sessions are a subset of batch sessions (the trailing
    // session per user may be unemitted if the watermark never passes
    // its end + gap), and at most one session per user is withheld
    val streamed = StreamQueries.sessionParity(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val batch = Events.sessionize(ev)
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("ss"),
        col("n_events")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.subsetOf(batch))
    val nUsers = ev.select("user_id").distinct().count()
    assert(streamed.size >= batch.size - nUsers)
  }

  test("stream-static dim join equals the flat batch enrichment") {
    import graft.queries.StreamQueries
    val ev = graft.io.Tables.events(spark, sf001)
    val got = StreamQueries.staticJoinParity(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val weekUs = 7L * 86400L * 1000000L
    val dim = ev.select(col("user_id"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $weekUs)) DIV $weekUs").as("week"))
      .groupBy("user_id").agg(min("week").as("cohort_week"))
    val flat = ev.join(dim, "user_id")
      .groupBy("cohort_week", "event_type")
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(38,2)")) * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === flat)
    // every event lands in exactly one cell (the join loses nothing)
    assert(got.values.map(_._1).sum === ev.count())
  }

  test("flatMapGroupsWithState sessionization emits gap-separated sessions") {
    val input = MemoryStream[Event](spark)
    val q = StreamOps.sessionize(input.toDS(), gapSeconds = 1800L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    def ev(id: Long, min: Int, u: Long) =
      Event(id, new Timestamp(1700000000000L + min * 60000L), u, "a", 1.0)
    input.addData(ev(1, 0, 7), ev(2, 10, 7))      // session 1: 2 events
    q.processAllAvailable()
    input.addData(ev(3, 120, 7))                   // gap 110min -> session 2
    q.processAllAvailable()
    input.addData(ev(4, 600, 9))                   // advances watermark far
    q.processAllAvailable()
    input.addData(ev(5, 1200, 9))                  // extra batch to fire timeouts
    q.processAllAvailable()
    val out = spark.table("sessions")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(out.contains((7L, 2L)), s"first session emitted: ${out.toSeq}")
    assert(out.contains((7L, 1L)), s"second session emitted on timeout: ${out.toSeq}")
  }

  test("idempotent state store: replay and crash-before-commit never double-count") {
    import org.apache.spark.sql.functions._
    val keys = Seq("l_returnflag", "l_linestatus")
    val li = graft.io.Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
        col("l_extendedprice").cast("decimal(38,2)").as("p"))
    def slice(m: Int) = li.filter(pmod(col("l_orderkey"), lit(3)) === m)
    def partial(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Incremental.partialState(df, keys, col("p"))
    val dir = java.nio.file.Files.createTempDirectory("graft-state-store").toString
    val store = new graft.operators.Incremental.IdempotentStateStore(spark, dir, keys)
    store.commit(partial(slice(0)), 0)
    store.commit(partial(slice(1)), 1)
    store.commit(partial(slice(1)), 1) // at-least-once redelivery
    // crash AFTER the snapshot write, BEFORE the commit marker:
    partial(slice(2)).write.mode("overwrite").parquet(s"$dir/state_2")
    assert(store.lastCommitted === Some(1L)) // uncommitted snapshot invisible
    store.commit(partial(slice(2)), 2) // replay lands cleanly over it
    store.commit(partial(slice(0)), 0) // stale replay, dropped
    val got = graft.operators.Incremental.finalizeState(store.current.get, keys)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDecimal(2), r.getLong(3))).toMap
    val flat = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("p").as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDecimal(2), r.getLong(3))).toMap
    assert(got.keySet === flat.keySet)
    flat.foreach { case (k, (sv, n)) =>
      assert(got(k)._1.compareTo(sv) === 0 && got(k)._2 === n, s"group $k")
    }
  }

  test("streamed moment merge over 3 real micro-batches equals the flat corr bits") {
    val li = graft.io.Tables.lineitem(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft-corr-stream").toString
    li.repartition(3).write.mode("overwrite").parquet(dir)
    val got = graft.queries.StreamQueries
      .corrStateOf(spark, dir, li.schema, maxFilesPerTrigger = Some(1))
      .collect()(0)
    val flat = graft.queries.StatsQueries.corrMatrix(spark, sf001).collect()(0)
    assert(got.getLong(0) === flat.getLong(0))
    // decimal merge is exact, so finalize lands on IDENTICAL doubles
    (1 to 3).foreach { i =>
      assert(java.lang.Double.doubleToLongBits(got.getDouble(i)) ===
        java.lang.Double.doubleToLongBits(flat.getDouble(i)), s"col $i")
    }
  }

  test("incremental state over 3 real micro-batches equals the flat aggregate") {
    import org.apache.spark.sql.functions._
    val li = graft.io.Tables.lineitem(spark, sf001)
    // 3 parquet files + maxFilesPerTrigger=1 → 3 successive batches
    val dir = java.nio.file.Files.createTempDirectory("graft-inc-stream").toString
    li.repartition(3).write.mode("overwrite").parquet(dir)
    val got = graft.queries.StreamQueries
      .incrementalStateOf(spark, dir, li.schema, maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDecimal(2), r.getLong(3))).toMap
    val flat = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_extendedprice").cast("decimal(38,2)")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDecimal(2), r.getLong(3))).toMap
    assert(got.keySet === flat.keySet)
    flat.foreach { case (k, (sv, n)) =>
      assert(got(k)._1.compareTo(sv) === 0 && got(k)._2 === n, s"group $k")
    }
  }

  test("streaming graph search over 3 real micro-batches is row-identical to the batch search (r14)") {
    // per-query independence makes the serving twin batching-
    // invariant EXACTLY: any micro-batch split of the query set must
    // reproduce the batch ann_graph_search rows bit-for-bit
    val e = graft.io.Tables.embeddings(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft-gs-stream")
    try {
      e.repartition(3).write.mode("overwrite").parquet(dir.toString)
      val streamed = graft.queries.StreamQueries
        .graphSearchParityWith(spark, sf001, maxFilesPerTrigger = Some(1),
          Some(dir.toString))
        .collect().toSeq
      val batch = SparkEntry.queries("ann_graph_search")(spark, sf001)
        .collect().toSeq
      assert(streamed === batch)
    } finally {
      // the fixture copy is 3 parquet files + markers — delete rather
      // than leak one copy per run (the streamDir deleteOnExit rule)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streaming graph insert over 3 real micro-batches is row-identical to the batch insert (r14)") {
    // ingest is per-row independent and append-only, so any
    // micro-batch split of the arriving new vectors must reproduce
    // the batch ann_graph_insert edge set bit-for-bit
    val e = graft.io.Tables.embeddings(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft-gi-stream")
    try {
      e.repartition(3).write.mode("overwrite").parquet(dir.toString)
      val streamed = graft.queries.StreamQueries
        .graphInsertParityWith(spark, sf001, maxFilesPerTrigger = Some(1),
          Some(dir.toString))
        .collect().toSeq
      val batch = SparkEntry.queries("ann_graph_insert")(spark, sf001)
        .collect().toSeq
      assert(streamed === batch)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streaming graph delete: serving flips mid-stream as tombstones land; the drained state equals the batch tombstone search (r17)") {
    // the tombstone feed split into TWO planted micro-batches: file 1
    // carries ONE deleted id that the CLASSIC search serves (so after
    // batch 1 serving must exclude it while still serving the other
    // deleted answers — the observable mid-stream flip), file 2 the
    // rest of the cohort; the drained final serve must equal the
    // batch ann_graph_tombstone_search bit-for-bit
    import spark.implicits._
    val dm = graft.queries.SimilarityQueries.DeletedMod
    val classic = SparkEntry.queries("ann_graph_search")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deletedServed = classic.map(_._2).distinct.filter(_ % dm == 0L)
    assert(deletedServed.nonEmpty,
      "fixture must serve at least one deleted id classically")
    val first = deletedServed.min
    val e = graft.io.Tables.embeddings(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft-gd-stream")
    try {
      e.filter(col("vec_id") === first).coalesce(1)
        .write.mode("overwrite").parquet(dir.resolve("b1").toString)
      // FileStreamSource orders by modification time — a distinct
      // mtime pins the planted single-id file to micro-batch 1
      Thread.sleep(1100)
      e.filter(pmod(col("vec_id"), lit(dm)) === 0 &&
          col("vec_id") =!= first).coalesce(1)
        .write.mode("append").parquet(dir.resolve("b1").toString)
      val serves = scala.collection.mutable.ArrayBuffer
        .empty[Array[org.apache.spark.sql.Row]]
      val streamed = graft.queries.StreamQueries
        .graphDeleteParityWith(spark, sf001, maxFilesPerTrigger = Some(1),
          Some(dir.resolve("b1").toString), rows => { serves += rows; () })
        .collect().toSeq
      val batch = SparkEntry.queries("ann_graph_tombstone_search")(spark, sf001)
        .collect().toSeq
      assert(streamed === batch,
        "drained streaming delete state must equal the batch tombstone search")
      assert(serves.length >= 2, s"expected >= 2 serving flips, got ${serves.length}")
      // after batch 1 the arrived tombstone is gone from the answers...
      val s1 = serves.head.map(r => (r.getLong(0), r.getLong(1)))
      assert(!s1.exists(_._2 == first),
        s"first arrived tombstone $first still served after batch 1")
      // ...while serving has NOT yet flipped all the way to the final
      // state if other deleted ids were classically served
      if (deletedServed.length > 1)
        assert(s1.exists { case (_, nb) => nb % dm == 0L },
          "mid-stream serve should still carry the not-yet-deleted cohort")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streaming maintain gate: signals accumulate across micro-batches and the drained decision equals the batch gate (r17)") {
    // the resident gate job: three driver counters, integer adds per
    // micro-batch; the drained row must equal ann_graph_maintain
    // bit-for-bit, and the counters must be seen GROWING (>= 2
    // batches under maxFilesPerTrigger = 1 over a 3-file copy)
    val e = graft.io.Tables.embeddings(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft-gm-stream")
    try {
      e.repartition(3).write.mode("overwrite").parquet(dir.toString)
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val streamed = graft.queries.StreamQueries
        .graphMaintainParityWith(spark, sf001, maxFilesPerTrigger = Some(1),
          Some(dir.toString), (t, n, d) => { seen += ((t, n, d)); () })
        .collect().toSeq
      val batch = SparkEntry.queries("ann_graph_maintain")(spark, sf001)
        .collect().toSeq
      assert(streamed === batch,
        "drained streaming gate row must equal the batch gate")
      assert(seen.length >= 2, s"expected >= 2 accumulation steps, got $seen")
      assert(seen.sliding(2).forall(w => w(0)._1 < w(1)._1),
        s"total counter must grow monotonically across batches: $seen")
      assert(seen.last._1 === e.count(),
        "drained counter must cover the whole corpus")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streaming anomaly alerts equal the batch z-score operator row-for-row") {
    val streamed = graft.queries.StreamQueries.anomalyParity(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val batch = Events.anomalyZscore(graft.io.Tables.events(spark, sf001))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("cents"), col("n_prev"), col("s_prev"))
      .orderBy("user_id", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming transitions chain pairs across micro-batch boundaries") {
    val input = MemoryStream[Event](spark)
    val q = StreamOps.transitionsStream(input.toDS())
      .toDF("user_id", "from_type", "to_type")
      .writeStream.outputMode("append").format("memory")
      .queryName("markov_pairs").start()
    def ev(id: Long, min: Int, u: Long, t: String) =
      Event(id, new Timestamp(1700000000000L + min * 60000L), u, t, 0.0)
    input.addData(ev(1, 0, 7, "view"), ev(2, 1, 7, "click"))
    q.processAllAvailable()
    // the view→... boundary pair must come from STATE, not the batch
    input.addData(ev(3, 2, 7, "purchase"), ev(4, 0, 8, "view"))
    q.processAllAvailable()
    val pairs = spark.table("markov_pairs")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    q.stop()
    assert(pairs === Seq((7L, "click", "purchase"), (7L, "view", "click")))
  }

  test("streaming attribution credits a touch from an earlier micro-batch") {
    val input = MemoryStream[Event](spark)
    val q = StreamOps.attributionStream(input.toDS())
      .toDF("touch_type", "cents")
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_rows").start()
    def ev(id: Long, min: Int, u: Long, t: String, v: Double) =
      Event(id, new Timestamp(1700000000000L + min * 60000L), u, t, v)
    input.addData(ev(1, 0, 7, "click", 0.0))
    q.processAllAvailable()
    // conversion arrives a batch later; credit must come from state
    input.addData(ev(2, 10, 7, "purchase", 12.34),
      ev(3, 0, 8, "purchase", 5.0))
    q.processAllAvailable()
    val rows = spark.table("attr_rows")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    q.stop()
    assert(rows === Seq(("click", 1234L), ("unattributed", 500L)))
  }

  test("streaming attribution equals the batch operator on the fixture") {
    val streamed = SparkEntry.queries("stream_attribution_parity")(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.queries.EventsQueries.attribution(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming transition matrix equals the batch operator on the fixture") {
    val streamed = SparkEntry.queries("stream_markov_parity")(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = Events.transitionMatrix(graft.io.Tables.events(spark, sf001))
      .orderBy("from_type", "to_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming topic assignment equals the batch argmin on the fixture") {
    val streamed = SparkEntry.queries("stream_topic_parity")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val centers = graft.queries.TextQueries.topicCenters(spark, sf001)
    val batch = graft.operators.TextAnalysis.docVectors(
        graft.io.Tables.documents(spark, sf001), "doc_id", "text",
        graft.queries.TextQueries.TopicBuckets)
      .select(col("doc_id"),
        graft.plans.expressions.vec_argmin(col("v"), centers)("cluster_id")
          .cast("int").as("cid"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming ANN serve equals the batch IVF probe row for row") {
    val streamed = SparkEntry.queries("stream_ann_parity")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val batch = SparkEntry.queries("ann_ivf_topk")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("embedding vec_ids are dense and 0-based (stream-parity query selection invariant)") {
    // the vector-serving stream twins (annServeParity,
    // graphSearchParityWith) select the query batch via `vec_id < Q`
    // while the batch surfaces and oracles use ORDER BY vec_id LIMIT
    // Q — row-identity silently depends on the fixture's vec_ids
    // being dense 0-based (r14 ADVICE). Fail loudly here if a future
    // fixture introduces gaps or an offset in the first Q ids.
    val Q = graft.queries.SimilarityQueries.Q
    for (dir <- Seq(sf001, sf01)) {
      val firstQ = graft.io.Tables.embeddings(spark, dir)
        .orderBy("vec_id").limit(Q)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(firstQ === (0L until Q.toLong),
        s"$dir: first $Q vec_ids not dense 0-based: $firstQ")
    }
  }

  test("streaming covariance cells equal the batch moment pass exactly") {
    val streamed = SparkEntry.queries("stream_covariance_parity")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    val batch = SparkEntry.queries("ann_covariance")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(streamed === batch)
    assert(streamed.length === 64 * 65 / 2)
  }

  test("streaming split manifest equals the batch report row for row") {
    val streamed = SparkEntry.queries("stream_split_parity")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val batch = SparkEntry.queries("pipeline_split_manifest")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming epoch admission equals the batch report row for row") {
    val streamed = SparkEntry.queries("stream_admission_parity")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val batch = SparkEntry.queries("pipeline_epoch_admission")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming WAU (chained dedups) equals the batch contribution decomposition") {
    val streamed = SparkEntry.queries("stream_wau_parity")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = Events.rollingActiveUsers(graft.io.Tables.events(spark, sf001))
      .orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
