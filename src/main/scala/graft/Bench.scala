package graft
import java.nio.file.{Files, Paths}
object Bench {
  /** Times one invocation; a THROWING query returns the −1.0 sentinel
    * instead of its near-zero elapsed time, so a breakage surfaces in
    * the bench line rather than silently deflating the total (the
    * round-4 verdict's failure-masking nit). */
  def timeOnce(run: () => Unit): Double = {
    val t0 = System.nanoTime()
    try { run(); (System.nanoTime() - t0) / 1e9 }
    catch { case _: Throwable => -1.0 }
  }

  /** Each query is timed over REPEATED runs and the MIN is reported:
    * single-shot timing produced phantom regressions two rounds
    * running (r02: six batch ghosts, all vanished in r03; r03: three
    * streaming ghosts on unchanged code) — run-order/load variance on
    * top of the ~2-3 s streaming machinery floor is indistinguishable
    * from a real regression with one sample. Two runs always; a third
    * only when the first two disagree by >30% (both-slow is the one
    * case min-of-2 can't fix — which is why every rep is recorded in
    * bench.json: a "regression" whose reps are uniformly slow across
    * rounds is real, one with a fast rep anywhere is load). Any failed
    * rep poisons the query's value to −1.0. Query builders are
    * rep-idempotent by contract: memory sinks are dropped and
    * re-created per invocation, stream source dirs and k-means inits
    * are fixture-cached. */
  def bestOf(run: () => Unit): (Double, Seq[Double]) = {
    val t1 = timeOnce(run)
    val t2 = timeOnce(run)
    val reps =
      if (t1 < 0 || t2 < 0) Seq(t1, t2)
      else if (math.abs(t1 - t2) > 0.3 * math.min(t1, t2)) Seq(t1, t2, timeOnce(run))
      else Seq(t1, t2)
    (if (reps.exists(_ < 0)) -1.0 else reps.min, reps)
  }

  /** Per-stream-sink accumulation of StreamingQueryProgress durations
    * (r7 verdict task 7): the streaming parity queries' cost is mostly
    * micro-batch MACHINERY (offset log, planning, commits), not data —
    * but nothing in the bench line could show that. The listener splits
    * each sink's total trigger time into addBatch (actual data work)
    * and everything else, accumulated across ALL reps, and bench.json
    * carries the split so a "regression" on a stream query is
    * attributable to machinery vs data without re-running anything. */
  private final case class StreamStat(batches: Long, triggerMs: Long, addBatchMs: Long)
  private val streamStats =
    scala.collection.concurrent.TrieMap.empty[String, StreamStat]

  private def machineryListener: org.apache.spark.sql.streaming.StreamingQueryListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val name = Option(p.name).getOrElse("unnamed")
        def ms(k: String): Long =
          Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
        val prev = streamStats.getOrElse(name, StreamStat(0L, 0L, 0L))
        streamStats.put(name, StreamStat(prev.batches + 1,
          prev.triggerMs + ms("triggerExecution"), prev.addBatchMs + ms("addBatch")))
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.envCpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(machineryListener)
    // Warm up the JVM (codegen compiler, parquet reader, shuffle path)
    // on a tiny query before timing: otherwise whichever query runs
    // first absorbs ~3-4 s of one-time JIT cost and its number is
    // meaningless (round-1 bench: first-listed query always "slowest").
    try {
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.groupBy("r_name").count().count()
      spark.range(1000).selectExpr("sum(id)").count()
    } catch { case _: Throwable => () }
    // Per-query warm run (r9 verdict task 2): each query runs ONCE
    // untimed IMMEDIATELY before its own timed reps, recorded as
    // queries_warm. One-time costs — fixture memos (native k-means
    // fit, pair graphs, the aHash codec frame), disk-persisted
    // IVF/PQ indexes, stream schema probes — land in the warm run, so
    // the timed reps measure steady-state serve cost and a memoized
    // pipeline's build is attributed to itself; warm − min ≈ the
    // build share. Interleaving (warm = rep 0, discarded) rather than
    // a separate full warm PASS is deliberate: r9 ran all 168 queries
    // to completion before the first timed rep, and the timed session
    // was ~170 queries older than r8's — late-alphabet clusters
    // inflated 2-7× from JVM/GC aging alone (stream_wau_parity's
    // UNTIMED warm run was 3× faster than the timed reps that
    // followed the pass). One warm run per query keeps the session
    // age at timing time within one query of the r8 shape.
    // Dev-only subset filter (comma-separated name prefixes): lets a
    // single query cluster be re-timed in seconds while iterating.
    // UNSET in the driver's run, so the recorded bench always covers
    // the full board.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // a leaked filter in a recording run must not masquerade as a full
    // sweep (r11 ADVICE): warn loudly AND stamp the filter into every
    // emitted JSON object, so a partial artifact is self-identifying
    only.foreach { f =>
      System.err.println(s"[bench] WARNING: SPARK_GRAFT_BENCH_ONLY=${f.mkString(",")} " +
        "— this run records a PARTIAL board and its artifacts are stamped \"filtered\"")
    }
    // escape the env-sourced value: a quote/backslash/control char in
    // a typo'd filter must not make the three emitted JSON artifacts
    // unparseable (the round-1 "parsed": null failure mode; r12
    // ADVICE added the control-char strip — a newline in the env var
    // was the one residual way to split an emitted line)
    val filteredStamp = only
      .map(f => f.mkString(",").replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", ""))
      .map(v => s""","filtered":"$v"""").getOrElse("")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    val benched = selected.map { case (name, fn) =>
      val w = timeOnce(() => { fn(spark, sfDir).count(); () })
      val (best, reps) = bestOf(() => { fn(spark, sfDir).count(); () })
      (name, w, best, reps)
    }
    val warm = benched.map { case (name, w, _, _) => (name, w) }
    val results = benched.map { case (name, _, best, reps) => (name, best, reps) }
    // Per-query seconds rounded to 3 dp (locale-pinned): at 60+ queries the
    // full-double line is ~3.4 KB and the driver's ~2 KB tail capture cuts
    // its HEAD off, so the scraper sees no parseable JSON ("parsed": null).
    // At 3 dp the whole line is ~1.8 KB and fits the tail window entire.
    def dp3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + dp3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${dp3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$filteredStamp}"""
    // stdout for the driver's line scraper AND a file, so a log-prefix
    // wrapper (sbt's [info]) can't make the JSON unparseable again
    // (round-1 BENCH had "parsed": null from exactly that). The FILE
    // additionally carries every rep per query ("reps") — the stdout
    // line must stay under the tail window, the file has no such limit
    // and is what makes both-reps-slow vs real-regression decidable.
    val repsJson = results.map { case (k, _, reps) =>
      s"\"" + k + "\":" + reps.map(dp3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // Median alongside min (r5 verdict task 7): min is the driver's
    // headline (load-robust), but min alone masks a monotone rep ramp
    // — a query whose reps climb 2.6→4.9→7.2 s still reports its first
    // rep. The median moves when the distribution does, so trend
    // analysis reads queries_median while the driver line keeps min.
    // (Median of 2 reps = their mean; of 3 = the middle one. A failed
    // rep poisons the median to -1.0 like the min.)
    def median(reps: Seq[Double]): Double =
      if (reps.exists(_ < 0)) -1.0
      else {
        val s = reps.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      }
    val medianJson = results.map { case (k, _, reps) =>
      s"\"" + k + "\":" + dp3(median(reps))
    }.mkString("{", ",", "}")
    // listener events post asynchronously; every stream stopped long
    // ago, but give the bus a beat to drain before snapshotting
    Thread.sleep(500)
    val machineryJson = streamStats.toSeq.sortBy(_._1).map { case (name, st) =>
      s"\"" + name + s"\":{\"batches\":${st.batches},\"trigger_ms\":${st.triggerMs}," +
        s"\"addbatch_ms\":${st.addBatchMs},\"machinery_ms\":${st.triggerMs - st.addBatchMs}}"
    }.mkString("{", ",", "}")
    val warmJson = warm.map { case (k, v) => s"\"" + k + "\":" + dp3(v) }
      .mkString("{", ",", "}")
    // stream_machinery accumulates across ALL runs of each stream
    // query — the warm run AND the timed reps (r9 ADVICE: stated here
    // so cross-round batches/trigger_ms comparisons stay honest).
    val machineryNote =
      "warm+timed cumulative: 1 warm + N timed micro-batch runs per stream query"
    val fileLine = line.dropRight(1) +
      s""","reps":$repsJson,"queries_median":$medianJson,"queries_warm":$warmJson,""" +
      s""""stream_machinery_note":"$machineryNote","stream_machinery":$machineryJson}"""
    println(line)
    // At 90 queries the full line is ~2.3 KB — past the driver's ~2 KB
    // tail window, which cuts the line's HEAD (where metric/value
    // live). A compact line printed LAST survives any tail truncation
    // intact; bench.json stays the authoritative per-query record.
    println(s"""{"metric":"total","value":${dp3(total)},"unit":"sec","n_queries":${results.size},"sf":"$sfDir","detail":"bench.json"$filteredStamp}""")
    Files.writeString(Paths.get("bench.json"), fileLine + "\n")
    spark.stop()
  }
}
