package graft

import org.apache.spark.sql.SparkSession

/** One place to construct the engine's SparkSession so every entry
  * point (Verify, Bench, Metrics, tests) agrees on session-level
  * semantics. Readers must NOT mutate session conf (a per-table
  * accessor with a global side effect breaks concurrent use); any
  * conf a source needs lives here instead.
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the events fixture is
  *    TIMESTAMP(NANOS) parquet, which Spark 4 otherwise refuses; we
  *    read nanos as long and truncate to µs (DuckDB epoch_us parity).
  *  - UTC session time zone: all timestamp formatting is engine-
  *    independent.
  *  - shuffle partitions are capped at 8 for local runs: at the test
  *    scale (≤600k rows) per-task fixed overhead dominates past ~8
  *    partitions (round-1 driver bench at 32 was 2.4× slower than 4).
  *    On a real cluster this would be set to ~2-3× total cores; AQE
  *    (on by default in Spark 4) coalesces small shuffles either way.
  *  - AQE initialPartitionNum is 4× cores (r9 verdict task 4): every
  *    shuffle STARTS wide and AQE coalesces it to the 64 MB advisory
  *    target, so a fixture-scale exchange still lands on a few tasks
  *    (unchanged bench) while a rehearsal-scale one — the 100×
  *    open-vocab skip-gram pair aggregate, ~200 M pre-agg rows —
  *    fans out to up to 128 reduce tasks instead of spilling through
  *    the fixed cap of 8. This is how the partitioning scales WITH
  *    input instead of being pinned at harness scale. (Streaming
  *    aggregates don't use AQE and keep the fixed cap — their state
  *    store layout must be stable across micro-batches anyway.)
  *  - `canChangeCachedPlanOutputPartitioning=true` (round 11): with
  *    the wide initialPartitionNum above, a PERSISTED frame otherwise
  *    materializes at the full 128 pre-coalesce partitions (the
  *    default keeps cached-plan partitioning stable and skips AQE
  *    coalescing), so every consumer of a memoized fixture frame — the
  *    BM25 scored frame, the dedup pair graphs — scheduled 128 near-
  *    empty tasks per read: text_bm25_topk steady reps were 2.0 s of
  *    pure task overhead on a 30 k-row cache, 0.45 s once coalesced.
  */
object GraftSession {
  def localPartitions(cpus: Int): Int = math.max(1, math.min(cpus, 8))

  def builder(cpus: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", localPartitions(cpus).toString)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(32, 4 * cpus).toString)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** cpus from the driver's env, defaulting to 4. */
  def envCpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
}
