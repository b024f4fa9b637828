package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sketches for approximate analytics whose RESULTS are
  * still bit-reproducible in any engine — the repo's HLL alternative:
  * `approx_count_distinct` is a fine estimator but its estimate is
  * engine-private, so the declared HLL query can only be rows-checked.
  * A K-Minimum-Values sketch over the exact affine Lehmer hash family
  * gives the same O(k) sketch-size/accuracy trade (σ ≈ 1/√(k−2)) with
  * an estimate DuckDB recomputes bit-for-bit.
  */
object Sketches {
  val HashP = 1000000007L
  /** Affine hash coefficients from the MINSTD Lehmer stream (same
    * oracle-expressible family as Dedup.MinhashA / the samplers). */
  def kmvCoeffs(seed: Long): (Long, Long) = {
    val s0 = math.floorMod(seed, HashP - 1) + 1
    val it = Iterator.iterate(s0)(x => x * 48271L % HashP).drop(1)
    (it.next(), it.next())
  }

  /** Per-group KMV distinct estimate for an integral column:
    * hash every value with h(x) = (a·(x mod P) + b) mod P, keep each
    * group's k smallest DISTINCT hashes, and estimate
    *   n̂ = (k−1)·P / h_(k)   (exact count when fewer than k survive).
    *
    * Scale shape: the raw scan partially aggregates (group, h) before
    * the one dedup exchange (map-side dedup collapses repeats, so the
    * shuffle carries ~distinct cardinality, not row count); the k-min
    * selection is TWO-LEVEL — per-(group, h mod buckets) row_number
    * first (parallelism = groups × buckets, each emitting ≤ k rows),
    * then the global per-group rank runs over ≤ k·buckets survivors —
    * so no group ever funnels its full distinct set into one task
    * (the stratumRank lesson). The bucketing is result-invisible: the
    * oracle is the PLAIN per-group rank, like the salted-agg oracle
    * being the plain group-by. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  k: Int, seed: Long = 77L, buckets: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val (a, b) = kmvCoeffs(seed)
    val gs = groupCols.map(col)
    val h = (pmod(value.cast("bigint"), lit(HashP)) * lit(a) + lit(b)) % lit(HashP)
    val hashed = df.select(gs :+ h.as("_h"): _*).distinct()
    val w1 = Window.partitionBy(gs :+ pmod(col("_h"), lit(buckets)): _*).orderBy("_h")
    val w2 = Window.partitionBy(gs: _*).orderBy("_h")
    hashed
      .withColumn("_r1", row_number().over(w1)).filter(col("_r1") <= k)
      .withColumn("_r2", row_number().over(w2)).filter(col("_r2") <= k)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("_m"), max(col("_h")).as("_hk"))
      .select(gs :+
        when(col("_m") < k, col("_m").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashP.toDouble) / col("_hk"))
          .as("est_distinct"): _*)
  }

  /** One MISRA-GRIES pass over a token stream with k counters: any
    * item occurring more than n/(k+1) times in the stream is
    * guaranteed to survive (each eviction round removes k+1 stream
    * occurrences — the newcomer plus one decrement from each of the k
    * counters — so an item's counter can be zeroed at most n/(k+1)
    * times). Pure function so the guarantee is directly law-testable
    * (PropertiesSpec) and the cluster op below shares the exact code
    * path with the test. */
  def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counts.get(t) match {
        case Some(c) => counts.update(t, c + 1)
        case None if counts.size < k => counts.update(t, 1L)
        case None =>
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.filterInPlace((_, c) => c > 0)
      }
    }
    counts.keysIterator
  }

  /** HEAVY HITTERS — all tokens with share ≥ shareNum/shareDen of the
    * stream, with EXACT counts. Sketch-driven but oracle-exact (the
    * KMV pattern): a bounded-state Misra-Gries pass per partition
    * nominates candidates, and an exact recount over the nominees
    * rescues the precise answer.
    *
    * Exactness: a token with global share ≥ shareNum/shareDen >
    * 1/(k+1) must exceed share 1/(k+1) in at least one partition
    * (averaging argument), so per-partition MG retains it there —
    * the candidate union is a SUPERSET of every qualifying token
    * (require() enforces the precondition). The recount then filters
    * with exact integer cross-multiplication, so the result equals
    * the plain GROUP BY ... HAVING the oracle runs.
    *
    * Scale shape at 100 TB: the MG pass is one bounded-state scan
    * (k counters/partition, no shuffle); candidates are ≤ k·partitions
    * rows (a few MB at any scale) — broadcast back; the recount's
    * groupBy shuffles ONLY candidate tokens after map-side partial
    * aggregation, never the full Heaps'-law vocabulary the plain
    * GROUP BY would exchange. The total-count scan piggybacks no
    * shuffle (algebraic count). */
  def heavyHitters(tokens: DataFrame, tokenCol: String,
                   k: Int = 255, shareNum: Long = 1, shareDen: Long = 200): DataFrame = {
    require(shareNum > 0 && shareDen > 0 && shareNum * (k + 1) > shareDen,
      s"exactness needs share $shareNum/$shareDen > 1/(k+1) = 1/${k + 1}")
    val spark = tokens.sparkSession
    import spark.implicits._
    val t = tokens.select(col(tokenCol).cast("string").as("token"))
    val cands = t.as[String].mapPartitions(it => misraGries(it, k))
      .distinct().toDF("token")
    val total = t.agg(count(lit(1)).as("_total"))
    t.join(broadcast(cands), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occ"))
      .crossJoin(broadcast(total))
      .filter(col("n_occ") * lit(shareDen) >= col("_total") * lit(shareNum))
      .select(col("token"), col("n_occ"))
  }
}
