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
}
