package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RUNTIME BLOOM-FILTER JOIN PRUNING — sideways information passing,
  * hand-rolled from exact-integer primitives so the whole mechanism is
  * engine-portable and the declared query stays oracle-checkable (the
  * oracle is the PLAIN semi-join: the filter must be result-invisible,
  * like the salted-agg and KMV bucketing oracles).
  *
  * The 100 TB story: a selective dimension predicate should prune the
  * fact-table scan BEFORE the join exchange, not after it. Spark's own
  * AQE injects `bloom_filter_agg` runtime filters for exactly this
  * reason; this operator makes the mechanism explicit and exact:
  *   1. the build side's distinct keys hash (affine Lehmer family,
  *      same public MINSTD constants as [[Sketches]]) into an m-bit
  *      bitmap, OR-aggregated per 64-bit word IN-PLAN — the driver
  *      collects m/64 longs (16 KB at m = 2¹⁷), NEVER the keys, so
  *      the collect is bounded regardless of build cardinality;
  *   2. the bitmap re-enters the probe plan as an array LITERAL, so
  *      the membership test runs inside whole-stage codegen at the
  *      scan — probe rows that miss drop before the shuffle;
  *   3. an exact semi-join over the survivors kills the false
  *      positives (rate (1−e^(−kn/m))^k ≈ 3·10⁻⁴ at n = 3 k keys,
  *      m = 2¹⁷, k = 3), so the shuffle carries matches + ε instead
  *      of the full fact table.
  */
object Bloom {
  val HashP: Long = Sketches.HashP

  /** nHashes (a, b) pairs off the MINSTD Lehmer stream. */
  def coeffs(nHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val s0 = math.floorMod(seed, HashP - 1) + 1
    Iterator.iterate(s0)(x => x * 48271L % HashP).drop(1)
      .grouped(2).map(g => (g.head, g.last)).take(nHashes).toSeq
  }

  private def positions(key: Column, mBits: Long, nHashes: Int, seed: Long): Seq[Column] =
    coeffs(nHashes, seed).map { case (a, b) =>
      (pmod(key.cast("bigint"), lit(HashP)) * lit(a) + lit(b)) % lit(HashP) % lit(mBits)
    }

  /** Aggregate the build side's keys into an m = 64·mWords bit bloom
    * bitmap. Distributed: positions explode in-plan (nHashes rows per
    * distinct key), `bit_or` partial-aggregates per word index, and
    * only the ≤ mWords (word, bits) rows reach the driver. */
  def buildBitmap(keys: DataFrame, keyCol: String,
                  mWords: Int, nHashes: Int, seed: Long): Array[Long] = {
    val mBits = mWords * 64L
    // null keys are dropped BEFORE hashing: a plain semi-join ignores
    // them (null never equi-matches), and a null position would
    // otherwise null the aggregated word and NPE the driver fill
    val pos = keys.select(col(keyCol).cast("bigint").as("_k"))
      .filter(col("_k").isNotNull).distinct()
      .select(explode(array(positions(col("_k"), mBits, nHashes, seed): _*)).as("_pos"))
    val rows = pos
      .select(shiftright(col("_pos"), 6).cast("int").as("_w"),
        call_function("shiftleft", lit(1L), col("_pos").bitwiseAND(lit(63L)).cast("int")).as("_mask"))
      .groupBy("_w").agg(bit_or(col("_mask")).as("_bits"))
      .collect()
    val words = new Array[Long](mWords)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Codegen-friendly membership test: the bitmap is an array literal,
    * each hash probes one word with element_at + mask. No false
    * negatives by construction (same positions() as the build). */
  def mightContain(key: Column, words: Array[Long], nHashes: Int, seed: Long): Column =
    positions(key, words.length * 64L, nHashes, seed).map { pos =>
      val word = element_at(typedlit(words.toSeq), shiftright(pos, 6).cast("int") + lit(1))
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), pos.bitwiseAND(lit(63L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)

  /** Semi-join `probe` to `build`'s keys with bloom pre-pruning: the
    * bitmap filter drops non-matching probe rows at the scan, the
    * exact left-semi join removes the residual false positives. The
    * result is EXACTLY the plain semi-join for any bitmap size —
    * mWords only moves the pruning rate (result-invariance is
    * spec-pinned down to a deliberately saturated 64-bit bitmap). */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    mWords: Int = 2048, nHashes: Int = 3, seed: Long = 91L): DataFrame = {
    val words = buildBitmap(build, buildKey, mWords, nHashes, seed)
    probe.filter(mightContain(col(probeKey), words, nHashes, seed))
      .join(build.select(col(buildKey).cast("bigint").as("_bk")).distinct(),
        col(probeKey).cast("bigint") === col("_bk"), "left_semi")
  }
}
