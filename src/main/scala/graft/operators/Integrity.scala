package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-integrity operators a production pipeline runs between every
  * ingest and every publish: snapshot diffing (change-data capture
  * between two versions of a table) and an order-independent table
  * checksum (cheap equality witness for replication / backfill /
  * migration validation — compare two fingerprints instead of two
  * tables).
  */
object Integrity {

  /** SNAPSHOT DIFF — classify every key across two table versions as
    * `added` (only in `after`), `removed` (only in `before`) or
    * `changed` (present in both, any compared column differing,
    * null-safely). Unchanged keys are dropped — the output is
    * delta-sized, not table-sized.
    *
    * Scale shape: ONE full-outer shuffle join on the key — the floor
    * for any diff — with the comparison columns carried alongside;
    * no collect, no window. At 100 TB both sides shuffle once on the
    * same partitioning; bucketed snapshot storage would remove even
    * that exchange. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    val b = before.select((key +: compareCols).map(c => col(c).as(s"_b_$c")): _*)
    val a = after.select((key +: compareCols).map(c => col(c).as(s"_a_$c")): _*)
    val joined = b.join(a, col(s"_b_$key") === col(s"_a_$key"), "full_outer")
    val differs = compareCols
      .map(c => !(col(s"_b_$c") <=> col(s"_a_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change_kind",
        when(col(s"_b_$key").isNull, "added")
          .when(col(s"_a_$key").isNull, "removed")
          .when(differs, "changed"))
      .filter(col("change_kind").isNotNull)
      .select(coalesce(col(s"_b_$key"), col(s"_a_$key")).as(key) +:
        col("change_kind") +:
        compareCols.flatMap(c =>
          Seq(col(s"_b_$c").as(s"old_$c"), col(s"_a_$c").as(s"new_$c"))): _*)
  }

  /** ORDER-INDEPENDENT TABLE CHECKSUM over integral columns: each row
    * hashes through the exact affine Lehmer family
    * (h = (Σᵢ (vᵢ mod P)·aᵢ + b) mod P, coefficients from the shared
    * MINSTD stream), and a group's fingerprint is Σ h mod P — a
    * commutative fold, so the result is invariant to row order,
    * partitioning and execution plan, and any engine replays it
    * bit-for-bit (unlike engine-private hash aggregates).
    *
    * Sensitivity: a single-row change shifts the sum by a nonzero
    * delta mod P unless the new row hashes identically — adversarial
    * collisions are trivial (the hash is linear, this is an integrity
    * check, not an authenticator), random corruption is caught with
    * probability 1 − 1/P.
    *
    * Scale shape: partial sums combine map-side; one group-cardinality
    * exchange carries (group, partial Σ, partial n). The sum
    * accumulates in decimal(38,0) — exact far past 100 TB of rows —
    * and reduces mod P at the end. */
  def tableChecksum(df: DataFrame, groupCols: Seq[String],
                    values: Seq[Column], seed: Long = 101L): DataFrame = {
    val p = Sketches.HashP
    val s0 = math.floorMod(seed, p - 1) + 1
    val coeffs = Iterator.iterate(s0)(x => x * 48271L % p).drop(1)
      .take(values.length + 1).toSeq
    val b = coeffs.last
    // stepwise mod: acc stays < P, each term < P², so the running sum
    // never exceeds ~1.1e18 no matter how many columns are hashed
    val h = values.zip(coeffs.init).foldLeft(lit(b).cast("bigint")) {
      case (acc, (v, a)) => (acc + pmod(v.cast("bigint"), lit(p)) * lit(a)) % lit(p)
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (sum(h.cast("decimal(38,0)")) % lit(p)).cast("long").as("checksum"))
  }

  /** MERGE / UPSERT — apply a change feed in [[snapshotDiff]]'s output
    * shape (`key, change_kind`, old/new value columns) onto a
    * snapshot: `removed` keys are deleted, `added`/`changed` keys take
    * their `new_` values, untouched keys pass through. Spark core has no MERGE INTO
    * (that lives in table formats); this is the engine-level half —
    * round-trip law: `applyChanges(before, snapshotDiff(before, after))
    * ≡ after`, spec-pinned and hash-checked at scale by
    * `rel_merge_upsert`.
    *
    * Scale shape: one left-anti shuffle join on the key (snapshot vs
    * delta keys — the floor for keyed deletion) plus a union with the
    * delta-sized upsert set; no window, no collect. Bucketing both
    * sides on the key would make the anti join exchange-free. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    val upserts = changes
      .filter(col("change_kind").isin("added", "changed"))
      .select(col(key) +: compareCols.map(c => col(s"new_$c").as(c)): _*)
    snapshot
      .select((key +: compareCols).map(col): _*)
      .join(changes.select(key), Seq(key), "left_anti")
      .unionByName(upserts)
  }

  /** REFERENTIAL AUDIT — the key-consistency gate between two tables
    * a pipeline is about to join or co-publish (e.g. a document store
    * and its embedding index: "does every doc have exactly one vector,
    * and are there orphan vectors?"). One row out: left/right key
    * counts, distinct-key counts (duplicate detection), matched keys,
    * and each side's orphans.
    *
    * Scale shape: both key columns distinct-reduce map-side, then ONE
    * key exchange (the full-outer join on distinct keys — the floor
    * for set comparison); the report aggregate is a 1-row reduce.
    * Bucketing both tables on the key would remove the exchange. */
  def referentialAudit(left: DataFrame, leftKey: String,
                       right: DataFrame, rightKey: String): DataFrame = {
    val lk = left.select(col(leftKey).cast("long").as("k"))
    val rk = right.select(col(rightKey).cast("long").as("k"))
    val l = lk.groupBy("k").agg(count(lit(1)).as("_ln"))
    val r = rk.groupBy("k").agg(count(lit(1)).as("_rn"))
    l.join(r, Seq("k"), "full_outer")
      .agg(
        sum(coalesce(col("_ln"), lit(0L))).as("n_left"),
        sum(coalesce(col("_rn"), lit(0L))).as("n_right"),
        sum(when(col("_ln").isNotNull, 1L).otherwise(0L)).as("n_left_keys"),
        sum(when(col("_rn").isNotNull, 1L).otherwise(0L)).as("n_right_keys"),
        sum(when(col("_ln").isNotNull && col("_rn").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("_rn").isNull, 1L).otherwise(0L)).as("n_left_orphans"),
        sum(when(col("_ln").isNull, 1L).otherwise(0L)).as("n_right_orphans"),
        sum(when(col("_ln") > 1L, 1L).otherwise(0L)).as("n_left_dup_keys"),
        sum(when(col("_rn") > 1L, 1L).otherwise(0L)).as("n_right_dup_keys"))
  }

  /** The oracle-side coefficient stream for [[tableChecksum]] — one
    * source of truth for query SQL generation. */
  def checksumCoeffs(nValues: Int, seed: Long = 101L): (Seq[Long], Long) = {
    val p = Sketches.HashP
    val s0 = math.floorMod(seed, p - 1) + 1
    val cs = Iterator.iterate(s0)(x => x * 48271L % p).drop(1)
      .take(nValues + 1).toSeq
    (cs.init, cs.last)
  }
}
