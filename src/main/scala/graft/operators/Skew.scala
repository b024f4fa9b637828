package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers. AQE (on by default in Spark 4) already
  * splits skewed join/aggregate partitions at runtime; these utilities
  * cover the cases AQE can't — a single pathological group key whose
  * partial aggregate itself overwhelms one task.
  */
object Skew {

  /** KEY-SKEW report — the observability pass an operator runs BEFORE
    * deciding to salt a join or aggregate: the k heaviest keys with
    * each one's share of all rows and its ratio to the mean key load
    * (both integer permille — ratio 1000 = perfectly uniform; the
    * AQE skew-join threshold conversation starts around 5-10×).
    *
    * Scale shape: one map-side-combined key aggregate (the same
    * exchange any group-by on the key pays), two 1-row totals
    * broadcast, TakeOrdered for the head — per-partition heaps, no
    * global sort, k rows out. */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum("n_rows").as("_total"),
      count(lit(1)).as("_nkeys"))
    val top = counts
      .orderBy(col("n_rows").desc, col("key"))
      .limit(k)
    top.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_rows").desc, col("key"))).cast("int"))
      .select(col("rank"), col("key"), col("n_rows"),
        expr("(1000 * n_rows) DIV _total").as("share_permille"),
        // the 1000·n_rows·nkeys product goes through DECIMAL(38,0)
        // (r11 ADVICE): in BIGINT it silently overflows once
        // n_rows·nkeys passes ~9.2e15 — reachable at target scale
        // (1e12 events over 1e7 keys); the decimal intermediate is
        // exact to 38 digits and DIV truncates identically in both
        // engines (the oracle rides HUGEINT)
        expr("CAST((CAST(n_rows AS DECIMAL(38,0)) * _nkeys * 1000) DIV _total AS BIGINT)")
          .as("x_mean_permille"))
      .orderBy("rank")
  }

  /** Two-phase salted aggregation for algebraic aggregates: group on
    * (key, salt) first — spreading one hot key over `buckets` tasks —
    * then re-aggregate per key. `partials` maps each value column to
    * its (phase-1 agg, phase-2 re-agg) pair, e.g. sum/sum, count/sum,
    * min/min, max/max.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                      partials: Seq[(Column => Column, String)],
                      values: Seq[Column]): DataFrame = {
    require(partials.length == values.length)
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(
        partials.head._1(values.head).as("_a0"),
        partials.tail.zip(values.tail).zipWithIndex.map {
          case (((f, _), v), i) => f(v).as(s"_a${i + 1}")
        }: _*)
    val reaggs = partials.zipWithIndex.map { case ((_, reagg), i) =>
      expr(s"$reagg(_a$i)").as(s"agg$i")
    }
    phase1.groupBy(keys.map(col): _*).agg(reaggs.head, reaggs.tail: _*)
  }

  /** Convenience: salted sum+count per key (covers avg/sum/count under
    * one hot key). Output: keys..., sum_value, n. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     buckets: Int = 16): DataFrame =
    saltedAggregate(df, keys, buckets,
      Seq((sum, "sum"), ((c: Column) => count(c), "sum")),
      Seq(value, lit(1)))
      .withColumnRenamed("agg0", "sum_value")
      .withColumnRenamed("agg1", "n")

  /** SALTED SKEW JOIN — the join-side counterpart of
    * [[saltedAggregate]], for when BOTH sides must shuffle (neither
    * broadcasts) and the probe side is pathologically skewed on the
    * join key: a hot key that hash-partitions into one task turns a
    * 1000-executor join into a 1-task join. Salting restores
    * parallelism deterministically: the probe side gets a salt in
    * [0, buckets) derived from row content (partition id + row id —
    * any uniform source works; result-invisible by construction), the
    * build side replicates each row `buckets` times with every salt,
    * and the join runs on (key, salt) — each hot key now spreads over
    * `buckets` tasks. Build-side cost: ×buckets rows, the standard
    * replication trade; keep the build side the smaller one.
    *
    * Returns the joined frame (probe columns + build columns minus
    * the build's join key). Inner-join semantics; EXACTLY the rows of
    * the plain inner join (SkewSpec pins equality and the no-funnel
    * task profile under a forced shuffle-hash join). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)).cast("int"))
    val replicated = build
      .withColumn("_salt", explode(array((0 until buckets).map(lit): _*)))
      .withColumnRenamed(key, "_bkey")
    salted
      .join(replicated.hint("shuffle_hash"),
        salted(key) === replicated("_bkey") && salted("_salt") === replicated("_salt"),
        "inner")
      .drop("_salt").drop("_bkey")
  }
}
