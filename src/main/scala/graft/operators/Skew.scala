package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers. AQE (on by default in Spark 4) already
  * splits skewed join/aggregate partitions at runtime; these utilities
  * cover the cases AQE can't — a single pathological group key whose
  * partial aggregate itself overwhelms one task.
  */
object Skew {

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
}
