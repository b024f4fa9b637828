package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** INCREMENTAL AGGREGATE MAINTENANCE — the don't-recompute-the-world
  * pattern: keep a per-group partial STATE (sum, count) for the data
  * already ingested, and fold each new delta batch in by merging
  * partial states, never rescanning the base. The algebra is the same
  * partial/final split Spark's own hash aggregate performs inside one
  * query, lifted across queries/batches: sum merges by sum, count by
  * sum — and because the repo's money aggregates are exact decimals,
  * the merge ORDER is invisible, so state-then-merge equals the flat
  * recompute bit-for-bit (the declared query's oracle IS the flat
  * GROUP BY over base ∪ delta).
  *
  * At 100 TB this is the difference between an O(delta) nightly job
  * and an O(corpus) one: the state table is group-cardinality-sized,
  * the delta shuffle is delta-sized, and the merge joins two
  * group-cardinality-sized frames. Works for any algebraic aggregate;
  * avg/stddev derive from (sum, count, sum-of-squares) partials at
  * finalize time.
  */
object Incremental {

  /** Per-group partial state of a slice: keys..., _sum, _n. */
  def partialState(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(value).as("_sum"), count(lit(1)).as("_n"))

  /** Merge any number of partial states (new groups may appear in
    * either input; absent groups contribute nothing). */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum("_sum").as("_sum"), sum("_n").as("_n"))

  /** Finalize a state into the user-facing aggregate columns. */
  def finalizeState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+ col("_sum").as("sum_value") :+ col("_n").as("n"): _*)
}
