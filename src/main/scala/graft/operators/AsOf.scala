package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic time-series operator Spark lacks as a
  * primitive: for every left row, attach the nearest right row (per
  * key) on one side of the left timestamp — most recent at-or-before
  * (backward, the default everywhere), or earliest at-or-after
  * (forward, the "next reading" direction).
  *
  * Realized Spark-first as a union + window (`last(..., ignoreNulls)`
  * over rows-unbounded-preceding): both sides are tagged and unioned,
  * then a single shuffle on the key + one sort by (ts, tag) streams
  * right-side values forward into left rows. That is the minimal
  * physical cost for this operator on any engine — one exchange, one
  * sort — so no custom SparkPlan is needed (SURVEY spec preference
  * (a): compose built-ins). The forward direction is the SAME plan
  * with the sort order reversed — no second mechanism.
  *
  * Right side must be unique per (key, ts) — pre-aggregate if not, or
  * ties resolve to the last row in (ts) order nondeterministically.
  */
object AsOf {

  /** @param rightCols right-side value columns to attach (left-null
    *                   when no match exists — left-join semantics,
    *                   DuckDB `ASOF LEFT JOIN` equivalent).
    *
    * The right row travels as ONE struct through the window fill, so a
    * NULL inside one of its value columns can never cause values from
    * different right rows to be mixed (`last(ignoreNulls)` skips only
    * whole missing rows, never individual fields). */
  def joinLatestBefore(left: DataFrame, right: DataFrame, key: String,
                       ts: String, rightCols: Seq[String]): DataFrame =
    joinDirected(left, right, key, ts, rightCols, forward = false)

  /** Forward as-of: for every left row, the EARLIEST right row (per
    * key) with right.ts ≥ left.ts — "next purchase after this event".
    * Same single-exchange plan as [[joinLatestBefore]] with the window
    * sort reversed; ties at equal ts match (inclusive), mirroring the
    * backward direction. DuckDB equivalent: `ASOF LEFT JOIN … ON
    * l.key = r.key AND l.ts <= r.ts`. */
  def joinEarliestAfter(left: DataFrame, right: DataFrame, key: String,
                        ts: String, rightCols: Seq[String]): DataFrame =
    joinDirected(left, right, key, ts, rightCols, forward = true)

  private def joinDirected(left: DataFrame, right: DataFrame, key: String,
                           ts: String, rightCols: Seq[String],
                           forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val rowStruct = struct((rightCols.map(col) :+ col(ts).as("_r_ts_field")): _*)
    val nullRow = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        rightCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)) :+
          org.apache.spark.sql.types.StructField("_r_ts_field", right.schema(ts).dataType)))
    val l = left
      .withColumn("_tag", lit(1))
      .select(Seq(col(key), col(ts), col("_tag")) ++
        leftCols.filterNot(Seq(key, ts).contains).map(col) ++
        Seq(nullRow.as("_r_row")): _*)
    val r = right
      .withColumn("_tag", lit(0))
      .select(Seq(col(key), col(ts), col("_tag")) ++
        leftCols.filterNot(Seq(key, ts).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(rowStruct.as("_r_row")): _*)
    // Backward: scan ascending, the latest right ≤ current left is the
    // last right row seen. Forward: scan DESCENDING, the earliest
    // right ≥ current left is the last right row seen. Right rows sort
    // before left at equal ts in both directions (tag 0 first asc;
    // explicit tag asc within ts desc) so equal-ts matches are
    // inclusive on both sides.
    val w = (if (forward)
      Window.partitionBy(key).orderBy(col(ts).desc, col("_tag").asc)
    else
      Window.partitionBy(key).orderBy(col(ts).asc, col("_tag").asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("_r_filled", last(col("_r_row"), ignoreNulls = true).over(w))
    filled.filter(col("_tag") === 1)
      .select((Seq(col(key), col(ts)) ++
        leftCols.filterNot(Seq(key, ts).contains).map(col) ++
        rightCols.map(c => col(s"_r_filled.$c").as(s"_r_$c")) ++
        Seq(col("_r_filled._r_ts_field").as("_r_ts"))): _*)
  }

  /** BIDIRECTIONAL NEAREST as-of: for every left row, the right row
    * (per key) with the SMALLEST absolute time gap, whichever side of
    * the left timestamp it falls on — ties (equal µs gap both ways)
    * resolve backward, matching the repo's backward-default
    * convention. "Nearest reading to this moment" is the sensor-fusion
    * / feature-alignment variant neither single direction expresses.
    *
    * Plan: the SAME tagged union as the directed joins, then BOTH
    * fills — the backward `last(ignoreNulls)` over the ascending sort
    * and the forward one over the descending sort — inside ONE key
    * exchange (two sorts, zero extra shuffles; running the two
    * directed joins separately and re-joining on the left key would
    * cost three exchanges). Output: left columns + `_r_<c>`/`_r_ts`
    * from the nearer row (null when the key has no right rows) +
    * `_dir` ('back' | 'fwd' | 'none'). */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
                  ts: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rowStruct = struct((rightCols.map(col) :+ col(ts).as("_r_ts_field")): _*)
    val nullRow = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        rightCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)) :+
          org.apache.spark.sql.types.StructField("_r_ts_field", right.schema(ts).dataType)))
    val l = left
      .withColumn("_tag", lit(1))
      .select(Seq(col(key), col(ts), col("_tag")) ++
        leftCols.filterNot(Seq(key, ts).contains).map(col) ++
        Seq(nullRow.as("_r_row")): _*)
    val r = right
      .withColumn("_tag", lit(0))
      .select(Seq(col(key), col(ts), col("_tag")) ++
        leftCols.filterNot(Seq(key, ts).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(rowStruct.as("_r_row")): _*)
    val wB = Window.partitionBy(key).orderBy(col(ts).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key).orderBy(col(ts).desc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val backGap = unix_micros(col(ts)) - unix_micros(col("_r_back._r_ts_field"))
    val fwdGap = unix_micros(col("_r_fwd._r_ts_field")) - unix_micros(col(ts))
    val pickBack = col("_r_fwd").isNull || (col("_r_back").isNotNull && backGap <= fwdGap)
    val picked = when(pickBack, col("_r_back")).otherwise(col("_r_fwd"))
    l.unionByName(r)
      .withColumn("_r_back", last(col("_r_row"), ignoreNulls = true).over(wB))
      .withColumn("_r_fwd", last(col("_r_row"), ignoreNulls = true).over(wF))
      .filter(col("_tag") === 1)
      .withColumn("_r_picked", picked)
      .withColumn("_dir",
        when(col("_r_picked").isNull, lit("none"))
          .when(pickBack, lit("back")).otherwise(lit("fwd")))
      .select((Seq(col(key), col(ts)) ++
        leftCols.filterNot(Seq(key, ts).contains).map(col) ++
        rightCols.map(c => col(s"_r_picked.$c").as(s"_r_$c")) ++
        Seq(col("_r_picked._r_ts_field").as("_r_ts"), col("_dir"))): _*)
  }
}
