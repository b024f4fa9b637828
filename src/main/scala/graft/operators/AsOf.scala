package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic time-series operator Spark lacks as a
  * primitive: for every left row, attach the most recent right row
  * (per key) whose timestamp is ≤ the left timestamp.
  *
  * Realized Spark-first as a union + window (`last(..., ignoreNulls)`
  * over rows-unbounded-preceding): both sides are tagged and unioned,
  * then a single shuffle on the key + one sort by (ts, tag) streams
  * right-side values forward into left rows. That is the minimal
  * physical cost for this operator on any engine — one exchange, one
  * sort — so no custom SparkPlan is needed (SURVEY spec preference
  * (a): compose built-ins).
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
    val w = Window.partitionBy(key).orderBy(col(ts), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("_r_filled", last(col("_r_row"), ignoreNulls = true).over(w))
    filled.filter(col("_tag") === 1)
      .select((Seq(col(key), col(ts)) ++
        leftCols.filterNot(Seq(key, ts).contains).map(col) ++
        rightCols.map(c => col(s"_r_filled.$c").as(s"_r_$c")) ++
        Seq(col("_r_filled._r_ts_field").as("_r_ts"))): _*)
  }
}
