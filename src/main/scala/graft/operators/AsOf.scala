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
    *                   DuckDB `ASOF LEFT JOIN` equivalent). */
  def joinLatestBefore(left: DataFrame, right: DataFrame, key: String,
                       ts: String, rightCols: Seq[String]): DataFrame = {
    val attached = rightCols.map(c => s"_r_$c")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_tag", lit(1))
      .select(Seq(col(key), col(ts), col("_tag")) ++
        leftCols.filterNot(Seq(key, ts).contains).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c"))
        ++ Seq(lit(null).cast(right.schema(ts).dataType).as("_r_ts")): _*)
    val r = right
      .withColumn("_tag", lit(0))
      .select(Seq(col(key), col(ts), col("_tag")) ++
        leftCols.filterNot(Seq(key, ts).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"_r_$c")) ++ Seq(col(ts).as("_r_ts")): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select((Seq(col(key), col(ts), col("_tag")) ++
        leftCols.filterNot(Seq(key, ts).contains).map(col) ++
        (attached :+ "_r_ts").map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
    filled.filter(col("_tag") === 1).drop("_tag")
  }
}
