package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Helpers enforcing the hash-match determinism rules of SURVEY.md §5.2
  * / FIXTURES.md: every declared query orders by a unique key and
  * rounds derived doubles to 6 dp (or emits ints/strings/decimals).
  */
object Determinism {
  /** Round a derived double to 6 dp (Spark HALF_UP == DuckDB
    * half-away-from-zero for the non-negative / generic positive case;
    * both agree on all finite doubles away from exact .5e-6 ULP
    * boundaries, which the 6-dp rule is designed to avoid). */
  def round6(c: Column): Column = round(c, 6)

  /** Globally order the output; the harness's `coalesce(1)` preserves
    * both partition order and intra-partition order, so the written
    * single file is globally sorted. */
  def ordered(df: DataFrame, keys: Column*): DataFrame = df.orderBy(keys: _*)
}
