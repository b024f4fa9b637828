package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1 groups cover all filtered rows") {
    val q1 = Relational.pricingSummary(spark, sf001)
    val total = q1.agg(sum("count_order")).collect()(0).getLong(0)
    val expected = Tables.lineitem(spark, sf001)
      .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp")).count()
    assert(total === expected)
  }

  test("q3 returns at most 10 rows in non-increasing revenue order") {
    val r = Relational.shippingPriority(spark, sf001).collect()
    assert(r.length <= 10 && r.nonEmpty)
    val rev = r.map(_.getDecimal(2).doubleValue)
    assert(rev.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("q5 revenue by nation: nations belong to the chosen region") {
    val names = Relational.localSupplierVolume(spark, sf001, "ASIA")
      .select("n_name").collect().map(_.getString(0)).toSet
    val asian = Tables.nation(spark, sf001)
      .join(Tables.region(spark, sf001).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(names.subsetOf(asian))
  }

  test("semi + anti partition the customer table") {
    val p = Relational.customerOrderPresence(spark, sf001)
    assert(p.agg(sum("n")).collect()(0).getLong(0) ===
      Tables.customer(spark, sf001).count())
  }

  test("window rank: exactly k rows per segment, ranks 1..k") {
    val r = Relational.topOrdersPerSegment(spark, sf001, 3).collect()
    r.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3))
    }
  }

  test("set ops partition the union of nation keys") {
    val p = Relational.nationPresence(spark, sf001).collect()
    val byKind = p.groupBy(_.getString(1)).view.mapValues(_.map(_.getInt(0)).toSet).toMap
    val both = byKind.getOrElse("both", Set.empty)
    val co = byKind.getOrElse("customers_only", Set.empty)
    val so = byKind.getOrElse("suppliers_only", Set.empty)
    assert((both & co).isEmpty && (both & so).isEmpty && (co & so).isEmpty)
    assert(p.map(_.getInt(0)).length === p.map(r => (r.getInt(0), r.getString(1))).distinct.length)
  }
}
