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

  test("q6 forecast equals the unaggregated filter-sum") {
    val r = Relational.revenueForecast(spark, sf001).collect()(0)
    val manual = Tables.lineitem(spark, sf001)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(38,4)")))
      .collect()(0)
    assert(r.getDecimal(0) === manual.getDecimal(0))
  }

  test("range join equals arithmetic bucketing on the regular sub-bands") {
    // every event with value < 600 falls in exactly one band
    val bands = Relational.eventValueBands(spark, sf001)
    val inBands = bands.agg(sum("n")).collect()(0).getLong(0)
    val expected = Tables.events(spark, sf001)
      .filter(col("value") >= 0.0 && col("value") < 600.0).count()
    assert(inBands === expected)
    // and per-band counts match a direct filter
    val perBand = bands.collect().map(r => (r.getDouble(0), r.getLong(2))).toMap
    Relational.ValueBands.foreach { case (lo, hi) =>
      val n = Tables.events(spark, sf001)
        .filter(col("value") >= lo && col("value") < hi).count()
      assert(perBand.getOrElse(lo, 0L) === n, s"band [$lo,$hi)")
    }
  }

  test("grouping sets: nation rows + region subtotals + grand total") {
    val rows = Relational.customerGroupingSets(spark, sf001).collect()
    val nations = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    val regions = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    val total = Tables.customer(spark, sf001).count()
    assert(grand(0).getLong(2) === total)
    assert(nations.map(_.getLong(2)).sum === total)
    assert(regions.map(_.getLong(2)).sum === total)
    // each region subtotal equals the sum of its nations' counts
    assert(regions.length === Tables.region(spark, sf001).count().toInt)
  }

  test("correlated subquery agrees with the window-function formulation") {
    val sq = Relational.aboveBrandAverage(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val win = Tables.part(spark, sf001)
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("p_brand")))
      .withColumn("tot", sum(col("p_retailprice").cast("decimal(18,2)")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("p_brand")))
      .filter(col("p_retailprice").cast("decimal(18,2)") * col("cnt") > col("tot"))
      .groupBy("p_brand").agg(count(lit(1)).as("n_above"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sq === win)
  }

  test("full outer join covers every nation present on either side") {
    val cov = Relational.nationCoverage(spark, sf001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val custN = Tables.customer(spark, sf001).select("c_nationkey")
      .distinct().collect().map(_.getInt(0)).toSet
    val suppN = Tables.supplier(spark, sf001).select("s_nationkey")
      .distinct().collect().map(_.getInt(0)).toSet
    assert(cov.keySet === (custN ++ suppN))
    // totals reconcile
    assert(cov.values.map(_._1).sum === Tables.customer(spark, sf001).count())
    assert(cov.values.map(_._2).sum === Tables.supplier(spark, sf001).count())
    // one-sided nations report 0, not null (would have thrown on getLong)
    (custN diff suppN).foreach(nk => assert(cov(nk)._2 === 0L))
    (suppN diff custN).foreach(nk => assert(cov(nk)._1 === 0L))
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

  test("bloom semi-join equals the plain semi-join for any bitmap size") {
    import org.apache.spark.sql.functions._
    val hi = graft.io.Tables.orders(spark, sf001)
      .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
    val li = graft.io.Tables.lineitem(spark, sf001).select("l_orderkey", "l_linenumber")
    val plain = li.join(hi.withColumnRenamed("o_orderkey", "_bk"),
        col("l_orderkey") === col("_bk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    def run(mWords: Int) = graft.operators.Bloom
      .bloomSemiJoin(li, "l_orderkey", hi, "o_orderkey", mWords = mWords)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(run(2048) === plain)
    // a deliberately SATURATED 64-bit bitmap still yields the exact
    // result — the exact semi-join absorbs every false positive
    assert(run(1) === plain)
  }

  test("bloom bitmap has no false negatives and prunes most non-matching rows") {
    import org.apache.spark.sql.functions._
    val hi = graft.io.Tables.orders(spark, sf001)
      .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
    val words = graft.operators.Bloom.buildBitmap(hi, "o_orderkey", 2048, 3, 91L)
    // every build key must pass its own bitmap
    val misses = hi.filter(!graft.operators.Bloom.mightContain(col("o_orderkey"), words, 3, 91L))
    assert(misses.count() === 0)
    val li = graft.io.Tables.lineitem(spark, sf001)
    val pass = li.filter(graft.operators.Bloom.mightContain(col("l_orderkey"), words, 3, 91L)).count()
    val exact = li.join(hi.withColumnRenamed("o_orderkey", "_bk"),
      col("l_orderkey") === col("_bk"), "left_semi").count()
    val total = li.count()
    // pruning does real work pre-shuffle: survivors ≈ matches + ε,
    // far below the full scan the plain join would exchange
    assert(pass >= exact)
    assert(pass - exact <= (total - exact) / 10,
      s"bloom passed $pass vs $exact exact of $total total — FPR too high")
  }

  test("q18: every surviving order's recomputed quantity exceeds the HAVING bar") {
    val got = graft.operators.Relational.largeQuantityOrders(spark, sf001, minQty = 200)
    val sums = graft.io.Tables.lineitem(spark, sf001)
      .groupBy("l_orderkey")
      .agg((sum(col("l_quantity").cast("decimal(38,2)")) * 100).cast("long").as("sq"))
    val joined = got.join(sums, got("o_orderkey") === sums("l_orderkey"))
    assert(joined.filter(col("sum_qty_x100") =!= col("sq")).count() === 0)
    assert(got.filter(col("sum_qty_x100") <= 200 * 100).count() === 0)
    assert(got.count() > 0)
  }

  test("q14: promo share bounded and total matches a direct recomputation") {
    val r = Relational.promoRevenue(spark, sf001).collect()
    assert(r.length === 1)
    val (promo, total, permille) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(promo >= 0 && promo <= total)
    assert(permille === promo * 1000 / total)
    val direct = Tables.lineitem(spark, sf001)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .join(Tables.part(spark, sf001), col("l_partkey") === col("p_partkey"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(38,4)")) * 10000).cast("long"))
      .collect()(0).getLong(0)
    assert(total === direct)
  }

  test("q4: priority counts equal distinct late orders per priority") {
    val got = Relational.orderPriorityCheck(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.orders(spark, sf001)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sf001),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === direct)
    assert(got.values.sum > 0)
  }

  test("q10: returned revenue matches a direct recomputation for the top customer") {
    val got = graft.operators.Relational.returnedRevenue(spark, sf001)
      .orderBy(col("revenue_x10000").desc, col("c_custkey")).collect()
    assert(got.length > 0 && got.length <= 20)
    // non-increasing revenue
    assert(got.sliding(2).forall(p =>
      p.length < 2 || p(0).getLong(3) >= p(1).getLong(3)))
    val top = got.head
    val direct = graft.io.Tables.lineitem(spark, sf001)
      .filter(col("l_returnflag") === "R")
      .join(graft.io.Tables.orders(spark, sf001)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey") === top.getLong(0))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(38,4)")) * 10000).cast("long"))
      .collect()(0).getLong(0)
    assert(direct === top.getLong(3))
  }

  test("price histogram: mass conservation and per-bucket bounds") {
    val orders = graft.io.Tables.orders(spark, sf001)
    val width = 5000000L
    val h = graft.operators.Relational.priceHistogram(spark, sf001, width)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every order lands in exactly one bucket; cents mass conserved
    assert(h.map(_._3).sum === orders.count())
    val allCents = orders
      .agg(sum((col("o_totalprice").cast("decimal(38,2)") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(h.map(_._4).sum === allCents)
    h.foreach { case (b, lo, n, rev) =>
      assert(lo === b * width)
      assert(rev >= n * lo && rev < n * (lo + width), s"bucket $b out of bounds")
    }
  }

  test("decile report: equal-count buckets, ordered boundaries, exact totals") {
    val d = Relational.decileReport(spark, sf001)
      .orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val orders = Tables.orders(spark, sf001)
    val total = orders.count()
    val allCents = orders
      .select(sum((col("o_totalprice").cast("decimal(38,2)") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(d.map(_._1).toSeq === (1L to 10L))
    assert(d.map(_._2).sum === total)
    assert(d.map(_._5).sum === allCents)
    // equal-count: sizes differ by at most 1, remainders to the front
    val sizes = d.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sorted.reverse.toSeq === sizes.toSeq)
    // value-ordered: each decile's max <= the next decile's min (ties
    // can straddle a boundary, so <=, not <)
    d.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"decile ${a._1} max ${a._4} > decile ${b._1} min ${b._3}")
    }
    d.foreach { case (_, _, mn, mx, _) => assert(mn <= mx) }
  }
}
