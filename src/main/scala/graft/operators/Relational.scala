package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Relational analytics over the TPC-H-ish star schema — the standard
  * scan/filter/join/aggregate/window/set-op surface, written so
  * Catalyst produces the plan you'd want at 100 TB:
  *
  *  - filters sit directly on the scans (parquet pushdown + column
  *    pruning — verified via .explain in the bench audit);
  *  - dimension tables (region/nation/customer/supplier/part) join via
  *    explicit broadcast() hints — no shuffle of the fact table for
  *    dim joins; lineitem⋈orders is the only shuffle exchange, on the
  *    join key both sides;
  *  - money sums are cast to decimal AT THE SCALE WHERE THE DATA IS
  *    EXACT — (38,2) for 2-dp money columns, (38,4) for
  *    price×discount products — making them exact and associative,
  *    so results are partition-order-independent; higher scales like
  *    (38,12) on money magnitudes are the documented cross-engine
  *    double→decimal trap (SURVEY.md §5.2 and the docstring below).
  */
object Relational {

  /** Exact decimal sums, cast at the scale where the DATA is exact.
    * Two observed cross-engine traps (both hit at sf0.1):
    *  - rounding a double at magnitude ≥ ~10⁹ to 6 dp is ULP-ambiguous;
    *  - casting a double to a high-scale decimal diverges between
    *    engines once integer digits + scale exceed ~15 significant
    *    digits (DuckDB's cast multiplies by 10^scale in floating
    *    point).
    * The fixture money columns are clean 2-dp values (verified), so
    * scale 2 — and 4 for a 2dp×2dp product — is exact in both engines;
    * sums of exact decimals are exact and associative. */
  private def dsum2(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,2)"))
  private def dsum4(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,4)"))

  /** TPC-H Q1-style pricing summary: filter + 2-key aggregate. */
  def pricingSummary(s: SparkSession, dir: String, cutoff: String = "1999-01-01"): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < lit(cutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        (dsum2(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Equi-width HISTOGRAM of order value — the profiling workhorse
    * dashboards and skew diagnostics start from: prices go to exact
    * cents via the repo's decimal(38,2) bridge (double→2-dp cast is
    * identical in Spark and DuckDB), bucket = cents DIV `bucketCents`,
    * and each bucket reports row count + exact revenue mass. One
    * partial+final hash aggregate whose output is bucket-count-sized —
    * the histogram of a 100 TB fact costs one scan and a
    * buckets×partitions exchange, nothing else. */
  def priceHistogram(s: SparkSession, dir: String,
                     bucketCents: Long = 5000000L): DataFrame =
    Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(38,2)") * 100).cast("long")
        .as("_cents"))
      .groupBy(expr(s"_cents DIV ${bucketCents}L").as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum("_cents").cast("long").as("revenue_cents"))
      .select(col("bucket"), (col("bucket") * bucketCents).as("bucket_lo_cents"),
        col("n_orders"), col("revenue_cents"))

  /** GLOBAL DECILE REPORT of order value — exact equal-count NTILE
    * over the WHOLE fact without the single-partition sort the naive
    * `NTILE(10) OVER (ORDER BY ...)` plans: the total order is the
    * composite key cents·2³² + o_orderkey (ties broken by key — a
    * TOTAL order, so the decile assignment is deterministic), ranked
    * funnel-free by [[TextAnalysis.stratumRank]]'s two-level
    * range-bucket rank under a constant stratum, then mapped to
    * buckets by the same remainders-first arithmetic as
    * `text_quality_buckets` (first n%k buckets get ⌈n/k⌉ rows).
    * Composite bound: cents < 2³¹ (order values ≤ $21M) and
    * o_orderkey < 2³² keep the key inside int64; wider domains split
    * the key into two rank columns. Output is decile-count-sized:
    * (decile, n_orders, min/max/sum cents). */
  def decileReport(s: SparkSession, dir: String, nBuckets: Int = 10): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(38,2)") * 100).cast("long").as("_cents"))
      .withColumn("_all", lit("all"))
      .withColumn("_key", col("_cents") * lit(1L << 32) + col("o_orderkey"))
    // the total row count rides stratumRank's broadcast counts frame
    // (sizeCol) instead of a separate count pass over the orders scan
    // (r17 optimization round)
    val ranked = TextAnalysis.stratumRank(o, "_all", "_key",
      rankCol = "_rank", sizeCol = Some("_n"))
    ranked
      .withColumn("decile", expr(
        s"""CASE WHEN _rank <= (_n % $nBuckets) * (_n DIV $nBuckets + 1)
           |  THEN (_rank - 1) DIV (_n DIV $nBuckets + 1) + 1
           |  ELSE (_n % $nBuckets)
           |    + (_rank - (_n % $nBuckets) * (_n DIV $nBuckets + 1) - 1)
           |      DIV (_n DIV $nBuckets) + 1
           |END""".stripMargin))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"),
        min("_cents").as("min_cents"),
        max("_cents").as("max_cents"),
        sum("_cents").cast("long").as("sum_cents"))
  }

  /** TPC-H Q3-style: segment customers' open orders ranked by revenue.
    * customer is broadcast; orders⋈lineitem shuffles on the order key. */
  def shippingPriority(s: SparkSession, dir: String,
                       segment: String = "BUILDING",
                       cutoff: String = "1998-01-01"): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === segment)
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation for one region, with the local
    * supplier condition (c_nationkey = s_nationkey). All dims
    * broadcast; facts shuffle once per equi-join key. */
  def localSupplierVolume(s: SparkSession, dir: String,
                          regionName: String = "ASIA"): DataFrame = {
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** Part-dimension join: revenue and volume by brand for a size
    * band. part is broadcast; the p_size filter is pushed to its
    * scan. */
  def brandVolume(s: SparkSession, dir: String, minSize: Int = 20): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_size") >= minSize)
        .select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))

  /** Semi/anti join surface: customers with vs without orders, by
    * segment. */
  def customerOrderPresence(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
    val ordKeys = Tables.orders(s, dir).select("o_custkey")
    val withO = cust.join(ordKeys, cust("c_custkey") === ordKeys("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("with_orders"))
    val withoutO = cust.join(ordKeys, cust("c_custkey") === ordKeys("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("without_orders"))
    withO.unionByName(withoutO).select("c_mktsegment", "kind", "n")
  }

  /** Window-over-join: top k orders by totalprice within each market
    * segment. The naive plan — `row_number()` over a 5-value partition
    * key — funnels the whole fact table into 5 window tasks (one sorts
    * tens of millions of rows at 100×). Instead each input partition
    * keeps a bounded per-segment top-k (no shuffle, O(k·segments)
    * memory), so the final exact rank runs over ≤ k·segments·partitions
    * rows — the same partial-top-k shape as
    * [[Similarity.bruteForceTopK]]. */
  def topOrdersPerSegment(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val joined = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)]
    // (price desc, orderkey asc) — identical tie-break to the window
    val ord = Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
    val partial = joined.mapPartitions { iter =>
      val best = scala.collection.mutable.HashMap
        .empty[String, graft.functions.BoundedTopK[(Double, Long)]]
      iter.foreach { case (seg, okey, price) =>
        best.getOrElseUpdate(seg, new graft.functions.BoundedTopK(k, ord))
          .offer((price, okey))
      }
      best.iterator.flatMap { case (seg, h) =>
        h.iterator.map { case (price, okey) => (seg, okey, price) }
      }
    }.toDF("c_mktsegment", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    partial
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("c_mktsegment", "rank", "o_orderkey", "o_totalprice")
  }

  /** TPC-H Q6-style revenue forecast: tight filter + ungrouped agg —
    * the canonical predicate-pushdown probe. All three predicates
    * reach the parquet scan (date range + discount band + quantity);
    * the plan is scan → partial agg → single-row final agg, zero
    * shuffle of data rows. */
  def revenueForecast(s: SparkSession, dir: String,
                      from: String = "1998-01-01",
                      until: String = "1999-01-01"): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum4(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** Non-equi (range/band) join: each event lands in an IRREGULAR
    * value band. Regular bands would be arithmetic bucketing (a pure
    * projection, no join); irregular bands are the case that genuinely
    * needs a range join. The band table is tiny → broadcast
    * nested-loop join: the fact side streams through unchanged, never
    * shuffles. */
  val ValueBands: Seq[(Double, Double)] =
    Seq((0.0, 10.0), (10.0, 50.0), (50.0, 100.0),
      (100.0, 200.0), (200.0, 400.0), (400.0, 600.0))

  def eventValueBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = ValueBands.toDF("lo", "hi")
    Tables.events(s, dir).select("value")
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
  }

  /** GROUPING SETS ((region, nation), (region), ()) over the customer
    * dimension hierarchy — subtotals at nation, region and grand-total
    * level in one pass (Catalyst expands to a single Expand + hash
    * agg, not three scans). Dims broadcast. */
  def customerGroupingSets(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_nationkey", "c_acctbal")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(s, dir).select("r_regionkey", "r_name")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum2(col("c_acctbal")).as("sum_acctbal"))
  }

  /** Correlated-subquery surface: parts priced above their brand's
    * average retail price, counted per brand. The comparison is kept
    * in EXACT integer/decimal arithmetic (price·count > total, not
    * price > total/count) so no engine's division order can flip a
    * boundary row. Catalyst decorrelates both scalar subqueries into
    * one aggregate + broadcast join — no per-row re-scan. */
  def aboveBrandAverage(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("part_v")
    s.sql(
      """SELECT p_brand, COUNT(*) AS n_above
        |FROM part_v p
        |WHERE CAST(p_retailprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM part_v p2 WHERE p2.p_brand = p.p_brand)
        |    > (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,2)))
        |       FROM part_v p2 WHERE p2.p_brand = p.p_brand)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** Full-outer-join surface: per-nation customer and supplier counts,
    * including nations present on only one side (nulls → 0). Both
    * inputs are pre-aggregated to ≤ |nations| rows before the join, so
    * the full outer join itself moves almost nothing — aggregate
    * before joining whenever the join key is the group key. */
  def nationCoverage(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(p, Seq("nk"), "full_outer")
      .select(col("nk"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  /** Set-operation surface: nation keys segmented by whether they have
    * customers, suppliers, or both (INTERSECT / EXCEPT). */
  def nationPresence(s: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(s, dir).select(col("c_nationkey").as("nk")).distinct()
    val suppN = Tables.supplier(s, dir).select(col("s_nationkey").as("nk")).distinct()
    custN.intersect(suppN).withColumn("kind", lit("both"))
      .unionByName(custN.except(suppN).withColumn("kind", lit("customers_only")))
      .unionByName(suppN.except(custN).withColumn("kind", lit("suppliers_only")))
  }

  /** TPC-H Q18-style large-quantity orders: full-fact aggregate on the
    * fact's own key with a HAVING filter, then enrichment of the tiny
    * survivor set. Scale shape: lineitem shuffles ONCE on l_orderkey
    * (partial+final hash agg); the HAVING filter runs before anything
    * joins, so the orders join sees only the survivors (46 rows at
    * sf0.01); the top-N runs as TakeOrdered over those; the customer
    * name lookup joins AFTER the limit, against ≤ topN rows — the dim
    * join costs nothing regardless of customer's size. Money/quantity
    * emitted as exact fixed-point BIGINT (cents / qty×100). */
  def largeQuantityOrders(s: SparkSession, dir: String,
                          minQty: Int = 300, topN: Int = 100): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(dsum2(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
      .select(col("l_orderkey"), (col("sum_qty") * 100).cast("long").as("sum_qty_x100"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        (col("o_totalprice").cast("decimal(38,2)") * 100).cast("long")
          .as("totalprice_cents"))
    val top = big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
      .limit(topN)
    top.join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("totalprice_cents"), col("sum_qty_x100"))
  }

  /** TPC-H Q14-style promo revenue share for one ship-month. Scale
    * shape: the ship-date filter pushes to the lineitem scan; part is
    * a broadcast dim carrying only (p_partkey, is_promo), so the fact
    * never shuffles — the whole query is scan → broadcast hash join →
    * one partial+final aggregate to a single row. Both revenue sums
    * are exact decimal(38,4) emitted ×10000 as BIGINT, and the share
    * is integer permille ((1000·promo) DIV total) — bit-portable, no
    * double division. */
  def promoRevenue(s: SparkSession, dir: String,
                   from: String = "1996-01-01", until: String = "1996-02-01"): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val dim = broadcast(Tables.part(s, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo")))
    li.join(dim, col("l_partkey") === col("p_partkey"))
      .agg(
        dsum4(when(col("is_promo"), col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(lit(0.0))).as("promo"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total"))
      .select(
        (col("promo") * 10000).cast("long").as("promo_x10000"),
        (col("total") * 10000).cast("long").as("total_x10000"))
      .withColumn("promo_permille",
        expr("(promo_x10000 * 1000) DIV total_x10000"))
  }

  /** TPC-H Q4-style order-priority check: orders placed in a quarter
    * with at least one line item shipped after the order date (the
    * fixture has no commit/receipt dates, so ship-after-order is the
    * lateness witness), counted per priority. The semi-join keeps the
    * orders side single-copy — EXISTS, not a join multiplying by
    * matching line items — and the non-equi lateness predicate rides
    * the equi semi-join on the order key (the only exchange); the
    * quarter filter pushes to the orders scan. */
  def orderPriorityCheck(s: SparkSession, dir: String,
                         from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q10-style returned-item revenue: which customers returned
    * the most money in a quarter. Scale shape: both filters (order
    * date range, l_returnflag = 'R') push to the parquet scans; the
    * fact⋈fact join shuffles on the order key; the per-customer agg is
    * the second (semantically forced) exchange; customer + nation
    * names join AFTER the top-N limit, so the dim joins touch ≤ topN
    * rows. Revenue is the exact decimal(38,4) sum emitted ×10000. */
  def returnedRevenue(s: SparkSession, dir: String,
                      from: String = "1996-01-01", until: String = "1996-04-01",
                      topN: Int = 20): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val top = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("o_custkey"), (col("revenue") * 10000).cast("long").as("revenue_x10000"))
      .orderBy(col("revenue_x10000").desc, col("o_custkey"))
      .limit(topN)
    top
      .join(broadcast(Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue_x10000"))
  }
}
