package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.AsOf

/** Declared queries for the remaining analytic surfaces: rollup
  * hierarchies, exact quantiles, distinct counting (exact + HLL
  * sketch), the as-of join, and a pure-SQL entry path (temp views +
  * spark.sql) proving the SQL API surface end-to-end.
  */
object StatsQueries {
  private val Fmt = "yyyy-MM-dd HH:mm:ss"

  /** Exact decimal(38,2) sum emitted as ×100 fixed-point BIGINT — the
    * sum is exact and associative in decimal; the final schema avoids
    * DECIMAL, whose rendering differs between the hash gate's two read
    * paths (round-1 verdict). */
  private def dsum(c: org.apache.spark.sql.Column) =
    (sum(c.cast("decimal(38,2)")) * 100).cast("long")

  /** ROLLUP (returnflag, linestatus): subtotal hierarchy. */
  def rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** CUBE (returnflag, linestatus): all 2^2 grouping sets. */
  def cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Pivot: linestatus values become columns (explicit value list, so
    * the plan needs no extra distinct-values job). */
  def pivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity").cast("decimal(38,2)")))
      .select(col("l_returnflag"),
        (col("F") * 100).cast("long").as("f_qty"),
        (col("O") * 100).cast("long").as("o_qty"))
      .orderBy("l_returnflag")

  /** Exact linear-interpolation quantiles per group (≡ Spark
    * `percentile` ≡ DuckDB `quantile_cont`; the equivalence to the
    * built-in is pinned bit-exact in StatsSpec). Computed via the
    * two-level [[graft.operators.Quantiles]] histogram-refine plan:
    * the built-in aggregate buffers a group's ENTIRE column in one
    * task (10.7 MB of shuffle buffers at sf0.1 — a 100 TB
    * scale-killer); this plan's shuffles are groups × buckets counts
    * plus ~n/buckets refined rows, independent of group size. */
  def quantiles(s: SparkSession, dir: String): DataFrame = {
    // both value columns melt into ONE histogram pass (group =
    // returnflag × column); "|" cannot occur in a returnflag
    val melted = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), explode(array(
        struct(lit("ep").as("c"), col("l_extendedprice").cast("double").as("v")),
        struct(lit("qty").as("c"), col("l_quantity").cast("double").as("v")))).as("m"))
      .select(concat(col("l_returnflag"), lit("|"), col("m.c")).as("gc"),
        col("m.v").as("v"))
    val q = graft.operators.Quantiles.exactQuantiles(melted, "gc", "v", Seq(0.5, 0.95))
      .select(split(col("gc"), "\\|")(0).as("l_returnflag"),
        split(col("gc"), "\\|")(1).as("c"), col("q"), col("value"))
    q.groupBy("l_returnflag")
      .agg(
        round(max(when(col("c") === "ep" && col("q") === 0.5, col("value"))), 6).as("p50"),
        round(max(when(col("c") === "ep" && col("q") === 0.95, col("value"))), 6).as("p95"),
        round(max(when(col("c") === "qty" && col("q") === 0.5, col("value"))), 6).as("qty_p50"))
      .orderBy("l_returnflag")
  }

  /** The APPROXIMATE quantile path — [[rel_quantiles]]' single-pass
    * mergeable twin ([[graft.operators.Sketches.histogramQuantiles]]):
    * p50/p95 of l_extendedprice in cents, $64 (2¹³-cent) histogram
    * cells, all-integer arithmetic so the DuckDB oracle replays the
    * ESTIMATE bit-for-bit (engine-private approx_percentile can't be
    * hash-checked). StatsSpec pins |estimate − exact| ≤ cell width
    * and the merge law on disjoint halves. */
  val SketchWidthCents = 8192L
  def quantilesSketch(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val q = graft.operators.Sketches.histogramQuantiles(
      li, "l_returnflag",
      (col("l_extendedprice").cast("decimal(38,2)") * 100).cast("long"),
      qs = Seq((1L, 2L), (19L, 20L)), widthCents = SketchWidthCents)
    q.groupBy(col("g").as("l_returnflag"))
      .agg(
        max(when(col("q_num") === 1, col("est_cents"))).as("p50_cents_est"),
        max(when(col("q_num") === 19, col("est_cents"))).as("p95_cents_est"),
        max(col("n")).as("n"))
      .orderBy("l_returnflag")
  }

  /** Exact distinct counts (oracle-checked). */
  def countDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("nd_parts"),
        count_distinct(col("l_suppkey")).as("nd_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** HLL sketch distinct counts, raw form: the engine-private estimate
    * next to the exact count (used by the banded declared query below
    * and by StatsSpec's 5% accuracy pin). */
  def approxDistinctRaw(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count_distinct(col("l_partkey")).as("nd_parts"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** HLL distinct counts as a BANDED summary — the kmeans_fit_ml
    * pattern: the estimate itself is engine-private HLL++ (DuckDB
    * cannot replay it), but the CLAIM — |estimate − exact| under 10%
    * of exact — is plain integer arithmetic the oracle hash-checks
    * (err_band = error-permille DIV 100, expected 0 everywhere;
    * StatsSpec separately pins ≤5% at rsd = 0.02). This retires the
    * repo's last rows-only query. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    approxDistinctRaw(s, dir)
      .select(col("l_returnflag"), col("nd_parts"), col("n"),
        expr("((1000 * abs(approx_parts - nd_parts)) DIV nd_parts) DIV 100")
          .as("err_band"))
      .orderBy("l_returnflag")

  /** Deterministic KMV distinct sketch (k = 256): same O(k) accuracy
    * class as the HLL query above, but the estimate is exact affine-
    * hash arithmetic → fully DuckDB-hash-checked, not rows-only. */
  val KmvK = 256
  val KmvSeed = 77L
  def kmvDistinct(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvDistinct(
        Tables.lineitem(s, dir), Seq("l_returnflag"), col("l_partkey"),
        k = KmvK, seed = KmvSeed)
      .select(col("l_returnflag"), round(col("est_distinct"), 6).as("est_distinct"))
      .orderBy("l_returnflag")

  /** Heavy hitters over the document token stream: bounded-state
    * Misra-Gries nomination per partition + exact rescue recount of
    * the nominees — the sketch bounds state and shuffle, yet the
    * result is the plain GROUP BY ... HAVING the oracle runs (share
    * 1/200 > 1/(k+1) for k = 255, so the candidate union provably
    * covers every qualifying token; [[graft.operators.Sketches]]). */
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.heavyHitters(
        Tables.documents(s, dir)
          .select(explode(graft.functions.TextOps.words(col("text"))).as("token")),
        "token", k = 255, shareNum = 1, shareDen = 200)
      .orderBy(col("n_occ").desc, col("token"))

  /** Column profiling — the ANALYZE-style surface a pipeline engine
    * needs before it can plan (skew detection, dictionary-vs-plain
    * encoding choices, broadcast-size estimates): per-column row
    * count, presence, exact distinct count, min and max. Shape:
    * UNPIVOT first (stack — in-row, zero shuffle), THEN one grouped
    * aggregation keyed by column name: ONE exchange regardless of how
    * many columns are profiled, instead of a count_distinct EXPAND
    * per column. That exchange necessarily carries Σ per-column
    * DISTINCT values (map-side dedup collapses repeats — measured
    * 603 k records for 2.4 M scanned values at sf0.1): exact distinct
    * counting cannot ship less. Profiling a 100 TB high-cardinality
    * column wants the sketch path instead — [[kmvDistinct]] is the
    * oracle-exact estimator for exactly that trade. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_partkey")
    val stackExpr = cols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ")
    Tables.lineitem(s, dir)
      .select(expr(s"stack(${cols.length}, $stackExpr) AS (col_name, v)"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n"), count(col("v")).as("n_present"),
        count_distinct(col("v")).as("n_distinct"),
        round(min(col("v")), 6).as("vmin"), round(max(col("v")), 6).as("vmax"))
      .orderBy("col_name")
  }

  /** As-of join: each event joined to the user's most recent purchase
    * event at or before it. */
  def asofLastPurchase(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("p_event_id"))
    val joined = AsOf.joinLatestBefore(
      events.select("event_id", "user_id", "ts"),
      purchases, key = "user_id", ts = "ts", rightCols = Seq("p_event_id"))
    joined.select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), Fmt).as("ts"),
        col("_r_p_event_id").as("p_event_id"),
        expr("(unix_micros(ts) - unix_micros(_r_ts)) DIV 1000000").as("secs_since"))
      .orderBy("event_id")
  }

  /** Forward as-of with a tolerance band: each event joined to the
    * user's EARLIEST purchase at or after it ("time to next
    * conversion"), nulled out when that purchase is more than 7 days
    * away. The tolerance is a post-filter on the unique earliest-after
    * candidate — no other purchase can be nearer, so CASE-ing it to
    * NULL is exact, not an approximation. */
  val AsofTolSecs = 604800L // 7 days
  def asofNextPurchase(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("p_event_id"))
    val joined = AsOf.joinEarliestAfter(
      events.select("event_id", "user_id", "ts"),
      purchases, key = "user_id", ts = "ts", rightCols = Seq("p_event_id"))
    val gap = expr("(unix_micros(_r_ts) - unix_micros(ts)) DIV 1000000")
    joined.select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), Fmt).as("ts"),
        when(gap <= AsofTolSecs, col("_r_p_event_id")).as("np_event_id"),
        when(gap <= AsofTolSecs, gap).as("secs_until"))
      .orderBy("event_id")
  }

  /** Bidirectional NEAREST as-of ([[AsOf.joinNearest]]): each event
    * joined to the user's purchase with the smallest absolute gap on
    * EITHER side (ties → backward) — the sensor-fusion/feature-
    * alignment variant neither directed join expresses; one key
    * exchange, two in-exchange sorts. The oracle splices the two
    * proven directed ASOF joins and replays the same µs-exact
    * nearer-side pick. */
  def asofNearestPurchase(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("p_event_id"))
    val joined = AsOf.joinNearest(
      events.select("event_id", "user_id", "ts"),
      purchases, key = "user_id", ts = "ts", rightCols = Seq("p_event_id"))
    joined.select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), Fmt).as("ts"),
        col("_r_p_event_id").as("near_event_id"),
        expr("abs(unix_micros(ts) - unix_micros(_r_ts)) DIV 1000000").as("gap_secs"),
        col("_dir").as("direction"))
      .orderBy("event_id")
  }

  /** KMV sketch SET OPERATIONS — the capability HLL sketches are
    * usually kept around for (mergeable union/intersection estimates
    * across segments) but oracle-exact: both segment sketches use the
    * same affine Lehmer hash, so union = k-min of the merged sketch
    * rows and intersection = Jaccard-on-the-union-sketch × union
    * estimate, every step integer-or-IEEE-exact and replayed by the
    * DuckDB oracle bit-for-bit. Segments: distinct l_partkey in
    * returnflag 'A' vs 'R' lineitems. */
  def kmvSetOps(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvSetOps(
      Tables.lineitem(s, dir), col("l_returnflag"), col("l_partkey"),
      tagA = "A", tagB = "R", k = KmvK, seed = KmvSeed)

  /** The SQL entry path: temp views + spark.sql. Same result as
    * rel_q1_pricing, proving the declarative SQL surface end-to-end. */
  def sqlPricing(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DECIMAL(24,2)) * 100 AS BIGINT) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem_v
        |WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Pearson correlation matrix over lineitem's three measures
    * (quantity, price cents, discount basis points), computed from
    * EXACT integer moments: every value is an exact long (quantities
    * integral, money/discount 2-dp), every product fits int64, every
    * sum accumulates in decimal(38,0) — exact and associative, so the
    * one full-table pass is partition-order-independent. Only THEN
    * does each moment convert to double (one correctly-rounded
    * conversion) and the corr formula runs as an identical IEEE
    * expression tree on both engines — the proven sqrt/divide/round6
    * recipe of the ANN cosine oracles, fed by exact sums instead of
    * row-order-dependent double accumulation (which is why built-in
    * `corr()` of either engine can NEVER hash-match: both fold
    * doubles in partition order). Single row, single scan, map-side
    * partial aggregation — nothing shuffles but 10 numbers. */
  def corrMatrix(s: SparkSession, dir: String): DataFrame =
    corrFromMoments(momentAgg(lineitemMeasures(s, dir)))

  /** The three exact-long measure columns corr runs over. */
  private[graft] def lineitemMeasures(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_quantity").cast("long").as("q"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("p"),
      (col("l_discount").cast("decimal(18,2)") * 100).cast("long").as("d"))

  /** One-row moment frame in EXACT decimal(38,0) — n plus the 9 sums.
    * These are plain associative sums, so moment frames from disjoint
    * slices MERGE by column-wise addition ([[mergeMoments]]) — the
    * mergeable-state face `stream_corr_parity` maintains per
    * micro-batch. */
  private[graft] def momentAgg(li: DataFrame): DataFrame = {
    def d0(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    li.agg(
      count(lit(1)).as("n"),
      d0(col("q")).as("sq"), d0(col("p")).as("sp"), d0(col("d")).as("sd"),
      d0(col("q") * col("q")).as("sqq"), d0(col("p") * col("p")).as("spp"),
      d0(col("d") * col("d")).as("sdd"),
      d0(col("q") * col("p")).as("sqp"), d0(col("q") * col("d")).as("sqd"),
      d0(col("p") * col("d")).as("spd"))
  }

  private[graft] val MomentCols =
    Seq("n", "sq", "sp", "sd", "sqq", "spp", "sdd", "sqp", "sqd", "spd")

  /** Column-wise addition of moment frames — exact, associative,
    * order-independent (decimal sums of decimals). */
  private[graft] def mergeMoments(frames: Seq[DataFrame]): DataFrame = {
    val all = frames.reduce(_.unionByName(_))
    all.agg(sum(col("n")).cast("long").as("n"),
      MomentCols.drop(1).map(c => sum(col(c)).cast("decimal(38,0)").as(c)): _*)
  }

  /** Finalize: ONE double conversion per exact moment, then the
    * identical IEEE corr expression tree (see [[corrMatrix]] doc). */
  private[graft] def corrFromMoments(m: DataFrame): DataFrame = {
    val md = m.select(col("n").cast("long").as("n") +:
      MomentCols.drop(1).map(c => col(c).cast("double").as(c)): _*)
    def corr(sx: String, sy: String, sxy: String, sx2: String, sy2: String) =
      round((col("n") * col(sxy) - col(sx) * col(sy)) /
        (sqrt(col("n") * col(sx2) - col(sx) * col(sx)) *
          sqrt(col("n") * col(sy2) - col(sy) * col(sy))), 6)
    md.select(col("n"),
      corr("sq", "sp", "sqp", "sqq", "spp").as("corr_qty_price"),
      corr("sq", "sd", "sqd", "sqq", "sdd").as("corr_qty_disc"),
      corr("sp", "sd", "spd", "spp", "sdd").as("corr_price_disc"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_corr_matrix" -> (corrMatrix _),
    "rel_rollup" -> (rollup _),
    "rel_cube" -> (cube _),
    "rel_pivot" -> (pivot _),
    "rel_quantiles" -> (quantiles _),
    "rel_quantiles_sketch" -> (quantilesSketch _),
    "rel_count_distinct" -> (countDistinct _),
    "rel_approx_distinct" -> (approxDistinct _),
    "rel_kmv_distinct" -> (kmvDistinct _),
    "text_heavy_hitters" -> (heavyHitters _),
    "rel_profile" -> (profile _),
    "asof_last_purchase" -> (asofLastPurchase _),
    "asof_next_purchase" -> (asofNextPurchase _),
    "asof_nearest_purchase" -> (asofNearestPurchase _),
    "rel_kmv_setops" -> (kmvSetOps _),
    "sql_q1_pricing" -> (sqlPricing _))

  val oracles: Map[String, String] = Map(
    // exact integer moments in DECIMAL(38,0), ONE double conversion
    // per moment, then the identical IEEE expression tree — see the
    // corrMatrix scaladoc for why built-in corr() cannot hash-match
    "rel_corr_matrix" ->
      """WITH v AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p,
        |         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d
        |  FROM lineitem),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sq,
        |    CAST(CAST(SUM(CAST(p AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sp,
        |    CAST(CAST(SUM(CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sd,
        |    CAST(CAST(SUM(CAST(q * q AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sqq,
        |    CAST(CAST(SUM(CAST(p * p AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS spp,
        |    CAST(CAST(SUM(CAST(d * d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sdd,
        |    CAST(CAST(SUM(CAST(q * p AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sqp,
        |    CAST(CAST(SUM(CAST(q * d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sqd,
        |    CAST(CAST(SUM(CAST(p * d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS spd
        |  FROM v)
        |SELECT n,
        |  round((n * sqp - sq * sp) / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 6) AS corr_qty_price,
        |  round((n * sqd - sq * sd) / (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd)), 6) AS corr_qty_disc,
        |  round((n * spd - sp * sd) / (sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd)), 6) AS corr_price_disc
        |FROM m""".stripMargin,
    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DECIMAL(24,2)) * 100 AS BIGINT) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1 ASC NULLS FIRST, 2 ASC NULLS FIRST""".stripMargin,
    "rel_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DECIMAL(24,2)) * 100 AS BIGINT) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1 ASC NULLS FIRST, 2 ASC NULLS FIRST""".stripMargin,
    "rel_pivot" ->
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(38,2)) END) AS DECIMAL(24,2)) * 100 AS BIGINT) AS f_qty,
        |  CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(38,2)) END) AS DECIMAL(24,2)) * 100 AS BIGINT) AS o_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact replay of the histogram ESTIMATE (not quantile_cont): same
    // cells, same prefix-count walk, same all-integer interpolation;
    // `((v % W) + W) % W` is pmod (DuckDB % truncates toward zero)
    "rel_quantiles_sketch" -> {
      val W = SketchWidthCents
      s"""WITH v0 AS (SELECT l_returnflag AS g,
         |  CAST(CAST(l_extendedprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS v FROM lineitem),
         |cells AS (SELECT g, v - ((v % $W + $W) % $W) AS b,
         |  COUNT(*) AS cnt, CAST(min(v) AS BIGINT) AS bmin, CAST(max(v) AS BIGINT) AS bmax
         |  FROM v0 GROUP BY 1, 2),
         |walked AS (SELECT *,
         |  coalesce(SUM(cnt) OVER (PARTITION BY g ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         |  SUM(cnt) OVER (PARTITION BY g) AS n FROM cells),
         |est AS (
         |  SELECT g, 1 AS qn, CAST((1 * (n - 1)) // 2 AS BIGINT) AS r, * EXCLUDE (g) FROM walked
         |  UNION ALL
         |  SELECT g, 19 AS qn, CAST((19 * (n - 1)) // 20 AS BIGINT) AS r, * EXCLUDE (g) FROM walked),
         |hit AS (SELECT g, qn,
         |  CAST(bmin + ((bmax - bmin) * (r - cum_before)) // greatest(cnt - 1, 1) AS BIGINT) AS e,
         |  CAST(n AS BIGINT) AS n
         |  FROM est WHERE r >= cum_before AND r < cum_before + cnt)
         |SELECT g AS l_returnflag,
         |  CAST(max(CASE WHEN qn = 1 THEN e END) AS BIGINT) AS p50_cents_est,
         |  CAST(max(CASE WHEN qn = 19 THEN e END) AS BIGINT) AS p95_cents_est,
         |  CAST(max(n) AS BIGINT) AS n
         |FROM hit GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "rel_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_parts,
        |  COUNT(DISTINCT l_suppkey) AS nd_supps,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // plain per-group k-min rank — the two-level bucketing on the
    // Spark side is result-invisible, like the salted-agg oracle
    "rel_kmv_distinct" -> {
      val (a, b) = graft.operators.Sketches.kmvCoeffs(KmvSeed)
      val p = graft.operators.Sketches.HashP
      s"""WITH h AS (SELECT DISTINCT l_returnflag,
         |    (((l_partkey % $p + $p) % $p) * $a + $b) % $p AS h FROM lineitem),
         |r AS (SELECT l_returnflag, h,
         |        row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM h),
         |k AS (SELECT l_returnflag, COUNT(*) AS m, MAX(h) AS hk
         |      FROM r WHERE rn <= $KmvK GROUP BY 1)
         |SELECT l_returnflag,
         |  round(CASE WHEN m < $KmvK THEN CAST(m AS DOUBLE)
         |        ELSE ${KmvK - 1}.0 * $p.0 / hk END, 6) AS est_distinct
         |FROM k ORDER BY 1""".stripMargin
    },
    // plain exact GROUP BY ... HAVING — the MG nomination pass is
    // result-invisible by the superset guarantee (share > 1/(k+1))
    "text_heavy_hitters" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |n AS (SELECT COUNT(*) AS total FROM w)
        |SELECT token, COUNT(*) AS n_occ
        |FROM w GROUP BY 1
        |HAVING COUNT(*) * 200 >= (SELECT total FROM n)
        |ORDER BY n_occ DESC, token""".stripMargin,
    "rel_profile" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS DOUBLE) FROM lineitem)
        |SELECT col_name, COUNT(*) AS n, COUNT(v) AS n_present,
        |  COUNT(DISTINCT v) AS n_distinct,
        |  round(MIN(v), 6) AS vmin, round(MAX(v), 6) AS vmax
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "asof_last_purchase" ->
      """WITH p AS (SELECT user_id, ts, max(event_id) AS p_event_id
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |l AS (SELECT event_id, user_id, ts FROM events)
        |SELECT l.event_id, l.user_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  p.p_event_id,
        |  (epoch_us(l.ts) - epoch_us(p.ts)) // 1000000 AS secs_since
        |FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts
        |ORDER BY l.event_id""".stripMargin,
    // forward ASOF (l.ts <= p.ts picks the earliest-after row), then
    // the 7-day tolerance CASEs the unique candidate to NULL — exact,
    // since no other purchase can be nearer
    "asof_next_purchase" ->
      s"""WITH p AS (SELECT user_id, ts, max(event_id) AS p_event_id
         |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         |l AS (SELECT event_id, user_id, ts FROM events)
         |SELECT l.event_id, l.user_id,
         |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
         |  CASE WHEN (epoch_us(p.ts) - epoch_us(l.ts)) // 1000000 <= $AsofTolSecs
         |       THEN p.p_event_id END AS np_event_id,
         |  CASE WHEN (epoch_us(p.ts) - epoch_us(l.ts)) // 1000000 <= $AsofTolSecs
         |       THEN (epoch_us(p.ts) - epoch_us(l.ts)) // 1000000 END AS secs_until
         |FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts <= p.ts
         |ORDER BY l.event_id""".stripMargin,
    // the two proven directed ASOF joins spliced, then the identical
    // µs-exact nearer-side pick (ties -> backward)
    "asof_nearest_purchase" ->
      """WITH p AS (SELECT user_id, ts, max(event_id) AS p_event_id
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |l AS (SELECT event_id, user_id, ts FROM events),
        |b AS (SELECT l.event_id, l.user_id, l.ts, p.p_event_id AS b_id, p.ts AS b_ts
        |      FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts),
        |f AS (SELECT l.event_id, p.p_event_id AS f_id, p.ts AS f_ts
        |      FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts <= p.ts),
        |j AS (SELECT b.event_id, b.user_id, b.ts, b.b_id, b.b_ts, f.f_id, f.f_ts,
        |        CASE WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL AND
        |               epoch_us(b.ts) - epoch_us(b.b_ts)
        |                 <= epoch_us(f.f_ts) - epoch_us(b.ts))
        |             THEN 0 ELSE 1 END AS usef
        |      FROM b JOIN f USING (event_id))
        |SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  CASE WHEN usef = 1 THEN f_id ELSE b_id END AS near_event_id,
        |  CAST(abs(epoch_us(ts) -
        |    epoch_us(CASE WHEN usef = 1 THEN f_ts ELSE b_ts END)) // 1000000
        |    AS BIGINT) AS gap_secs,
        |  CASE WHEN usef = 1 AND f_ts IS NOT NULL THEN 'fwd'
        |       WHEN usef = 0 AND b_ts IS NOT NULL THEN 'back'
        |       ELSE 'none' END AS direction
        |FROM j ORDER BY event_id""".stripMargin,
    // exact replay of the merged-sketch estimators: per-segment k-min
    // sketches, union = k-min of the merged rows, intersection =
    // Jaccard-on-the-union-sketch × union estimate — the two-level
    // bucketing on the Spark side is result-invisible as always
    "rel_kmv_setops" -> {
      val (a, b) = graft.operators.Sketches.kmvCoeffs(KmvSeed)
      val p = graft.operators.Sketches.HashP
      val k = KmvK
      s"""WITH h AS (SELECT DISTINCT l_returnflag AS t,
         |    (((l_partkey % $p + $p) % $p) * $a + $b) % $p AS h
         |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
         |r AS (SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM h),
         |s AS (SELECT t, h FROM r WHERE rn <= $k),
         |u0 AS (SELECT h, MAX(CASE WHEN t = 'A' THEN 1 ELSE 0 END) AS ina,
         |               MAX(CASE WHEN t = 'R' THEN 1 ELSE 0 END) AS inb
         |       FROM s GROUP BY 1),
         |u AS (SELECT * FROM (SELECT *, row_number() OVER (ORDER BY h) AS ru FROM u0)
         |      WHERE ru <= $k),
         |sa AS (SELECT COUNT(*) AS m, MAX(h) AS hk FROM s WHERE t = 'A'),
         |sb AS (SELECT COUNT(*) AS m, MAX(h) AS hk FROM s WHERE t = 'R'),
         |uu AS (SELECT COUNT(*) AS m, MAX(h) AS hk,
         |       CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nboth
         |       FROM u)
         |SELECT
         |  round(CASE WHEN sa.m < $k THEN CAST(sa.m AS DOUBLE)
         |        ELSE ${k - 1}.0 * $p.0 / sa.hk END, 6) AS est_a,
         |  round(CASE WHEN sb.m < $k THEN CAST(sb.m AS DOUBLE)
         |        ELSE ${k - 1}.0 * $p.0 / sb.hk END, 6) AS est_b,
         |  round(CASE WHEN uu.m < $k THEN CAST(uu.m AS DOUBLE)
         |        ELSE ${k - 1}.0 * $p.0 / uu.hk END, 6) AS est_union,
         |  round(CAST(uu.nboth AS DOUBLE) / uu.m, 6) AS jaccard,
         |  round((CAST(uu.nboth AS DOUBLE) / uu.m) *
         |        (CASE WHEN uu.m < $k THEN CAST(uu.m AS DOUBLE)
         |         ELSE ${k - 1}.0 * $p.0 / uu.hk END), 6) AS est_intersect
         |FROM sa, sb, uu""".stripMargin
    },
    // the banded HLL summary: exact side recomputed, band pinned 0
    // (the estimate stays engine-private; the accuracy claim doesn't)
    "rel_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_parts,
        |  COUNT(*) AS n,
        |  CAST(0 AS BIGINT) AS err_band
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DECIMAL(24,2)) * 100 AS BIGINT) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
