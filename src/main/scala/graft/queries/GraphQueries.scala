package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.Graph

/** Declared graph queries. The trade network: nation u → nation v iff
  * some customer in u bought (via an order's lineitem) from a supplier
  * in v — a real 4-table join distilled to a ≤ 25²-edge graph, ranked
  * by 10 rounds of fixed-point integer PageRank. Every rank is exact
  * BIGINT arithmetic, so the oracle UNROLLS the rounds (same
  * generator idea as the Lloyd CTE) and the driver hash-checks each
  * rank — the iterative graph operator joins the fit/CC family of
  * hash-checked iteration. */
object GraphQueries {
  val Iters = 10

  /** The 4-table edge distillation feeds BOTH declared graph queries;
    * memoized per fixture + session as a materialized ≤ 625-row local
    * list (the simhash-fingerprint / pair-graph pattern — the
    * distillation scan dominated both queries' cost, and the distinct
    * edge set is nation²-bounded, safe to hold). */
  /** The nation-level trade network, DISTINCT (src, dst) after the
    * 4-table distillation — ≤ nations² = 625 rows at ANY corpus size,
    * which is what licenses the `.collect()` below (the r5 verdict's
    * "document the bound" note): the collect is graph-size-bounded,
    * never data-bounded. A caller with a NON-distilled edge list
    * should feed [[graft.operators.Graph]] DataFrames directly — the
    * operators themselves never collect edges. */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val rows = graft.io.FixtureCache.memo(
        s"trade_edges:${graft.io.FixtureCache.sessionKey(s)}", dir, "lineitem") {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").cast("long").as("src"),
          col("s_nationkey").cast("long").as("dst"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    import s.implicits._
    rows.toDF("src", "dst")
  }

  def pagerank(s: SparkSession, dir: String): DataFrame =
    Graph.pageRankFixedPoint(tradeEdges(s, dir), "src", "dst", iters = Iters)
      .orderBy("node")

  private def prRound(i: Int): String =
    s"""pr$i AS (SELECT n.node,
       |  ((${Graph.Scale} // (SELECT COUNT(*) FROM nodes)) * 15) // 100 +
       |  (85 * COALESCE(inf.s, 0)) // 100 AS pr
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS node, SUM(p.pr // d.deg) AS s
       |    FROM e JOIN deg d ON e.src = d.src JOIN pr${i - 1} p ON p.node = e.src
       |    GROUP BY 1) inf ON inf.node = n.node)""".stripMargin

  /** Per-nation triangle participation in the trade network
    * (undirected view). Degree-oriented wedge join on the operator
    * side; naive a<b<c oracle — the orientation is result-invisible. */
  def triangles(s: SparkSession, dir: String): DataFrame =
    Graph.triangleCounts(tradeEdges(s, dir), "src", "dst")
      .orderBy("node")

  /** Deterministic synchronous label propagation on the undirected
    * trade network — 5 rounds, every round's labels oracle-unrolled. */
  def labelProp(s: SparkSession, dir: String): DataFrame =
    Graph.labelPropagation(tradeEdges(s, dir), "src", "dst", iters = LpIters)
      .orderBy("node")

  /** Minimum-hop BFS distances from nation 0 over the undirected
    * trade network — frontier-expansion iteration
    * ([[Graph.bfsHops]]), oracle = recursive CTE with min-hop
    * aggregation. */
  def bfs(s: SparkSession, dir: String): DataFrame =
    Graph.bfsHops(tradeEdges(s, dir), "src", "dst", source = BfsSource)
      .orderBy("node")

  val BfsSource = 0L

  /** Relaxation rounds for the SSSP oracle: |nations| − 1 = 24 —
    * Bellman-Ford's convergence bound for ≤ 25 nodes; the operator
    * iterates to its own fixed point and lands on the same table. */
  val SsspRounds = 24

  /** Weighted trade edges: w = 1 + 1000 DIV n_txn, n_txn the lineitem
    * count between the nation pair — a "trade friction" cost where
    * heavily-traded routes are cheap. Same 4-table distillation (and
    * the same ≤ nations²-bounded collect license) as [[tradeEdges]],
    * keeping the per-pair count this time. */
  private def tradeEdgesWeighted(s: SparkSession, dir: String): DataFrame = {
    val rows = graft.io.FixtureCache.memo(
        s"trade_edges_w:${graft.io.FixtureCache.sessionKey(s)}", dir, "lineitem") {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").cast("long").as("src"),
          col("s_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("n_txn"))
        .select(col("src"), col("dst"), expr("1 + (1000 DIV n_txn)").as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    import s.implicits._
    rows.toDF("src", "dst", "w")
  }

  /** Cheapest trade route from nation 0 to every reachable nation
    * under the friction weights — distributed Bellman-Ford
    * ([[Graph.ssspWeighted]]); the oracle unrolls the identical
    * BIGINT relaxation rounds. */
  def sssp(s: SparkSession, dir: String): DataFrame =
    Graph.ssspWeighted(tradeEdgesWeighted(s, dir), "src", "dst", "w",
        source = BfsSource)
      .orderBy("node")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerank _),
    "graph_label_prop" -> (labelProp _),
    "graph_bfs_hops" -> (bfs _),
    "graph_sssp_cost" -> (sssp _),
    "graph_triangles" -> (triangles _))

  // AS MATERIALIZED is load-bearing: each round references the prior
  // one TWICE (carry + relax), so un-materialized CTE inlining would
  // expand 2^rounds plan copies (observed: DuckDB exhausting file
  // handles re-scanning the base tables)
  private def ssspRound(i: Int): String =
    s"""d$i AS MATERIALIZED (SELECT node, MIN(cost) AS cost FROM (
       |  SELECT node, cost FROM d${i - 1}
       |  UNION ALL
       |  SELECT e.dst AS node, p.cost + e.w AS cost
       |  FROM e JOIN d${i - 1} p ON p.node = e.src) GROUP BY 1)""".stripMargin

  val LpIters = 5

  private def lpRound(i: Int): String =
    s"""lp$i AS (SELECT node, lbl FROM (
       |  SELECT nb.node, p.lbl,
       |    row_number() OVER (PARTITION BY nb.node
       |      ORDER BY COUNT(*) DESC, p.lbl) AS rn
       |  FROM nb JOIN lp${i - 1} p ON p.node = nb.nbr
       |  GROUP BY nb.node, p.lbl)
       |WHERE rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    // unrolled Bellman-Ford: 24 = |nations|−1 relaxation rounds over
    // the DIRECTED friction-weighted edges; MIN/+ on BIGINT only
    "graph_sssp_cost" -> (
      s"""WITH e AS MATERIALIZED (SELECT CAST(c_nationkey AS BIGINT) AS src,
         |    CAST(s_nationkey AS BIGINT) AS dst,
         |    CAST(1 + (1000 // COUNT(*)) AS BIGINT) AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |    JOIN customer ON o_custkey = c_custkey
         |    JOIN supplier ON l_suppkey = s_suppkey
         |  WHERE c_nationkey <> s_nationkey
         |  GROUP BY 1, 2),
         |d0 AS (SELECT CAST($BfsSource AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost),
         |""".stripMargin +
        (1 to SsspRounds).map(ssspRound).mkString(",\n") +
        s"""
           |SELECT node, cost FROM d$SsspRounds ORDER BY node""".stripMargin),
    // recursive CTE over the SAME undirected nb view the label-prop
    // oracle builds; UNION (not UNION ALL) dedups (node, hops) pairs
    // so cycles terminate; MIN(hops) is the BFS distance
    "graph_bfs_hops" ->
      s"""WITH RECURSIVE e AS (SELECT DISTINCT c_nationkey AS a, s_nationkey AS b
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |    JOIN customer ON o_custkey = c_custkey
         |    JOIN supplier ON l_suppkey = s_suppkey
         |  WHERE c_nationkey <> s_nationkey),
         |und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e),
         |nb AS (SELECT u AS node, v AS nbr FROM und UNION ALL SELECT v, u FROM und),
         |bfs(node, hops) AS (
         |  SELECT CAST($BfsSource AS BIGINT), 0
         |  UNION
         |  SELECT CAST(nb.nbr AS BIGINT), b.hops + 1
         |  FROM bfs b JOIN nb ON nb.node = b.node WHERE b.hops < 32)
         |SELECT node, CAST(MIN(hops) AS BIGINT) AS hops
         |FROM bfs GROUP BY 1 ORDER BY 1""".stripMargin,
    // naive a<b<c triangle enumeration — the operator's degree
    // orientation is result-invisible
    "graph_triangles" ->
      """WITH raw AS (SELECT DISTINCT c_nationkey AS a, s_nationkey AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE c_nationkey <> s_nationkey),
        |e AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM raw),
        |tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
        |        FROM e ab JOIN e bc ON bc.u = ab.v
        |          JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
        |nodes AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |SELECT CAST(node AS BIGINT) AS node, COUNT(*) AS n_tri
        |FROM nodes GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_label_prop" -> (
      s"""WITH e AS (SELECT DISTINCT c_nationkey AS a, s_nationkey AS b
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |    JOIN customer ON o_custkey = c_custkey
         |    JOIN supplier ON l_suppkey = s_suppkey
         |  WHERE c_nationkey <> s_nationkey),
         |und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e),
         |nb AS (SELECT u AS node, v AS nbr FROM und
         |       UNION ALL SELECT v, u FROM und),
         |lp0 AS (SELECT DISTINCT node, node AS lbl FROM nb),
         |""".stripMargin +
        (1 to LpIters).map(lpRound).mkString(",\n") +
        s"""
           |SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS lbl
           |FROM lp$LpIters ORDER BY node""".stripMargin),
    "graph_pagerank" -> (
      s"""WITH e AS (SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |    JOIN customer ON o_custkey = c_custkey
         |    JOIN supplier ON l_suppkey = s_suppkey),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
         |pr0 AS (SELECT node, ${Graph.Scale} // (SELECT COUNT(*) FROM nodes) AS pr FROM nodes),
         |""".stripMargin +
        (1 to Iters).map(prRound).mkString(",\n") +
        s"""
           |SELECT CAST(node AS BIGINT) AS node, CAST(pr AS BIGINT) AS pr
           |FROM pr$Iters ORDER BY node""".stripMargin))
}
