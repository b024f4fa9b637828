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

  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
    Graph.pageRankFixedPoint(edges, "src", "dst", iters = Iters)
      .orderBy("node")
  }

  private def prRound(i: Int): String =
    s"""pr$i AS (SELECT n.node,
       |  ((${Graph.Scale} // (SELECT COUNT(*) FROM nodes)) * 15) // 100 +
       |  (85 * COALESCE(inf.s, 0)) // 100 AS pr
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS node, SUM(p.pr // d.deg) AS s
       |    FROM e JOIN deg d ON e.src = d.src JOIN pr${i - 1} p ON p.node = e.src
       |    GROUP BY 1) inf ON inf.node = n.node)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerank _))

  val oracles: Map[String, String] = Map(
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
