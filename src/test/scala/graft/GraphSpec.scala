package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(97L + i)))

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankFixedPoint(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("law: distributed fixed-point PageRank equals the pure reference exactly") {
    val gen = for {
      nNodes <- Gen.choose(2, 12)
      nEdges <- Gen.choose(1, 30)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0L, nNodes - 1L), Gen.choose(0L, nNodes - 1L)))
      iters <- Gen.choose(0, 4)
    } yield (edges, iters)
    sample(gen, 8).foreach { case (edges, iters) =>
      assert(run(edges, iters) === Graph.pageRankReference(edges, iters),
        s"edges=$edges iters=$iters")
    }
  }

  test("symmetric 2-cycle ranks equal; star center out-ranks leaves; mass conserved") {
    val cycle = run(Seq((1L, 2L), (2L, 1L)), 10)
    assert(cycle(1L) === cycle(2L))
    // 2-cycle has no dangling nodes: total fixed-point mass stays
    // within iters ulps of Scale (each round truncates a few units)
    assert(math.abs(cycle.values.sum - Graph.Scale) <= 100L)
    // leaves all point at the center; center's rank dominates
    val star = run((2L to 6L).map(i => (i, 1L)), 10)
    assert((2L to 6L).forall(i => star(1L) > star(i)))
    // dangling center leaks mass — sum strictly below Scale, all > 0
    assert(star.values.sum < Graph.Scale && star.values.forall(_ > 0))
  }
}
