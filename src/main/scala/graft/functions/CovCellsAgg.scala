package graft.functions

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` computing the exact covariance sufficient
  * statistic — n, per-dim sums Σvᵢ and upper-triangle product sums
  * Σvᵢvⱼ — in ONE buffer per partition (d + d(d+1)/2 decimals), the
  * UDAF twin of [[graft.operators.Similarity.cellStats]].
  *
  * Why it exists: the declarative cell plan explodes rows ×d(d+1)/2
  * before the aggregate. In BATCH that partial-aggregates map-side
  * inside whole-stage codegen and costs ~0.5 s at sf0.1; inside a
  * STATEFUL STREAMING aggregate the same plan measured 13 s/batch
  * (the exploded stream runs outside codegen on the state-store
  * path). This Aggregator keeps the per-row work in plain JVM loops
  * and hands Catalyst ONE object buffer per partition — the
  * VectorSumAgg combiner shape — so the streaming drift monitor pays
  * the d² cost once per partition, not per exploded row.
  *
  * Exactness contract (what lets the streaming twin ride the batch
  * DuckDB oracle): each element/product is converted EXACTLY the way
  * `CAST(double AS DECIMAL(38,12))` converts — shortest-round-trip
  * string, then scale 12 HALF_UP — and decimal addition is exact and
  * associative, so any partial/merge order lands on the identical
  * cells. `finish` applies the same `round(CAST(… AS DOUBLE), 6)` the
  * batch query emits. */
class CovCellsAgg(dim: Int)
    extends Aggregator[Seq[Double], (Long, Array[JBig], Array[JBig]),
      Seq[(Int, Int, Long, Double, Double, Double)]] {
  private val nPairs = dim * (dim + 1) / 2

  private def d12(x: Double): JBig =
    new JBig(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)

  override def zero: (Long, Array[JBig], Array[JBig]) =
    (0L, Array.fill(dim)(JBig.ZERO), Array.fill(nPairs)(JBig.ZERO))

  override def reduce(b: (Long, Array[JBig], Array[JBig]),
                      row: Seq[Double]): (Long, Array[JBig], Array[JBig]) = {
    require(row.length == dim, s"expected dim $dim, got ${row.length}")
    val v = row.toArray
    val (n, s, p) = b
    var i = 0
    var idx = 0
    while (i < dim) {
      s(i) = s(i).add(d12(v(i)))
      var j = i
      while (j < dim) {
        p(idx) = p(idx).add(d12(v(i) * v(j)))
        idx += 1; j += 1
      }
      i += 1
    }
    (n + 1, s, p)
  }

  override def merge(a: (Long, Array[JBig], Array[JBig]),
                     b: (Long, Array[JBig], Array[JBig])): (Long, Array[JBig], Array[JBig]) = {
    var i = 0
    while (i < dim) { a._2(i) = a._2(i).add(b._2(i)); i += 1 }
    i = 0
    while (i < nPairs) { a._3(i) = a._3(i).add(b._3(i)); i += 1 }
    (a._1 + b._1, a._2, a._3)
  }

  private def r6(x: JBig): Double =
    new JBig(java.lang.Double.toString(x.doubleValue))
      .setScale(6, RoundingMode.HALF_UP).doubleValue

  override def finish(b: (Long, Array[JBig], Array[JBig])): Seq[(Int, Int, Long, Double, Double, Double)] = {
    val (n, s, p) = b
    val out = Seq.newBuilder[(Int, Int, Long, Double, Double, Double)]
    var i = 0
    var idx = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out += ((i, j, n, r6(s(i)), r6(s(j)), r6(p(idx))))
        idx += 1; j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[(Long, Array[JBig], Array[JBig])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[JBig], Array[JBig])]()
  override def outputEncoder: Encoder[Seq[(Int, Int, Long, Double, Double, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Int, Int, Long, Double, Double, Double)]]()
}

object CovCellsAgg {
  /** Column-usable aggregate: `df.groupBy().agg(cov_cells(dim)(col))`. */
  def cov_cells(dim: Int)(c: Column): Column = udaf(new CovCellsAgg(dim)).apply(c)
}
