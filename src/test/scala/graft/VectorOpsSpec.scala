package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).collect()(0).getDouble(0)

  private val a = array(lit(1.0), lit(2.0), lit(3.0))
  private val b = array(lit(4.0), lit(6.0), lit(3.0))

  test("sqdist") { assert(eval(sqdist(a, b)) === 9.0 + 16.0) }
  test("euclidean") { assert(eval(euclidean(a, b)) === 5.0) }
  test("dot") { assert(eval(dot(a, b)) === 4.0 + 12.0 + 9.0) }
  test("norm2") { assert(eval(norm2(array(lit(3.0), lit(4.0)))) === 5.0) }
  test("cosine of identical vectors is 1") {
    assert(math.abs(eval(cosine(a, a)) - 1.0) < 1e-12)
  }
  test("cosine of orthogonal vectors is 0") {
    val x = array(lit(1.0), lit(0.0)); val y = array(lit(0.0), lit(1.0))
    assert(math.abs(eval(cosine(x, y))) < 1e-12)
  }
  test("vecAdd / vecDiv / vecZero") {
    val sum = Seq(1).toDF("x").select(vecAdd(a, b)).collect()(0).getSeq[Double](0)
    assert(sum === Seq(5.0, 8.0, 6.0))
    val div = Seq(1).toDF("x").select(vecDiv(a, lit(2.0))).collect()(0).getSeq[Double](0)
    assert(div === Seq(0.5, 1.0, 1.5))
    val z = Seq(1).toDF("x").select(vecZero(3)).collect()(0).getSeq[Double](0)
    assert(z === Seq(0.0, 0.0, 0.0))
  }
  test("toDouble casts float arrays") {
    val df = Seq(Array(1.5f, 2.5f)).toDF("v").select(toDouble(col("v")).as("v"))
    assert(df.schema("v").dataType.simpleString === "array<double>")
  }
}
