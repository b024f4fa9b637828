package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.io.Tables
import graft.plans.expressions

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("WordShingles matches the HOF formulation on the fixture corpus") {
    val docs = Tables.documents(spark, sf001)
    val diff = docs.select(
        TextOps.shingles(col("text"), 3).as("fast"),
        TextOps.shinglesHof(col("text"), 3).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("WordShingles edge cases") {
    val got = Seq("a b c d", "a a a a", "x y", "", "solo")
      .toDF("text")
      .select(expressions.word_shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq("a a a"))
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq.empty)
    assert(got(4) === Seq.empty)
  }

  test("WordShingles null propagates") {
    val got = Seq[Option[String]](None).toDF("text")
      .select(expressions.word_shingles(col("text"), 2).as("s"))
      .collect()
    assert(got(0).isNullAt(0))
  }

  test("word_shingles is SQL-callable after registration") {
    expressions.register(spark)
    val got = spark.sql("SELECT word_shingles('a b c', 2) AS s")
      .collect()(0).getSeq[String](0)
    assert(got === Seq("a b", "b c"))
  }
}
