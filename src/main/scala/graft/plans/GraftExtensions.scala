package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: start a session with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` and the
  * engine's custom Catalyst expressions are SQL-callable in every new
  * session (`SELECT word_shingles(text, 3) ...`). The programmatic
  * equivalent for an existing session is
  * [[graft.plans.expressions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.wordShinglesDescriptor)
    e.injectFunction(GraftExtensions.sqdistDescriptor)
    e.injectFunction(GraftExtensions.dotDescriptor)
    e.injectOptimizerRule(_ => rules.CollapseShingleDistinct)
  }
}

object GraftExtensions {
  private def buildWordShingles(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "word_shingles(text, n)")
    expressions.WordShingles(exprs.head, expressions.foldToInt(exprs(1)))
  }

  val wordShinglesDescriptor
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[expressions.WordShingles].getName, "word_shingles"),
    (exprs: Seq[Expression]) => buildWordShingles(exprs))

  val sqdistDescriptor
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("vec_sqdist"),
    new ExpressionInfo(classOf[expressions.SqDist].getName, "vec_sqdist"),
    (exprs: Seq[Expression]) => expressions.SqDist(exprs(0), exprs(1)))

  val dotDescriptor
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[expressions.DotProduct].getName, "vec_dot"),
    (exprs: Seq[Expression]) => expressions.DotProduct(exprs(0), exprs(1)))
}
