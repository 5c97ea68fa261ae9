package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom Catalyst functions for
  * SQL use (the standard deployment hook — SURVEY.md build-plan note on
  * `SparkSessionExtensions`):
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * // then: spark.sql("SELECT dot_f(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"dot_f expects 2 arguments, got ${exprs.length}")
        DotProductF(exprs.head, exprs(1))
      }))
    // materialized-rollup rewrite (aggregate navigator): serve coarser
    // re-aggregations of a materialized level from the pre-materialized
    // coarser table (see graft.plans.RollupRewrite)
    e.injectOptimizerRule(_ => graft.plans.RollupRewrite)
  }
}
