package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, ArrayDistinct, ArrayMax, ArrayMin, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-extension entry point — the idiomatic packaging for a Spark
  * library's Catalyst surface (SURVEY.md §7.3c). Enable with
  *
  * {{{
  * spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions()(_))`)
  * and every session gets:
  *
  *  - the native graft expressions as PERMANENT SQL functions
  *    (`graft_word_hashes`, …) — unlike
  *    [[graft.functions.GraftFunctions.register]]'s temp functions,
  *    these survive `newSession()` and need no per-session call;
  *  - [[CollapseIdempotentArrayOps]], an optimizer rule for the array
  *    algebra the dedup pipelines lean on.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.HashExpressions", name), builder))
    }
    ext.injectOptimizerRule(_ => CollapseIdempotentArrayOps)
  }
}

/** `array_distinct` is idempotent, and max/min/contains are insensitive
  * to duplicates — so a nested or pre-aggregation `array_distinct` is
  * pure waste (it sorts/hashes the array a second time per row). Spark's
  * optimizer has no rule for this; operator composition produces the
  * pattern naturally (e.g. feeding an already-distinct shingle array
  * into a pipeline stage that defensively re-distincts). Dropping the
  * redundant node is exactly result-preserving. */
object CollapseIdempotentArrayOps extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayDistinct(ArrayDistinct(c)) => ArrayDistinct(c)
    case ArrayMax(ArrayDistinct(c)) => ArrayMax(c)
    case ArrayMin(ArrayDistinct(c)) => ArrayMin(c)
    case ArrayContains(ArrayDistinct(c), v) => ArrayContains(c, v)
  }
}
