package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, RollingHash}

/** SparkSessionExtensions entry point: makes the engine's custom
  * functions and its one custom planner strategy available at session
  * build time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Per SURVEY §4.2 the engine changes no stock plans BY DEFAULT — the
  * relational surface is declarative DataFrame code that Catalyst
  * already optimizes. The injected pieces are additive: two scalar
  * functions for pure-SQL users, the [[graft.plans.TopKStrategy]]
  * planner strategy, which pattern-matches exclusively on the engine's
  * own [[graft.plans.TopKPerGroup]] logical node (every other plan
  * passes through untouched), and the [[graft.plans.TopKRewrite]]
  * optimizer rule, which is INERT unless the session opts in with
  * `spark.graft.rewriteWindowTopK=true` (it then rewrites the
  * row_number-filter window-top-k pattern onto the heap operator).
  * `GraftOps.topKPerGroup` also self-registers the strategy lazily, so
  * DataFrame-API callers work without this class; injecting it here
  * makes cluster-wide `--conf spark.sql.extensions=graft.GraftExtensions`
  * the single switch that enables the full engine surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s) => RollingHash(s, Int.MaxValue)
        case Seq(s, len) if len.foldable =>
          len.eval() match {
            case n: Number => RollingHash(s, n.intValue())
            case other => throw new IllegalArgumentException(
              s"rolling_hash maxLen must be a non-null integer literal, got $other")
          }
        case _ => throw new IllegalArgumentException(
          "rolling_hash(str[, maxLen]) requires a literal maxLen")
      }))
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
