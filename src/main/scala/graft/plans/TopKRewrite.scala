package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule rewriting the classic window-top-k pattern
  *
  * {{{ Filter(rnk <= k, Window([row_number() AS rnk], part, order, child)) }}}
  *
  * into the engine's bounded-heap [[TopKPerGroup]] operator. Spark's own
  * `InferWindowGroupLimit` already prunes each partition to ~k rows per
  * group pre-shuffle, but the surviving Window still SORTS every group
  * after the exchange; the heap operator replaces sort+rank with an
  * O(n log k) reduction on both sides of the shuffle.
  *
  * DISABLED by default — the engine's declared stance (SURVEY §4.2) is
  * to never alter stock plans uninvited. Sessions opt in with
  * `spark.graft.rewriteWindowTopK=true`; the rewrite then fires only on
  * the exact single-row_number shape (any other window expression, rank
  * function, or filter composition passes through untouched), keeps the
  * window attribute's expression id (parents resolve unchanged), and
  * unwraps the now-redundant `WindowGroupLimit` Spark inserted for the
  * same pattern. Ties behave as in the window formulation: both plans
  * resolve them by whatever order the data arrives in, so a total
  * `order` gives identical output in either plan.
  */
object TopKRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.rewriteWindowTopK"

  private def limitOf(cond: Expression, rnk: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
          if a.semanticEquals(rnk) => Some(k)
      case LessThan(a: AttributeReference, IntegerLiteral(k))
          if a.semanticEquals(rnk) => Some(k - 1)
      case EqualTo(a: AttributeReference, IntegerLiteral(1))
          if a.semanticEquals(rnk) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // lenient parse: a malformed value must not detonate every plan in
    // the session (this rule runs in the optimizer for all queries)
    if (!conf.getConfString(ConfKey, "false").trim.equalsIgnoreCase("true"))
      return plan
    plan.transformUp {
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            part, order, windowChild, _)) =>
        val rnk = alias.toAttribute.asInstanceOf[AttributeReference]
        limitOf(cond, rnk) match {
          // part.nonEmpty: the exec's final pass requires clustering on
          // the group keys, and ClusteredDistribution(Nil) is illegal —
          // a GLOBAL top-N (no PARTITION BY) stays a window, where
          // Spark's own TakeOrdered/WindowGroupLimit machinery applies
          case Some(k) if k > 0 && order.nonEmpty && part.nonEmpty =>
            // WindowGroupLimit (inserted by InferWindowGroupLimit for
            // this very pattern) is subsumed by the heap's partial pass
            val child = windowChild match {
              case WindowGroupLimit(p2, o2, _, _, grandchild)
                  if p2 == part && o2 == order => grandchild
              case other => other
            }
            TopKPerGroup(k, part, order, rnk, child)
          case _ => f
        }
    }
  }
}
