package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.types.IntegerType

/** Public entry points for the custom plan operators. */
object GraftOps {

  /** Sort key spec for [[topKPerGroup]]: column name + direction. */
  case class Order(col: String, desc: Boolean = false)

  /** Top-k rows per group with 1-based `rankName` attached, computed by
    * the bounded-heap [[TopKPerGroupExec]] (partial before the shuffle,
    * final after) instead of a full per-group sort.
    *
    * {{{
    * GraftOps.topKPerGroup(orders, 3, Seq("o_orderstatus"),
    *   Seq(Order("o_totalprice", desc = true), Order("o_orderkey")))
    * }}}
    *
    * Group/order columns are resolved by name against the input frame —
    * the custom logical node is built from already-resolved attributes,
    * so no analyzer involvement is needed for its expressions.
    */
  def topKPerGroup(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCols: Seq[Order], rankName: String = "rnk",
      partialFlushRows: Long = TopKPerGroup.DefaultPartialFlushRows): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(orderCols.nonEmpty, "at least one order column is required")
    require(partialFlushRows > 0,
      s"partialFlushRows must be positive, got $partialFlushRows")
    val spark = df.sparkSession
    // idempotently register the planner strategy on this session —
    // planner.strategies already includes BOTH experimental
    // .extraStrategies and extension-injected strategies
    // (GraftExtensions), so one membership check covers every
    // registration route; synchronized so concurrent first calls cannot
    // append two copies
    GraftOps.synchronized {
      if (!spark.sessionState.planner.strategies.contains(TopKStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
      }
    }
    val child = GraftSqlBridge.analyzed(df)
    def attr(name: String) = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in ${child.output.map(_.name).mkString(", ")}"))
    val groupExprs = groupCols.map(attr)
    val orderExprs = orderCols.map { o =>
      SortOrder(attr(o.col), if (o.desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftSqlBridge.ofRows(spark,
      TopKPerGroup(k, groupExprs, orderExprs, rankAttr, child, partialFlushRows))
  }
}
