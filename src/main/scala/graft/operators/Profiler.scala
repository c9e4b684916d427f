package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality sweep a pipeline runs
  * before training on a new drop: per column, row/null/distinct counts
  * and min/max (stringified for heterogeneous columns), all from ONE
  * aggregation pass over the frame.
  *
  * Scale notes: the exact variant's multi-column `countDistinct`
  * expands the input ×|cols| inside the aggregate (Spark's Expand) —
  * exact answers, |cols|-times the agg traffic. [[profileApprox]] is
  * the 100 TB default: HLL sketches aggregate partially with NO
  * expansion, one shuffle of sketch state (error ≤ ~2.3%, spec-bounded
  * ≤5%). The single aggregated row is checkpoint-pinned before the
  * per-column reshape so the pass runs once, not |cols| times. */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, exact = true)

  /** [[profile]] with `approx_count_distinct` — no Expand, mergeable
    * partial aggregation; everything else identical. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, exact = false)

  private def profileImpl(df: DataFrame, cols: Seq[String],
      exact: Boolean): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"profile columns must exist: ${cols.mkString(",")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        // rsd 0.02: the default 0.05 sketch wanders past 5% observed
        // error at small cardinalities; 2% keeps the spec bound honest
        // for ~4 bits/register more state
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    // ONE pass, ONE plan: the stack() generator reshapes the single
    // aggregated row to a row per column inside the same projection —
    // no checkpoint, no union of |cols| re-reads of the aggregate
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__nulls_$c`, `__nd_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    row.select(col("__n").as("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_str, max_str)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_str"), col("max_str"))
      .orderBy(col("col_name"))
  }
}
