package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

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
  * ≤5%). The single aggregated row is reshaped to a row per column by
  * one `stack()` generator inside the same projection — one pass, one
  * plan, no checkpoint and no per-column re-reads of the aggregate. */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, exact = true)

  /** [[profile]] with `approx_count_distinct` — no Expand, mergeable
    * partial aggregation — PLUS sketch percentiles `p50`/`p95` for the
    * numeric columns (`approx_percentile`, the mergeable positional
    * sketch x53 bounds: rank error ≤ n/accuracy, O(accuracy) state per
    * column). Non-numeric columns get null percentiles. The exact
    * variant deliberately omits percentiles: exact `percentile()`
    * collects per-column value multisets — the thing that stops being
    * feasible exactly when profiling matters — while every stat
    * [[profile]] does compute stays a constant-state aggregate. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, exact = false)

  private def profileImpl(df: DataFrame, cols: Seq[String],
      exact: Boolean): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"profile columns must exist: ${cols.mkString(",")}")
    def numeric(c: String) =
      df.schema(c).dataType.isInstanceOf[NumericType]
    if (exact) return profileExact(df, cols)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        // rsd 0.02: the default 0.05 sketch wanders past 5% observed
        // error at small cardinalities; 2% keeps the spec bound honest
        // for ~4 bits/register more state
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")) ++
        (if (exact) Nil
         else Seq(
           (if (numeric(c))
              expr(s"approx_percentile(`$c`, 0.5, 10000)").cast("double")
            else lit(null).cast("double")).as(s"__p50_$c"),
           (if (numeric(c))
              expr(s"approx_percentile(`$c`, 0.95, 10000)").cast("double")
            else lit(null).cast("double")).as(s"__p95_$c")))
    }
    // ONE pass, ONE plan: the stack() generator reshapes the single
    // aggregated row to a row per column inside the same projection —
    // no checkpoint, no union of |cols| re-reads of the aggregate
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__nulls_$c`, `__nd_$c`, `__min_$c`, `__max_$c`" +
        (if (exact) "" else s", `__p50_$c`, `__p95_$c`")).mkString(", ")
    val outNames = "(col_name, n_nulls, n_distinct, min_str, max_str" +
      (if (exact) ")" else ", p50, p95)")
    val base = row.select(col("__n").as("n_rows"), expr(
      s"stack(${cols.size}, $stackArgs) AS $outNames"))
    val ordered = Seq("col_name", "n_rows", "n_nulls", "n_distinct",
      "min_str", "max_str") ++ (if (exact) Nil else Seq("p50", "p95"))
    base.select(ordered.map(col): _*).orderBy(col("col_name"))
  }

  /** The exact path as a UNION of per-column aggregates (optimization
    * r16). The single-pass multi-`countDistinct` formulation plans an
    * Expand (input ×(|cols|+1)) whose min/max-over-string buffers block
    * hash aggregation — the WHOLE pass degrades to SortAggregate with
    * two full sorts of the expanded table (measured 6.5 s at sf0.1 vs
    * 1.1 s for this shape). Per column the plan is: column-pruned scan
    * → hash partial groupBy(value) → one exchange of distinct values →
    * final agg; the union's branches are independent stages inside ONE
    * job, so they fill the cluster concurrently (guide §2.6) and the
    * total bytes read equal the old single scan's (each branch reads
    * only its column). Output rows/values identical — same stats, same
    * `orderBy(col_name)` contract. */
  private def profileExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perCol = cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }
    perCol.reduce(_ unionByName _).orderBy(col("col_name"))
  }
}
