package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General as-of join — for each left row, the LATEST right row with
  * `rightTs ≤ leftTs` in the same key group (backward direction,
  * exact matches allowed, left rows always kept) — the frame-shaped
  * generalization of q12's carry-forward formulation
  * (`graft.queries.Relational2.q12`), same contract as pandas
  * `merge_asof` / the ASOF JOIN of time-series engines.
  *
  * Plan shape (q12's measured one, now reusable): UNION-AND-CARRY, not
  * a join — both sides union into one relation tagged by side, ONE
  * shuffle on the key columns, one window sort by (ts, side, tie), and
  * a `last(payload, ignoreNulls)` carry. No join operator exists in
  * the plan at all (AsofJoinSpec pins that), so per-row state is O(1)
  * regardless of right-side fanout — a range join would materialize
  * |left| × |candidate rights| before its per-left top-1, the thing
  * that stops being feasible when a hot key has millions of right rows.
  *
  * Determinism: right rows tying on `rightTs` are resolved by the
  * GREATEST `tieCol` (must totally order right rows within a key —
  * q12's max-event_id rule); right rows sort before left rows at equal
  * timestamps, which is exactly "exact matches allowed".
  */
object AsofJoin {

  /** `left.*` plus every non-key `right` column (null when no right
    * row is at or before the left row's timestamp). `right`'s non-key
    * column names must be disjoint from `left`'s; `tieCol` must be one
    * of them. Timestamp columns must be of comparable types. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, tieCol: String): DataFrame = {
    val rightOnly = right.columns.toSeq.filterNot(keyCols.contains)
    require(keyCols.nonEmpty &&
      keyCols.forall(left.columns.contains) &&
      keyCols.forall(right.columns.contains),
      s"key columns ${keyCols.mkString(",")} must exist on both sides")
    require(rightOnly.intersect(left.columns.toSeq).isEmpty,
      s"right's non-key columns ${rightOnly.mkString(",")} must be " +
        "disjoint from left's (alias before joining)")
    require(rightOnly.contains(tieCol),
      s"tieCol $tieCol must be a non-key right column")

    val leftCols = left.columns.toSeq
    val rTagged = right.select(
      (keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))) :+
        col(rightTsCol).as("__ts") :+ lit(0).as("__side") :+
        col(tieCol).as("__tie") :+
        struct(rightOnly.map(col): _*).as("__p"): _*)
    val pType = rTagged.schema("__p").dataType
    val tieType = rTagged.schema("__tie").dataType
    val lTagged = left.select(
      (keyCols.map(col) ++ leftCols.filterNot(keyCols.contains).map(col)) :+
        col(leftTsCol).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(tieType).as("__tie") :+
        lit(null).cast(pType).as("__p"): _*)

    // right rows first at equal ts (exact matches allowed), ties on the
    // right side resolved ascending so `last` picks the greatest tie
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightOnly.map(c => col(s"__c.$c").as(c)): _*)
  }
}
