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
    * row qualifies). `direction = "backward"` (default) attaches the
    * latest right row with `rightTs ≤ leftTs` (ties → greatest
    * `tieCol`); `"forward"` attaches the EARLIEST right row with
    * `rightTs ≥ leftTs` (ties → least `tieCol`) — next-event
    * attribution, the same one-shuffle carry plan with the frame
    * mirrored. `right`'s non-key column names must be disjoint from
    * `left`'s; `tieCol` must be one of them. Timestamp columns must be
    * of comparable types.
    *
    * NULL timestamps follow the theta-join contract (a NULL comparison
    * never qualifies): right rows with NULL `rightTsCol` are dropped
    * before the union (they can match no left row), and left rows with
    * NULL `leftTsCol` are kept with all-null right columns (they match
    * no right row). Without the filter, a NULL right timestamp would
    * sort nulls-first into the window and be carried into every left
    * row that precedes the first real right row.
    *
    * NULL KEYS follow the same equality contract: a right row with any
    * NULL key column is dropped before the union (SQL equality never
    * matches NULL — without the filter the window's partitionBy would
    * group null keys together and attach them to null-key left rows),
    * and left rows with NULL keys are kept with all-null right columns
    * (their partition then holds no right rows at all).
    *
    * `sliceWidth` is the HOT-KEY scale path. The default plan's window
    * partitions by the key columns alone, so one key's entire merged
    * timeline sorts in a single task — correct at any size (sort
    * spills, state is O(1)), but a single hot symbol/user serializes
    * into one straggler task at the 100 TB end. With
    * `sliceWidth = Some(w)`, rows are sub-partitioned by
    * `floor(ts / w)` (ts cast to long — epoch seconds for timestamps)
    * and the carry is computed in two steps, neither of which ever
    * sorts a whole key in one task:
    *
    *   1. intra-slice carry — the same window, partitioned by
    *      (key, slice): a hot key now fans out across
    *      timespan/`w` tasks;
    *   2. boundary carry — per (key, slice), the slice's extreme right
    *      payload (an aggregate, partial map-side), then a running
    *      `last(ignoreNulls)` over the per-slice boundary relation
    *      (rows = slice count, thousands not billions) carries each
    *      slice's "latest right from all earlier slices"; a left row
    *      with no intra-slice match coalesces to its slice's carried
    *      boundary.
    *
    * Output is row-identical to the default plan for any `w > 0`
    * (AsofJoinSpec proves equality on randomized and hot-key
    * instances): slicing by a monotonic function of ts preserves
    * cross-slice order, and within a slice the window order is
    * unchanged — `w` tunes parallelism only. Pick `w` so a slice of
    * the hottest key fits comfortably in one task (e.g. one hour of a
    * feed that peaks at ~1M events/hour).
    *
    * On BOTH plans, `(rightTs, tieCol)` is assumed UNIQUE per key
    * group (the contract of "`tieCol` totally orders right rows within
    * a key"): with duplicate (ts, tie) right rows the attached payload
    * among the tied rows is arbitrary, and the default and sliced
    * plans may break that residual tie differently. The boundary
    * aggregate orders by `(ts, tie)` only — the payload struct never
    * enters the comparison, so unorderable right column types (e.g.
    * maps) work on either plan. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, tieCol: String,
      direction: String = "backward",
      sliceWidth: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward: $direction")
    val backward = direction == "backward"
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
    // side ordering: the qualifying-at-equal-ts right rows must sit
    // INSIDE the left row's frame — before it for backward, after it
    // for forward (exact matches allowed in both directions)
    val (rightSide, leftSide) = if (backward) (0, 1) else (1, 0)
    // NULL right ts or NULL right key ⇒ the row can match no left row
    // (see the NULL contract above); left rows need no mask — a
    // null-key partition then contains no right rows, so the carry is
    // null for free
    val rTagged = right
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .filter(col(rightTsCol).isNotNull).select(
      (keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))) :+
        col(rightTsCol).as("__ts") :+ lit(rightSide).as("__side") :+
        col(tieCol).as("__tie") :+
        struct(rightOnly.map(col): _*).as("__p"): _*)
    val pType = rTagged.schema("__p").dataType
    val tieType = rTagged.schema("__tie").dataType
    val lTagged = left.select(
      (keyCols.map(col) ++ leftCols.filterNot(keyCols.contains).map(col)) :+
        col(leftTsCol).as("__ts") :+ lit(leftSide).as("__side") :+
        lit(null).cast(tieType).as("__tie") :+
        lit(null).cast(pType).as("__p"): _*)

    // ties on the right side sort ascending, so backward's `last` picks
    // the greatest tie and forward's `first` picks the least
    def carryOver(w: org.apache.spark.sql.expressions.WindowSpec) =
      if (backward)
        last(col("__p"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__p"), ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val uni = rTagged.unionByName(lTagged)
    val withCarry = sliceWidth match {
      case None =>
        val base = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
        // NULL leftTs ⇒ no right row qualifies: mask the carried struct
        uni.withColumn("__c", when(col("__ts").isNotNull, carryOver(base)))
      case Some(width) =>
        require(width > 0, s"sliceWidth must be positive: $width")
        val sliced = uni.withColumn("__slice",
          floor(col("__ts").cast("long") / width))
        val intra = Window
          .partitionBy((keyCols.map(col) :+ col("__slice")): _*)
          .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
        // per-(key, slice) boundary: the slice's extreme right row by
        // (ts, tie) — max_by/min_by with a NULL ordering for left rows
        // skips them, and the payload never enters the comparison, so
        // unorderable right column types (maps) work here exactly as on
        // the default path
        val bOrd = when(col("__side") === rightSide,
          struct(col("__ts"), col("__tie")))
        val boundaries = sliced
          .groupBy((keyCols.map(col) :+ col("__slice")): _*)
          .agg((if (backward) max_by(col("__p"), bOrd)
            else min_by(col("__p"), bOrd)).as("__bp"))
        val overSlices = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__slice").asc)
        val carryB =
          if (backward)
            last(col("__bp"), ignoreNulls = true)
              .over(overSlices.rowsBetween(Window.unboundedPreceding, -1))
          else
            first(col("__bp"), ignoreNulls = true)
              .over(overSlices.rowsBetween(1, Window.unboundedFollowing))
        val carried = boundaries
          .select((keyCols.map(col) :+ col("__slice") :+
            carryB.as("__prev")): _*)
        sliced
          .withColumn("__cl", when(col("__ts").isNotNull, carryOver(intra)))
          .join(carried, keyCols :+ "__slice", "left")
          .withColumn("__c", when(col("__ts").isNotNull,
            coalesce(col("__cl"), col("__prev"))))
    }
    withCarry
      .filter(col("__side") === leftSide)
      .select(leftCols.map(col) ++ rightOnly.map(c => col(s"__c.$c").as(c)): _*)
  }
}
