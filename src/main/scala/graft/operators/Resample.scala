package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frame-shaped time-series resampling — the general form of the
  * fixture-bound q96 (`graft.queries.Incremental`). */
object Resample {

  /** Resample `(keyCol, tsCol, valueCol)` observations onto a dense
    * per-`unit` grid with last-observation-carried-forward: each grid
    * cell holds the latest observation in or before it; cells before a
    * key's first observation stay NULL (a fabricated zero would be a
    * lie). `unit` is a `date_trunc` unit ("hour", "minute", "day", …).
    *
    * Scale shape (q96's): the corpus collapses to per-cell aggregates
    * in ONE shuffle (latest-in-cell via max_by on the raw timestamp);
    * the fill window then runs over the SPINE — calendar-sized ×
    * keys, not corpus-sized. Key partitioning keeps every window
    * group bounded by the calendar. */
  def resampleLocf(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, unit: String = "hour"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val cells = df.select(date_trunc(unit, col(tsCol)).as("__t"),
      col(keyCol).as("__k"), col(valueCol).as("__v"), col(tsCol).as("__ts"))
    val binned = cells.groupBy($"__t", $"__k")
      .agg(max_by($"__v", $"__ts").as("__v"))
    val spine = cells.agg(min($"__t").as("mn"), max($"__t").as("mx"))
      .select(explode(expr(s"sequence(mn, mx, interval 1 $unit)")).as("__t"))
    val keys = cells.select($"__k").distinct()
    val w = Window.partitionBy($"__k").orderBy($"__t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.crossJoin(keys)
      .join(binned, Seq("__t", "__k"), "left")
      .select($"__t".as(tsCol), $"__k".as(keyCol),
        last($"__v", ignoreNulls = true).over(w).as(valueCol))
  }
}
