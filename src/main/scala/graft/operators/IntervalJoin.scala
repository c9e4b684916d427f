package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join without an equi key, at scale: the naive
  * formulation is a pure theta join (BNL — |intervals|·|points|
  * comparisons), so an equi key is MANUFACTURED by time binning, with
  * the bin hierarchy derived from the data.
  *
  * Single-level lemma (q87/q94, `IncrementalSpec`): with bin width B ≥
  * every interval length, an interval [s, e) overlaps bins
  * floor(s/B)..floor((e−1)/B) (≤ 2), a point sits in exactly one bin,
  * so the bin equi-join is lossless AND duplicate-free; the residual
  * range predicate only discards.
  *
  * Multi-resolution extension (x94): each interval lands at the first
  * LEVEL whose width (base·2^level) fits its length; points replicate
  * to every level; the join key is (level, bin). The lemma holds per
  * level, and a pair can only meet at the interval's own level, so the
  * join stays lossless and duplicate-free across levels. Candidate
  * volume per interval is O(its own length), not O(max length) — the
  * difference between a tolerable and an undoable plan when the length
  * distribution is long-tailed.
  *
  * What this operator adds over x94's fixed widths: the level
  * boundaries are DERIVED from the interval-length distribution — base
  * width = the median length (fine bins where most intervals live),
  * level count = what the max length needs, capped at `maxLevels`
  * (above the cap the base coarsens instead, trading candidate
  * looseness for point replication). Deriving the stats is one
  * metadata-sized aggregate over the interval side (exact max, sketch
  * median) — bounded driver work, never data-sized.
  */
object IntervalJoin {

  /** Exact floor division for the bin id: `x div w` truncates toward
    * zero, which misassigns pre-1970 (negative-µs) timestamps at bin
    * boundaries; `pmod` is non-negative, so this is floor for any sign. */
  private def binExpr(x: String, w: String): String =
    s"(($x - pmod($x, $w)) div $w)"

  /** Derived bin hierarchy: level widths in the time unit of the
    * columns (power-of-two multiples of the base). */
  final case class Hierarchy(baseWidth: Long, levels: Int) {
    def width(level: Int): Long = baseWidth << level
    require(levels >= 1 && baseWidth >= 1)
  }

  /** Memoized [[deriveHierarchy]] results, keyed by the interval
    * frame's canonicalized analyzed plan + columns + cap — a caller
    * looping [[pointInInterval]] over the same frame pays the stats
    * aggregate once, not per call (VERDICT r4 #5). Access-ordered LRU
    * bounded at 64 entries so a long-lived session cannot accumulate
    * retained plans. Safe to cache on the PLAN: a hierarchy derived
    * from stale stats (data rewritten under the same path) affects
    * only candidate-bin looseness, never correctness — the lemma holds
    * for any (base, levels). */
  private val hierarchyCache =
    new java.util.LinkedHashMap[(Any, String, String, Int), Hierarchy](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Any, String, String, Int), Hierarchy])
          : Boolean = size() > 64
    }

  /** Derive the hierarchy from the interval-length distribution:
    * base = clamp(median length, ≥1), levels = enough doublings to
    * cover the max length, capped at `maxLevels` (then the base
    * coarsens so the top level still fits every interval). */
  def deriveHierarchy(intervals: DataFrame, startCol: String,
      endCol: String, maxLevels: Int = 6): Hierarchy = {
    val key = (intervals.queryExecution.analyzed.canonicalized,
      startCol, endCol, maxLevels)
    hierarchyCache.synchronized(Option(hierarchyCache.get(key))) match {
      case Some(h) => h
      case None =>
        val h = deriveHierarchyUncached(intervals, startCol, endCol, maxLevels)
        hierarchyCache.synchronized(hierarchyCache.put(key, h))
        h
    }
  }

  private def deriveHierarchyUncached(intervals: DataFrame, startCol: String,
      endCol: String, maxLevels: Int): Hierarchy = {
    val lens = intervals
      .select((col(endCol) - col(startCol)).cast("long").as("len"))
      .filter(col("len") > 0) // malformed rows must not skew the stats
    // ONE driver action for both stats (exact max + sketch median) —
    // the derivation is on the per-query path, so a second job for the
    // quantile would double its cost for nothing
    val row = lens.agg(max(col("len")),
      expr("approx_percentile(len, 0.5, 1000)")).head()
    if (row.isNullAt(0)) return Hierarchy(1L, 1) // no intervals at all
    val maxLen = math.max(1L, row.getLong(0))
    val median = math.max(1L, row.getLong(1))
    def levelsFor(base: Long): Int = {
      // doubling widths with an overflow guard: once the width shifts
      // past 2^63 it exceeds any Long interval length, so that level
      // covers everything — the naive `base << (l-1) < maxLen` test
      // wraps (shift is mod 64) and spins forever when maxLen is near
      // Long.MaxValue (an open-ended valid_to=∞ sentinel interval)
      var l = 1
      var w = base
      while (w < maxLen && w > 0) { l += 1; w <<= 1 }
      l
    }
    val naive = levelsFor(median)
    if (naive <= maxLevels) Hierarchy(median, naive)
    else {
      // cap: smallest base whose maxLevels-th width covers maxLen —
      // overflow-safe ceil-divide (maxLen + 2^(maxLevels-1) - 1 can wrap)
      val base = ((maxLen - 1) >> (maxLevels - 1)) + 1
      Hierarchy(math.max(1L, base), levelsFor(math.max(1L, base)))
    }
  }

  /** All (interval, point) pairs with `startCol ≤ pointCol < endCol`,
    * computed via the derived (or supplied) bin hierarchy. The two
    * inputs must have disjoint column names; the output carries both
    * sides' columns. Aggregation is the caller's (one groupBy on the
    * interval id keeps the whole pipeline at two shuffles). */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      startCol: String, endCol: String, pointCol: String,
      hierarchy: Option[Hierarchy] = None, maxLevels: Int = 6): DataFrame = {
    require(intervals.columns.toSet.intersect(points.columns.toSet).isEmpty,
      "interval and point column names must be disjoint (alias before joining)")
    val h = hierarchy.getOrElse(
      deriveHierarchy(intervals, startCol, endCol, maxLevels))
    // first level whose width fits the length — integer comparisons,
    // never float log2 (x94's lesson: log(2.0, 2.0) ≠ 1.0 in doubles)
    val levelCol = (0 until h.levels - 1).foldRight(
        lit(h.levels - 1): org.apache.spark.sql.Column) { (l, rest) =>
      when(col(endCol) - col(startCol) <= h.width(l), l).otherwise(rest)
    }
    // Malformed intervals (end ≤ start) contain no instants, so dropping
    // them is semantics-preserving — and necessary: explode(sequence(s, e))
    // with e < s yields a DESCENDING sequence (Spark defaults step to −1),
    // so one corrupt row would fan out onto |start−end|/W bins and blow up
    // the stage even though the residual predicate discards every pair.
    val wSide = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__level", levelCol)
      .withColumn("__width", expr(s"shiftleft(${h.baseWidth}L, __level)"))
      .withColumn("__bin", explode(sequence(
        expr(binExpr(startCol, "__width")),
        expr(binExpr(s"($endCol - 1)", "__width")))))
    val pSide = points
      .withColumn("__plevel", explode(sequence(lit(0), lit(h.levels - 1))))
      .withColumn("__pwidth", expr(s"shiftleft(${h.baseWidth}L, __plevel)"))
      .withColumn("__pbin", expr(binExpr(pointCol, "__pwidth")))
    wSide.join(pSide,
        wSide("__level") === pSide("__plevel") &&
          wSide("__bin") === pSide("__pbin") &&
          pSide(pointCol) >= wSide(startCol) &&
          pSide(pointCol) < wSide(endCol))
      .drop("__level", "__width", "__bin", "__plevel", "__pwidth", "__pbin")
  }

  /** All (a, b) pairs whose half-open intervals OVERLAP
    * (`aStart < bEnd && bStart < aEnd`) — the interval×interval
    * sibling of [[pointInInterval]], again without a theta join.
    *
    * Lemma: two overlapping intervals BOTH cover the time bin
    * containing `max(aStart, bStart)` (that instant lies in both), so
    * an equi-join on covered-bin ids is recall-complete for ANY bin
    * width. Duplicate-freeness comes from the responsibility
    * predicate: a pair is emitted only from that one bin
    * (`bin == floor(max(aStart, bStart) / W)`) — no post-dedup
    * shuffle. The residual overlap predicate only discards.
    *
    * Cost: each interval explodes onto `len/W + 1` bins, so W is
    * derived from the MEDIAN length of the longer-median side
    * (balanced explode on typical rows; a long-tail interval explodes
    * proportionally to its own length — at 100 TB that is the knob to
    * revisit with a two-level scheme if tails dominate). Inputs must
    * have disjoint column names. */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      binWidth: Option[Long] = None): DataFrame = {
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "interval frames' column names must be disjoint (alias before joining)")
    def medianLen(df: DataFrame, s: String, e: String): Long = {
      val row = df.select((col(e) - col(s)).cast("long").as("len"))
        .filter(col("len") > 0) // malformed rows must not skew the stats
        .agg(expr("approx_percentile(len, 0.5, 1000)")).head()
      if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
    }
    // one shared grid (the lemma needs it); width = the larger median
    // so BOTH sides' typical rows land on ~1-2 bins
    val w = binWidth.getOrElse(
      math.max(medianLen(a, aStart, aEnd), medianLen(b, bStart, bEnd)))
    // drop malformed (empty) intervals BEFORE the explode — with
    // end ≤ start the sequence() is descending (default step −1) and one
    // corrupt row fans out onto |start−end|/W bins; an empty interval
    // overlaps nothing, so the filter is semantics-preserving
    val aSide = a.filter(col(aEnd) > col(aStart))
      .withColumn("__abin", explode(sequence(
        expr(binExpr(aStart, s"${w}L")),
        expr(binExpr(s"($aEnd - 1)", s"${w}L")))))
    val bSide = b.filter(col(bEnd) > col(bStart))
      .withColumn("__bbin", explode(sequence(
        expr(binExpr(bStart, s"${w}L")),
        expr(binExpr(s"($bEnd - 1)", s"${w}L")))))
    aSide.join(bSide,
        aSide("__abin") === bSide("__bbin") &&
          aSide(aStart) < bSide(bEnd) && bSide(bStart) < aSide(aEnd) &&
          // responsibility bin: emit each pair exactly once
          aSide("__abin") === expr(
            binExpr(s"greatest($aStart, $bStart)", s"${w}L")))
      .drop("__abin", "__bbin")
  }
}
