package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Data-driven multi-resolution interval join vs the naive theta-join
  * oracle on a LONG-TAIL length distribution — the workload q94's
  * bin-by-max can't serve (VERDICT r3 task 8: a 100× length spread
  * drags every short window through 100×-looser candidate bins). */
class IntervalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // seconds over one day; 80% short (1–5 min), 15% medium (~1 h),
  // 5% long (~8 h) — max/median ≈ 240×
  private def fixture = {
    val rng = new scala.util.Random(77)
    val intervals = (0 until 300).map { i =>
      val len =
        if (i < 240) 60L + rng.nextInt(240)
        else if (i < 285) 3000L + rng.nextInt(1200)
        else 25000L + rng.nextInt(7000)
      val start = rng.nextInt(86400).toLong
      (i.toLong, start, start + len)
    }
    val points = (0 until 3000).map(j => (j.toLong, rng.nextInt(86400).toLong))
    (intervals, points)
  }

  test("long-tail fixture: binned multi-resolution join == theta-join oracle") {
    import spark.implicits._
    val (ivs, pts) = fixture
    val intervals = ivs.toDF("w_id", "w_start", "w_end")
    val points = pts.toDF("p_id", "p_ts")
    val got = IntervalJoin
      .pointInInterval(intervals, points, "w_start", "w_end", "p_ts")
      .select($"w_id", $"p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (for {
      (w, s, e) <- ivs; (p, t) <- pts if t >= s && t < e
    } yield (w, p)).sorted
    assert(want.nonEmpty && got == want)

    // the derivation actually spread the levels (capped at 6 by the
    // 240× tail) and the top width covers the longest interval
    val h = IntervalJoin.deriveHierarchy(intervals, "w_start", "w_end")
    assert(h.levels > 1, s"long tail collapsed to one level: $h")
    assert(h.levels <= 6)
    assert(h.width(h.levels - 1) >= ivs.map(i => i._3 - i._2).max, s"$h")

    // and it stays an equi join — no BNL / cartesian anywhere
    val plan = IntervalJoin
      .pointInInterval(intervals, points, "w_start", "w_end", "p_ts")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("boundary semantics: start inclusive, end exclusive; empty inputs") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 20L)).toDF("w_id", "w_start", "w_end")
    val points = Seq((1L, 9L), (2L, 10L), (3L, 19L), (4L, 20L))
      .toDF("p_id", "p_ts")
    val got = IntervalJoin
      .pointInInterval(intervals, points, "w_start", "w_end", "p_ts")
      .select($"p_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L))
    val empty = IntervalJoin.pointInInterval(
      intervals.limit(0), points, "w_start", "w_end", "p_ts")
    assert(empty.count() == 0)
  }

  test("open-ended sentinel interval (end = Long.MaxValue) derives a " +
      "finite hierarchy and joins correctly") {
    import spark.implicits._
    // the naive `base << (l-1) < maxLen` level derivation wraps (Long
    // shift is mod 64) once maxLen is near 2^63 and spins the driver
    // forever — the valid_to=∞ sentinel row is the common trigger
    val intervals = Seq((1L, 0L, Long.MaxValue), (2L, 10L, 20L))
      .toDF("w_id", "w_start", "w_end")
    val points = Seq((1L, 5L), (2L, 15L), (3L, 25L)).toDF("p_id", "p_ts")
    val h = IntervalJoin.deriveHierarchy(intervals, "w_start", "w_end")
    assert(h.levels >= 1) // reaching here at all is the regression guard
    val got = IntervalJoin
      .pointInInterval(intervals, points, "w_start", "w_end", "p_ts")
      .select($"w_id", $"p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L)))
  }

  test("randomized instances == brute force (varied length regimes)") {
    import spark.implicits._
    for (seed <- 0 until 12) {
      val rng = new scala.util.Random(seed)
      val span = 1 + rng.nextInt(5000)
      val ivs = (0 until 30).map { i =>
        val s = rng.nextInt(span).toLong
        (i.toLong, s, s + 1 + rng.nextInt(1 + rng.nextInt(span)))
      }
      val pts = (0 until 100).map(j => (j.toLong, rng.nextInt(span).toLong))
      val got = IntervalJoin.pointInInterval(
          ivs.toDF("w_id", "s", "e"), pts.toDF("p_id", "t"), "s", "e", "t")
        .select($"w_id", $"p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        (w, s, e) <- ivs; (p, t) <- pts if t >= s && t < e
      } yield (w, p)).sorted
      assert(got == want, s"seed $seed")
    }
  }

  test("interval-overlap join == theta oracle, duplicate-free, no BNL") {
    import spark.implicits._
    for (seed <- 0 until 8) {
      val rng = new scala.util.Random(100 + seed)
      val span = 2000
      val as = (0 until 80).map { i =>
        val s = rng.nextInt(span).toLong
        (i.toLong, s, s + 1 + rng.nextInt(1 + rng.nextInt(600)))
      }
      val bs = (0 until 120).map { j =>
        val s = rng.nextInt(span).toLong
        (j.toLong, s, s + 1 + rng.nextInt(1 + rng.nextInt(300)))
      }
      val got = IntervalJoin.intervalOverlap(
          as.toDF("a_id", "a_s", "a_e"), bs.toDF("b_id", "b_s", "b_e"),
          "a_s", "a_e", "b_s", "b_e")
        .select($"a_id", $"b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = for {
        (ai, s1, e1) <- as; (bi, s2, e2) <- bs if s1 < e2 && s2 < e1
      } yield (ai, bi)
      // Seq equality after sort: a responsibility-bin bug would show as
      // duplicates, not just set mismatch
      assert(got.sorted == want.sorted, s"seed $seed")
    }
    // boundary: half-open — touching intervals do not overlap
    val a1 = Seq((1L, 0L, 10L)).toDF("a_id", "a_s", "a_e")
    val b1 = Seq((1L, 10L, 20L), (2L, 9L, 11L)).toDF("b_id", "b_s", "b_e")
    val touch = IntervalJoin.intervalOverlap(
        a1, b1, "a_s", "a_e", "b_s", "b_e")
      .select($"b_id").collect().map(_.getLong(0)).toSeq
    assert(touch == Seq(2L))
    // and the plan stays an equi join
    val plan = IntervalJoin.intervalOverlap(
        a1, b1, "a_s", "a_e", "b_s", "b_e")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("malformed intervals (end <= start) are dropped, never exploded") {
    import spark.implicits._
    // ADVICE r4: sequence(bin(start), bin(end-1)) with end <= start is
    // DESCENDING (default step −1), so one corrupt row used to fan out
    // onto |start−end|/W bins. An empty interval contains no instants,
    // so the guard filter is semantics-preserving — and the corrupt row
    // below (span 86 400 000 backwards) must not cost a 86k-bin explode.
    val ivs = Seq(
      (1L, 100L, 200L),               // well-formed
      (2L, 500L, 500L),               // empty (end == start)
      (3L, 86400000L, 0L)             // corrupt: end far before start
    ).toDF("w_id", "w_s", "w_e")
    val pts = Seq((1L, 150L), (2L, 500L), (3L, 1000L)).toDF("p_id", "p_ts")
    val got = IntervalJoin.pointInInterval(ivs, pts, "w_s", "w_e", "p_ts")
      .select($"w_id", $"p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L)))
    // same guard on both sides of the overlap join: the malformed rows
    // pair with nothing. Note (2) WOULD pass the raw half-open overlap
    // predicate against (10) (500 < 1000 && 0 < 500) despite containing
    // no instants — the filter is what keeps it out, not the residual.
    val bs = Seq((10L, 0L, 1000L)).toDF("b_id", "b_s", "b_e")
    val ov = IntervalJoin.intervalOverlap(
        ivs, bs, "w_s", "w_e", "b_s", "b_e")
      .select($"w_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ov == Seq((1L, 10L)))
  }

  test("deriveHierarchy memoizes per (plan, cols, cap): a repeated call " +
      "runs zero Spark jobs") {
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val ivs = (0 until 200).map(i => (i.toLong, i.toLong, i + 10L))
        .toDF("w_id", "s", "e")
      // listener events are async: poll until the count is stable for a
      // few windows (all actions below are blocking, so in-flight events
      // drain within the stability window)
      def settled(): Int = {
        var prev = -1
        var cur = jobs.get()
        while (cur != prev) { Thread.sleep(200); prev = cur; cur = jobs.get() }
        cur
      }
      val h1 = IntervalJoin.deriveHierarchy(ivs, "s", "e")
      val afterFirst = settled()
      assert(afterFirst >= 1) // the derivation really ran an aggregate
      val h2 = IntervalJoin.deriveHierarchy(ivs, "s", "e")
      assert(h2 == h1)
      assert(settled() == afterFirst,
        "second deriveHierarchy on the same frame ran a Spark job")
      // a different cap is a different key — recomputes (and may differ)
      IntervalJoin.deriveHierarchy(ivs, "s", "e", maxLevels = 2)
      assert(settled() > afterFirst)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("hierarchy cap coarsens the base instead of dropping coverage") {
    import spark.implicits._
    // max/median = 1024× would need 11 levels; cap at 4 must still fit
    val ivs = ((0 until 100).map(i => (i.toLong, 0L, 16L)) :+
      (100L, 0L, 16384L)).toDF("w_id", "s", "e")
    val h = IntervalJoin.deriveHierarchy(ivs, "s", "e", maxLevels = 4)
    assert(h.levels == 4)
    assert(h.width(3) >= 16384L)
  }
}
