package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One-pass profiler: exact stats on a null-bearing synthetic frame,
  * approx variant bounded against exact on real data. */
class ProfilerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("exact profile: nulls, distincts, min/max on a mixed frame") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")),
      (Some(3L), Some("c")), (None, Some("a"))
    ).toDF("num", "str")
    val got = Profiler.profile(df, Seq("num", "str")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(got("num") == ((5L, 2L, 2L, "1", "3")))
    assert(got("str") == ((5L, 1L, 3L, "a", "c")))
  }

  test("approx distinct within 5% of exact on lineitem") {
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_orderkey", "l_partkey", "l_extendedprice")
    val exact = Profiler.profile(li, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profiler.profileApprox(li, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      assert(math.abs(approx(c) - exact(c)).toDouble / exact(c) <= 0.05,
        s"$c: ${approx(c)} vs ${exact(c)}")
    }
    // and the shared non-distinct stats are identical
    val e2 = Profiler.profile(li, cols).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val a2 = Profiler.profileApprox(li, cols).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(e2 == a2)
  }

  test("sketch percentiles track exact p50/p95 within 2% (VERDICT r4 #4)") {
    import org.apache.spark.sql.functions.expr
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_returnflag")
    val got = Profiler.profileApprox(li, cols).collect()
      .map(r => r.getString(0) ->
        ((Option(r.getAs[java.lang.Double]("p50")),
          Option(r.getAs[java.lang.Double]("p95"))))).toMap
    // non-numeric columns: null percentiles, never an analysis error
    assert(got("l_returnflag") == ((None, None)))
    // numeric columns: ≤2% relative error (plus one inter-value step —
    // exact percentile() interpolates, the sketch returns a sample; x53's
    // documented allowance) vs exact q53-style quantiles
    val exact = li.agg(
        expr("percentile(l_quantity, 0.5)"), expr("percentile(l_quantity, 0.95)"),
        expr("percentile(l_extendedprice, 0.5)"),
        expr("percentile(l_extendedprice, 0.95)")).head()
    def check(c: String, e50: Double, e95: Double, step: Double): Unit = {
      val (p50, p95) = (got(c)._1.get, got(c)._2.get)
      assert(math.abs(p50 - e50) <= math.max(0.02 * math.abs(e50), step),
        s"$c p50: $p50 vs $e50")
      assert(math.abs(p95 - e95) <= math.max(0.02 * math.abs(e95), step),
        s"$c p95: $p95 vs $e95")
    }
    check("l_quantity", exact.getDouble(0), exact.getDouble(1), 1.0)
    check("l_extendedprice", exact.getDouble(2), exact.getDouble(3), 0.01)
  }
}
