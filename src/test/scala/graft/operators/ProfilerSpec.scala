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
}
