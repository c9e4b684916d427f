package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** 100 TB posture tests: skew salting correctness and bucketed
  * (shuffle-free) co-located joins. */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted two-phase aggregation equals direct groupBy on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val df = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"k${i % 50}" else "HOT", i.toDouble)
    }.toDF("key", "v")
    val direct = df.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Salting.saltedCountSum(df, "key", $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(sum($"l_quantity").as("q"))
    joined.collect() // force execution so AQE finalizes the plan
    def shuffles(p: SparkPlan): Int = {
      val self = if (p.isInstanceOf[ShuffleExchangeLike]) 1 else 0
      self + p.children.map(shuffles).sum +
        p.subqueries.map(shuffles).sum
    }
    val plan = joined.queryExecution.executedPlan
    // the join itself must be co-located: the only shuffle allowed is the
    // one for the final single-column aggregation
    val n = shuffles(plan)
    assert(n <= 1, s"expected at most 1 shuffle (final agg), got $n:\n$plan")
  }
}
