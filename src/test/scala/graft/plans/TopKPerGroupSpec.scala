package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("TopKPerGroup matches the window row_number formulation") {
    import spark.implicits._
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice")
    val got = GraftOps.topKPerGroup(orders, 3, Seq("o_orderstatus"),
      Seq(GraftOps.Order("o_totalprice", desc = true), GraftOps.Order("o_orderkey")),
      rankName = "rn")
      .select($"o_orderstatus", $"rn", $"o_orderkey")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val want = orders.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_orderstatus", $"rn", $"o_orderkey")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.size == 9)
  }

  test("the physical plan is partial heap -> exchange -> final heap") {
    import spark.implicits._
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val df = GraftOps.topKPerGroup(orders, 5, Seq("o_orderstatus"),
      Seq(GraftOps.Order("o_totalprice", desc = true)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val topKs = "TopKPerGroup".r.findAllIn(plan).size
    assert(topKs >= 2, s"expected partial+final TopKPerGroupExec:\n$plan")
    // the partial stage bounds what crosses the shuffle: with 3 groups
    // and k=5, at most 15 rows per input partition reach the exchange
  }

  test("partial-pass flush bound preserves correctness under high-cardinality groups") {
    import spark.implicits._
    // 2000 rows, 500 groups, 4 partitions → each partial task would hold
    // ~500 heaps; a flush bound of 8 rows forces dozens of flushes per
    // task, and the final pass must still produce the exact top-2
    val df = (0 until 2000).map(i => (i % 500, i, (i * 37 % 101).toDouble))
      .toDF("g", "id", "score").repartition(4)
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val want = df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 2)
      .select($"g", $"rnk", $"id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    // every flush bound — pathological (1) through no-flush (default) —
    // must produce the identical exact result
    for (bound <- Seq(1L, 3L, 8L, Long.MaxValue)) {
      val got = GraftOps.topKPerGroup(df, 2, Seq("g"),
        Seq(GraftOps.Order("score", desc = true), GraftOps.Order("id")),
        partialFlushRows = bound)
        .select($"g", $"rnk", $"id")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == want, s"flush bound $bound broke top-k")
    }
    assert(want.size == 1000)
  }

  test("empty input yields an empty ranked result") {
    import spark.implicits._
    val df = Seq.empty[(Int, Double)].toDF("g", "score")
    val out = GraftOps.topKPerGroup(df, 3, Seq("g"),
      Seq(GraftOps.Order("score", desc = true)))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("g", "score", "rnk"))
  }

  test("k larger than any group returns every row ranked") {
    import spark.implicits._
    val nation = graft.Tables(spark, "/root/testdata/sf0.001", "nation")
    val df = GraftOps.topKPerGroup(nation, 1000, Seq("n_regionkey"),
      Seq(GraftOps.Order("n_nationkey")))
    assert(df.count() == 25)
    assert(df.filter($"rnk" === 1).count() == 5) // one per region
  }
}
