package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning (InjectRuntimeFilter): when a
  * shuffle join's build side carries a selective filter, Spark builds a
  * bloom filter over the join keys and pushes a `might_contain`
  * predicate into the probe side's SCAN — at 100 TB this is what keeps
  * a fact-table scan from shuffling rows that can never join. The
  * thresholds here are lowered to toy scale (the defaults gate on a
  * 10 GB probe-side scan); the mechanism, not the tuning, is what the
  * engine relies on. */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("a selective dimension filter injects a bloom filter into the fact scan") {
    import spark.implicits._
    val li = graft.Tables(spark, dir, "lineitem")
    val ord = graft.Tables(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 400000)
    val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"no runtime bloom filter on the probe side:\n$p")
    assert(p.contains("bloom_filter_agg"),
      s"no bloom filter aggregate on the build side:\n$p")
    // the filter is pruning-only — results match the unfiltered plan
    val expected = graft.Tables(spark, dir, "lineitem")
      .join(graft.Tables(spark, dir, "orders")
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 400000)
          .hint("broadcast"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n")).collect()
    assert(rows.map(_.toSeq).toSet == expected.map(_.toSeq).toSet)
    assert(rows.nonEmpty)
  }
}
