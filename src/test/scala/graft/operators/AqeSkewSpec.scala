package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning: with skew thresholds lowered to toy scale,
  * a 95%-hot-key sort-merge join must be marked `isSkew` and split —
  * the mechanism the engine relies on (instead of manual salting) for
  * skewed JOINs at 100 TB. */
class AqeSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    .config("spark.sql.ui.explainMode", "formatted")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("AQE splits the skewed side of a sort-merge join") {
    import spark.implicits._
    val left = (0 until 200000).map { i =>
      (if (i % 20 == 0) s"k${i % 40}" else "HOT", i.toLong)
    }.toDF("key", "v")
    val right = (0 until 2000).map(i => (s"k${i % 40}", i.toLong))
      .toDF("key", "w").union(Seq(("HOT", 0L)).toDF("key", "w"))
    // NOTE: an operator downstream that requires the join's partitioning
    // (e.g. groupBy on the join key) blocks OptimizeSkewedJoin — skew
    // splitting would break the required distribution. A global count
    // has no distribution requirement, so the split can happen.
    val joined = left.join(right, "key").agg(count(lit(1)).as("n"))
    val result = joined.collect().head.getLong(0)
    // HOT matches 1 right row; each k* left row matches 50 right rows
    assert(result == 190000L * 1 + 10000L * 50)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n${plan.take(4000)}")
  }
}
