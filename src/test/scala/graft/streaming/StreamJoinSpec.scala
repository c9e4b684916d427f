package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream join + RocksDB state store: the two pieces that make
  * streaming state survive 100 TB-scale cardinality — watermark-bounded
  * join state, kept off-heap in RocksDB instead of the JVM heap. */
class StreamJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("watermarked stream-stream join with RocksDB state matches expectations") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val c = clicks.toDF().select($"event_id".as("click_id"),
      $"user_id".as("c_user"), $"ts".as("c_ts")).withWatermark("c_ts", "1 hour")
    val p = purchases.toDF().select($"event_id".as("purchase_id"),
      $"user_id".as("p_user"), $"ts".as("p_ts")).withWatermark("p_ts", "1 hour")
    // purchase joins clicks from up to 30 minutes before it
    val joined = p.join(c,
      $"p_user" === $"c_user" && $"c_ts" <= $"p_ts" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    def ev(id: Long, uid: Long, t: String) =
      Event(id, Timestamp.valueOf(t), uid, "x", 1.0)
    clicks.addData(Seq(ev(1, 1, "2024-01-01 10:00:00"),
      ev(2, 1, "2024-01-01 09:00:00"), // too old for the 10:10 purchase
      ev(3, 2, "2024-01-01 10:05:00")))
    purchases.addData(Seq(ev(100, 1, "2024-01-01 10:10:00"),
      ev(101, 2, "2024-01-01 10:20:00")))
    q.processAllAvailable()
    // advance both watermarks so joined rows are emitted in append mode
    clicks.addData(Seq(ev(4, 9, "2024-01-01 13:00:00")))
    purchases.addData(Seq(ev(102, 9, "2024-01-01 13:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    assert(got.contains((100L, 1L)))  // in-window click matched
    assert(!got.contains((100L, 2L))) // outside the 30-minute window
    assert(got.contains((101L, 3L)))
    assert(got.contains((102L, 4L)))
  }
}
