package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition layout + pruning: hive-partitioned parquet written by the
  * engine must expose partition filters to the scan (the lever that
  * makes a 100 TB table readable in partition-sized bites). */
class PartitionPruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("filters on partition columns prune at scan time") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("pruning").toString
    graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .write.mode("overwrite")
      .partitionBy("l_returnflag")
      .parquet(out)
    val q = spark.read.parquet(out)
      .filter($"l_returnflag" === "R")
      .groupBy($"l_linestatus").agg(sum($"l_quantity").as("q"))
    val scanDesc = q.queryExecution.executedPlan.toString
    // the partition predicate must appear as a PartitionFilter, not a
    // post-scan Filter over all partitions
    assert(scanDesc.contains("PartitionFilters") &&
      scanDesc.matches("(?s).*PartitionFilters: \\[[^\\]]*l_returnflag[^\\]]*\\].*"),
      s"partition filter not pushed:\n$scanDesc")
    // and the answer must match the unpartitioned read
    val got = q.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val want = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .filter($"l_returnflag" === "R")
      .groupBy($"l_linestatus").agg(sum($"l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == want)
  }
}
