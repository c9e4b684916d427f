package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: build-once/query-many must reproduce the
  * inline q48 formulation exactly (same deterministic codebook), and
  * the probed-cells partition prune must reach the assignments scan. */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("persisted index query == inline q48; probe prunes partitions") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val emb = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    IvfIndex.build(emb, idx, c = 16)
    // the index is plain parquet: one dir per cell
    val cellDirs = new java.io.File(s"$idx/assignments").listFiles()
      .filter(_.getName.startsWith("cent_id=")).map(_.getName).sorted
    assert(cellDirs.length > 1, cellDirs.mkString(","))

    val queries = emb.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val fromIndex = IvfIndex.query(spark, idx, queries, k = 10, nprobe = 4)
    val inline = graft.queries.ApproxOps.q48(spark, dir)
    val a = fromIndex.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val b = inline.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(a.nonEmpty && a == b)

    // the probed-cell filter must reach the assignments scan as a
    // partition filter (so only nprobe-ish of the 16 cell dirs are read)
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cent_id"), plan)
  }
}
