package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The Arrow-batched transform surface: lossless round-trip, columnar
  * worker correctness vs the DataFrame twin, and the batch-size bound
  * (the memory knob of the mapInPandas execution shape). */
class ArrowInteropSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def media = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
  }

  test("arrow digest worker matches the DataFrame-computed digests") {
    import spark.implicits._
    val got = graft.queries.Extensions.q49Arrow(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val want = media
      .select($"doc_id", octet_length(decode($"payload", "UTF-8")).as("byte_len"),
        sha2($"payload", 256).as("digest"))
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("identity worker round-trips batches losslessly") {
    import spark.implicits._
    val df = media
    val back = ArrowInterop.mapInArrowBatches(df, df.schema, 32)(identity)
    val a = df.orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    val b = back.orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    assert(a.toSeq == b.toSeq)
  }

  test("batchSize bounds rows per batch") {
    val acc = spark.sparkContext.longAccumulator("arrow_batches")
    val one = media.coalesce(1)
    val n = one.count()
    val counted = ArrowInterop.mapInArrowBatches(one, one.schema, 8) { batches =>
      batches.map { b => acc.add(1); b }
    }
    assert(counted.count() == n)
    assert(acc.value == math.ceil(n / 8.0).toLong,
      s"expected ceil($n/8) batches, saw ${acc.value}")
  }
}
