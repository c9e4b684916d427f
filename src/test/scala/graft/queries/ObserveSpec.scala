package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability: `observe()` attaches metrics to a plan so a
  * 100 TB job can report row counts / quality gauges without a second
  * pass over the data. */
class ObserveSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("observe() collects metrics in the same pass as the query") {
    import spark.implicits._
    val observation = new org.apache.spark.sql.Observation("docs_metrics")
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .observe(observation,
        count(lit(1)).as("n_docs"),
        sum(length($"text")).as("total_chars"),
        min($"n_chars").as("min_chars"))
      .filter($"lang" === "en")
    val enCount = df.count()
    val metrics = observation.get
    assert(metrics("n_docs") == 500L) // observed BEFORE the filter
    assert(enCount < 500)
    assert(metrics("total_chars").asInstanceOf[Long] > 0)
  }
}
