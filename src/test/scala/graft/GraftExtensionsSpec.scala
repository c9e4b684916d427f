package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("cosine_sim is callable from SQL via session extensions") {
    val r = spark.sql(
      "SELECT round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) c")
      .collect().head.getDouble(0)
    assert(r == 1.0)
    val orth = spark.sql(
      "SELECT round(cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)), 6) c")
      .collect().head.getDouble(0)
    assert(orth == 0.0)
  }
}
