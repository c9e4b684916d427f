package graft.queries

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

case class Nat(n_nationkey: Int, n_name: String, n_regionkey: Int)
case class Reg(r_regionkey: Int, r_name: String)

/** Typed Dataset API + map higher-order-function coverage: the
  * case-class-encoded surface the engine exposes alongside DataFrames
  * (SURVEY §1.2 "typed view"). */
class TypedApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("typed Dataset: as[T], joinWith, groupByKey/mapGroups") {
    import spark.implicits._
    val nation: Dataset[Nat] = graft.Tables(spark, dir, "nation").as[Nat]
    val region: Dataset[Reg] = graft.Tables(spark, dir, "region").as[Reg]
    // typed join: pairs, not flattened rows
    val pairs = nation.joinWith(region,
      nation("n_regionkey") === region("r_regionkey"))
    assert(pairs.count() == 25)
    val first = pairs.filter(_._1.n_nationkey == 0).head()
    assert(first._1.isInstanceOf[Nat] && first._2.isInstanceOf[Reg])
    // typed aggregation
    val perRegion = nation.groupByKey(_.n_regionkey)
      .mapGroups((k, it) => (k, it.size))
      .collect().toMap
    assert(perRegion.values.sum == 25 && perRegion.size == 5)
  }

  test("map higher-order functions: transform_keys/values, map_filter, map_zip_with") {
    import spark.implicits._
    val df = Seq(Map("a" -> 1, "b" -> 2, "c" -> 3)).toDF("m")
    val out = df.select(
      map_filter($"m", (_, v) => v > 1).as("filtered"),
      transform_values($"m", (_, v) => v * 10).as("scaled"),
      transform_keys($"m", (k, _) => upper(k)).as("upped"),
      map_zip_with($"m", $"m", (_, v1, v2) => v1 + v2).as("doubled"))
      .head()
    assert(out.getAs[Map[String, Int]]("filtered") == Map("b" -> 2, "c" -> 3))
    assert(out.getAs[Map[String, Int]]("scaled") == Map("a" -> 10, "b" -> 20, "c" -> 30))
    assert(out.getAs[Map[String, Int]]("upped") == Map("A" -> 1, "B" -> 2, "C" -> 3))
    assert(out.getAs[Map[String, Int]]("doubled") == Map("a" -> 2, "b" -> 4, "c" -> 6))
  }
}
