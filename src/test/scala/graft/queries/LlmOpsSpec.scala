package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class LlmOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("Q36 inverted-index fallback produces the same pair set as the bitmask path") {
    import spark.implicits._
    val d = graft.Tables(spark, dir, "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaMask = pairs(LlmOps.neardupPairs(d))
    val viaInverted = pairs(LlmOps.neardupPairs(d, forceInverted = true))
    assert(viaMask.nonEmpty)
    assert(viaMask == viaInverted)
  }

  test("Q36 fallback handles a vocabulary too large for the bitmask path") {
    import spark.implicits._
    // 200-token vocabulary → tokenBitmasks returns None → inverted path
    // must be selected automatically and agree with a local brute force
    val docs = (0 until 60).map { i =>
      val toks = (0 until 12).map(j => s"w${(i * 7 + j * 11) % 200}").distinct
      (i.toLong, toks)
    }
    val df = docs.toDF("doc_id", "toks")
    val got = LlmOps.neardupPairs(df, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      inter = ta.toSet.intersect(tb.toSet).size.toDouble
      jac = inter / (ta.toSet ++ tb.toSet).size
      if jac >= 0.5
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.nonEmpty, "test data should contain at least one near-dup pair")
  }
}
