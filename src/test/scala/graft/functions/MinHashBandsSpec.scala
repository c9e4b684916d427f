package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The fused MinHashBands Expression must be bit-identical to the
  * declarative HOF chain (`ApproxOps.bandSignaturesHof`) — on the real
  * corpus through parquet-backed frames (codegen path; LocalRelation
  * folds to interpreted eval — the x78 lesson) AND on random token
  * arrays through a LocalRelation (interpreted path). */
class MinHashBandsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("expression == HOF chain on the real corpus (codegen path)") {
    import spark.implicits._
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    val a = canon(graft.queries.ApproxOps.bandSignatures(d))
    val b = canon(graft.queries.ApproxOps.bandSignaturesHof(d))
    assert(a.nonEmpty && a == b)
  }

  test("expression == HOF chain on random token arrays (interpreted path)") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val docs = (0L until 200L).map { i =>
      val n = 1 + rng.nextInt(40)
      (i, Seq.fill(n)(rng.alphanumeric.take(1 + rng.nextInt(12)).mkString)
        .distinct)
    }
    val d = docs.toDF("doc_id", "toks")
    assert(canon(graft.queries.ApproxOps.bandSignatures(d)) ==
      canon(graft.queries.ApproxOps.bandSignaturesHof(d)))
  }

  test("declared divergences: empty array → no band rows; null handling") {
    import spark.implicits._
    val d = Seq((1L, Seq.empty[String]), (2L, Seq("a", "b")))
      .toDF("doc_id", "toks")
    val rows = graft.queries.ApproxOps.bandSignatures(d)
    assert(rows.filter($"doc_id" === 1L).count() == 0) // NULL → not exploded
    assert(rows.filter($"doc_id" === 2L).count() == 16)
    // the HOF emits 16 NULL-sig rows for the empty doc — both shapes
    // yield zero usable band keys (NULL never equi-joins)
    val hof = graft.queries.ApproxOps.bandSignaturesHof(d)
    assert(hof.filter($"doc_id" === 1L && $"sig".isNotNull).count() == 0)
  }
}
