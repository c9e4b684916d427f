package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The fused CharNGrams Expression must be bit-identical to the HOF
  * chain `transform(sequence(1, length(t) - n + 1), i ->
  * substring(t, i, n))` — on the real corpus through parquet-backed
  * frames (codegen path; LocalRelation folds to interpreted eval — the
  * x78 lesson), on random multibyte strings (interpreted path), and on
  * the degenerate below-n lengths where the HOF's sequence DESCENDS. */
class CharNGramsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hof(n: Int) =
    expr(s"transform(sequence(1, length(t) - $n + 1), i -> substring(t, i, $n))")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[String])] =
    df.collect().map(r =>
      (r.getLong(0), r.getSeq[String](1))).sortBy(_._1).toSeq

  test("expression == HOF chain on the real corpus (codegen path)") {
    import spark.implicits._
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("t", lower($"text")).filter(length($"t") >= 3)
    val a = canon(d.select($"doc_id", CharNGrams.charNGrams($"t", 3).as("g")))
    val b = canon(d.select($"doc_id", hof(3).as("g")))
    assert(a.nonEmpty && a == b)
  }

  test("expression == HOF chain on random multibyte strings, n in {2,3,5}, " +
      "including the descending below-n corner (interpreted path)") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val alphabet = "abc déλ語🙂x ".toCharArray // ascii, 2/3/4-byte chars
    val strs = (0L until 150L).map { i =>
      val len = rng.nextInt(12) // includes 0, 1, 2 — the corner lengths
      (i, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    } :+ (1000L, "") :+ (1001L, "a") :+ (1002L, "ab") :+ (1003L, "🙂é")
    val d = strs.toDF("doc_id", "t")
    for (n <- Seq(2, 3, 5)) {
      val a = canon(d.select($"doc_id", CharNGrams.charNGrams($"t", n).as("g")))
      val b = canon(d.select($"doc_id", hof(n).as("g")))
      assert(a == b, s"n=$n diff: ${a.zip(b).find(p => p._1 != p._2)}")
    }
  }

  test("NULL input -> NULL (nullIntolerant)") {
    import spark.implicits._
    val d = Seq((1L, Option.empty[String]), (2L, Some("abcd")))
      .toDF("doc_id", "t")
    val got = d.select($"doc_id", CharNGrams.charNGrams($"t", 3).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).isDefined)
  }
}
