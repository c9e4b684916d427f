package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The fused CharEntropy Expression must agree with the q109 HOF chain
  * (`-Σ p·log2 p` over `split(text, '')`) within float summation-order
  * drift (≤1e-9 — far under the 6-decimal rounding the gate prints):
  * on the real corpus through parquet-backed frames (codegen path;
  * LocalRelation folds to interpreted eval — the x78 lesson), on random
  * MULTIBYTE strings including surrogate-pair emoji (the segmentation
  * hazard: both sides must count CODE POINTS), and on the degenerate
  * null/empty/single-char inputs where q109's null and −0.0 rules
  * live. */
class CharEntropySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The original q109 HOF chain, verbatim (pre-r15 shape). */
  private def hofEntropy = {
    val chs = filter(split(col("t"), ""), c => c =!= lit(""))
    val t = size(chs).cast("double")
    val probs = transform(array_distinct(chs),
      c => size(filter(chs, x => x === c)).cast("double") / t)
    when(size(chs) > 0,
      -aggregate(probs, lit(0.0),
        (acc, p) => acc + p * log(p) / log(lit(2.0))))
  }

  private def exprEntropy = CharEntropy.charEntropy(col("t"))

  private def canon(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Option[Double]] =
    df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  private def agree(a: Map[Long, Option[Double]],
      b: Map[Long, Option[Double]]): Unit = {
    assert(a.keySet == b.keySet)
    for (k <- a.keySet) (a(k), b(k)) match {
      case (Some(x), Some(y)) =>
        assert(math.abs(x - y) <= 1e-9, s"doc $k: hof $x vs expr $y")
      case (x, y) => assert(x == y, s"doc $k: hof $x vs expr $y")
    }
  }

  test("expression == HOF chain on the real corpus (codegen path)") {
    import spark.implicits._
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text".as("t"))
    val a = canon(d.select($"doc_id", hofEntropy.as("e")))
    val b = canon(d.select($"doc_id", exprEntropy.as("e")))
    assert(a.nonEmpty)
    agree(a, b)
  }

  test("expression == HOF chain on random multibyte strings incl. " +
      "surrogate-pair emoji, and the null/empty/single-char corners " +
      "(interpreted path)") {
    import spark.implicits._
    val rng = new scala.util.Random(53)
    val alphabet = "aabbc déλ語🙂🚀x "
      .codePoints().toArray // code points, incl. 2 surrogate pairs
    val strs: Seq[(Long, String)] = (0L until 200L).map { i =>
      val len = rng.nextInt(40)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ =>
        sb.appendCodePoint(alphabet(rng.nextInt(alphabet.length))))
      (i, sb.toString)
    } :+ (1000L, "") :+ (1001L, "a") :+ (1002L, "🙂") :+
      (1003L, "🙂🙂a") :+ (1004L, "aaaa")
    val d = strs.toDF("doc_id", "t")
      .union(Seq((1005L, Option.empty[String])).toDF("doc_id", "t"))
    val a = canon(d.select($"doc_id", hofEntropy.as("e")))
    val b = canon(d.select($"doc_id", exprEntropy.as("e")))
    agree(a, b)
    // the pinned corners: null/empty → null; uniform 1-char → 0;
    // 'aaaa' → exactly 0.0 (q109 adds +0.0 so both engines print one
    // zero — the expression's log2(1)−0 is already +0.0)
    assert(b(1005L).isEmpty && b(1000L).isEmpty)
    assert(b(1001L).contains(0.0) && b(1004L).contains(0.0))
    assert(b(1002L).contains(0.0), "one emoji = one code point = H 0")
    // 🙂🙂a: p = (2/3, 1/3) — H = log2(3) − (2·log2 2)/3
    val h = math.log(3) / math.log(2) - 2.0 / 3.0
    assert(math.abs(b(1003L).get - h) < 1e-12, b(1003L).toString)
  }
}
