package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The fused WordNGrams Expression must be bit-identical to the HOF
  * chain it replaces in `LlmOps2.triSets` —
  * `when(size(sp) < n, array()).otherwise(array_distinct(transform(
  * sequence(1, size(sp) - n + 1), i -> concat_ws(' ', sp[i-1], ...))))`
  * with `sp = split(text, ' ')` — on the real corpus through
  * parquet-backed frames (codegen path; LocalRelation folds to
  * interpreted eval — the x78 lesson), and on adversarial strings:
  * leading/trailing/consecutive spaces (empty tokens), repeated grams
  * (array_distinct's first-occurrence order), multibyte text, and the
  * sub-n word counts. */
class WordNGramsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hof(n: Int) = {
    val parts = (0 until n).map(d => s"sp[i - 1 + $d]").mkString(", ")
    expr(
      s"""CASE WHEN size(split(t, ' ')) < $n THEN array()
         |ELSE array_distinct(transform(
         |  sequence(1, size(split(t, ' ')) - ${n - 1}),
         |  i -> concat_ws(' ', $parts)))
         |END""".stripMargin
        .replace("sp[", "split(t, ' ')["))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[String])] =
    df.collect().map(r =>
      (r.getLong(0), Option(r.getSeq[String](1)).getOrElse(null))).sortBy(_._1).toSeq

  test("expression == HOF chain on the real corpus (codegen path), n in {2,3}") {
    import spark.implicits._
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text".as("t"))
    for (n <- Seq(2, 3)) {
      val a = canon(d.select($"doc_id", WordNGrams.wordNGrams($"t", n).as("g")))
      val b = canon(d.select($"doc_id", hof(n).as("g")))
      assert(a.nonEmpty && a == b, s"n=$n")
      // sanity: the corpus genuinely exercises dedup (some doc repeats a gram)
      if (n == 2) assert(a.exists { case (id, g) =>
        val raw = d.filter($"doc_id" === id).select(
          expr("transform(sequence(1, size(split(t, ' ')) - 1), " +
            "i -> concat_ws(' ', split(t, ' ')[i-1], split(t, ' ')[i]))"))
          .collect()(0).getSeq[String](0)
        raw.size > g.size
      })
    }
  }

  test("adversarial strings: space runs, repeated grams, multibyte, sub-n, " +
      "null/empty (interpreted path)") {
    import spark.implicits._
    val strs: Seq[(Long, String)] = Seq(
      1L -> "a b a b a b a",        // repeated trigrams -> distinct order
      2L -> " a  b c ",             // leading/trailing/double spaces
      3L -> "",                     // one empty token
      4L -> "one two",              // below n=3
      5L -> "déjà vu λόγος 語 🙂 x", // multibyte
      6L -> "a a a a a a",          // single repeated gram
      7L -> "   ",                  // only empty tokens
      8L -> "x y z")
    val withNull = strs.toDF("doc_id", "t")
      .union(Seq((9L, Option.empty[String])).toDF("doc_id", "t"))
    for (n <- Seq(1, 2, 3, 5)) {
      val a = canon(withNull.select($"doc_id", WordNGrams.wordNGrams($"t", n).as("g")))
      val b = canon(withNull.select($"doc_id", hof(n).as("g")))
      assert(a == b, s"n=$n diff: ${a.zip(b).find(p => p._1 != p._2)}")
    }
    // null in -> null out
    val g9 = withNull.select($"doc_id", WordNGrams.wordNGrams($"t", 3).as("g"))
      .filter($"doc_id" === 9L).collect()(0)
    assert(g9.isNullAt(1))
  }
}
