package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SourceOverlap.{At, Prefix, Suffix}

/** The generalized boilerplate-overlap matrix (round 16): q113's
  * prefix shape is the default instantiation (pinned equal on the real
  * fixture), and the suffix / at-offset windows find exactly the
  * planted template families a prefix audit is blind to. */
class SourceOverlapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def matrix(df: org.apache.spark.sql.DataFrame,
      w: SourceOverlap.Window): Set[(String, String, Long)] =
    SourceOverlap.overlapMatrix(df, "text", "source", w)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

  test("Prefix(8) == q113 on the real documents fixture") {
    val got = SourceOverlap.overlapMatrix(
      graft.Tables(spark, dir, "documents"), "text", "source", Prefix(8))
    val want = graft.queries.LlmOps7.q113(spark, dir)
    assert(got.count() > 0, "degenerate fixture")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "the operator's default instantiation diverged from q113")
  }

  test("Suffix finds the planted shared footer a prefix audit misses; " +
      "short docs take their whole span; null texts group together") {
    import spark.implicits._
    val footer = "subscribe to our newsletter for more great content"
    val docs = Seq(
      // crawlA/crawlB ship the same 8-word footer under distinct heads
      ("crawlA", s"alpha beta gamma delta $footer"),
      ("crawlB", s"omega psi chi phi upsilon tau $footer"),
      // a crawlB doc SHORTER than the window whose whole text is a
      // tail of the footer — must NOT collide with the full footer
      ("crawlB", "for more great content"),
      // unrelated singletons — never in any pair
      ("crawlA", "completely unrelated document body one"),
      ("crawlB", "another unrelated document body two"),
      // null texts in two sources: their own group, one cross pair
      ("crawlA", null),
      ("crawlB", null)
    ).toDF("source", "text")
    assert(matrix(docs, Suffix(8)) == Set(
      ("crawlA", "crawlB", 2L))) // footer pair + null-null pair
    // the prefix audit at the same width sees only the null group
    assert(matrix(docs, Prefix(8)) == Set(("crawlA", "crawlB", 1L)))
  }

  test("At(offset, words) finds a planted mid-document template and " +
      "excludes docs with no window at that offset (incl. null text)") {
    import spark.implicits._
    val tmpl = "this page was generated automatically"
    val docs = Seq(
      // the template sits at word offset 3 in both sources
      ("feedX", s"one two three $tmpl and then original tail x"),
      ("feedY", s"uno dos tres $tmpl with a different ending y"),
      ("feedY", s"ichi ni san $tmpl plus more"),
      // too short for offset 3 → excluded, never grouped together
      ("feedX", "tiny doc"),
      ("feedY", "small one"),
      ("feedX", null)
    ).toDF("source", "text")
    assert(matrix(docs, At(3, 5)) == Set(
      ("feedX", "feedY", 2L),  // X's template doc × each of Y's two
      ("feedY", "feedY", 1L))) // Y's two template docs pair within
    // the same docs under Prefix(5): distinct heads → nothing
    assert(matrix(docs, Prefix(5)) == Set.empty[(String, String, Long)])
  }
}
