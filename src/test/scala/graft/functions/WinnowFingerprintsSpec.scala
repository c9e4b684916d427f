package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fused winnowing Expression == the declarative HOF chain, bit for
  * bit, on real and random corpora — codegen AND interpreted paths. */
class WinnowFingerprintsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def viaExpr(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id"),
      WinnowFingerprints.winnowFingerprints(col("toks")).as("fps"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  private def viaHof(d: org.apache.spark.sql.DataFrame) =
    graft.queries.LlmOps6.winnowFingerprintsHof(d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("expression == HOF chain on the documents fixture") {
    import spark.implicits._
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
    val e = viaExpr(d)
    val h = viaHof(d)
    assert(e == h && e.nonEmpty)
    assert(e.values.exists(_.nonEmpty))
  }

  test("expression == HOF chain on random corpora incl. edge lengths") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // lengths straddle every contract branch: 0 tokens, < k, k..k+w-2
    // (fewer grams than a window), and long docs
    val docs = (0L until 200L).map { id =>
      val n = rng.nextInt(14) // 0..13 tokens around k=5, w=4 boundaries
      (id, (0 until n).map(_ => s"t${rng.nextInt(30)}"))
    } ++ Seq((900L, (0 until 300).map(_ => s"t${rng.nextInt(10)}").toSeq))
    val d = docs.toDF("doc_id", "toks")
    assert(viaExpr(d) == viaHof(d))
    // interpreted path (no codegen) agrees too
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(viaExpr(d) == viaHof(d))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("text variant (split fused into the byte loop) == " +
      "winnow_fingerprints(split(text)) bit for bit, incl. space edges") {
    import spark.implicits._
    def viaText(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"),
        WinnowFingerprints.winnowFingerprintsText(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def viaSplit(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"),
        WinnowFingerprints.winnowFingerprints(split(col("text"), " ")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // real corpus
    val real = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    assert(viaText(real) == viaSplit(real))
    // adversarial space layouts: empty string, all spaces, consecutive /
    // leading / trailing spaces (empty tokens!), multibyte characters,
    // long docs over the 64-byte gram cap
    val rng = new scala.util.Random(41)
    val edge = Seq("", " ", "   ", "a", " a", "a ", "a  b", "  a b c d e  ",
      "é ü ß 漢 字 test token七 x y", "a b c d e f") ++
      (0 until 120).map { _ =>
        val n = rng.nextInt(14)
        (0 until n).map(_ => if (rng.nextInt(6) == 0) ""
          else s"t${rng.nextInt(30)}").mkString(" ")
      } :+ (0 until 300).map(_ => s"t${rng.nextInt(10)}").mkString(" ")
    val d = edge.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    assert(viaText(d) == viaSplit(d))
    // interpreted path agrees with codegen
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(viaText(d) == viaSplit(d))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // null text → null row value
    val withNull = Seq((0L, "a b c d e f"), (1L, null)).toDF("doc_id", "text")
    val got = withNull.select(col("doc_id"),
      WinnowFingerprints.winnowFingerprintsText(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty && got(0L).nonEmpty)
  }

  test("winnowing coverage lemma: any shared run of >= k+w-1 tokens " +
      "shares >= 1 fingerprint (randomized plants)") {
    import spark.implicits._
    // The property the operator's recall rests on (Schleimer et al.):
    // a shared run of k+w-1 tokens contains w consecutive shared grams,
    // i.e. one full shared window — and every window's min is selected,
    // so both docs select the same fingerprint from it. Plant length-8
    // runs (k=5, w=4) into random contexts and check the intersection.
    val rng = new scala.util.Random(57)
    val docs = (0 until 40).flatMap { t =>
      val run = (0 until 8).map(_ => s"r${t}_${rng.nextInt(50)}")
      def ctx(n: Int) = (0 until n).map(_ => s"c${rng.nextInt(5000)}")
      Seq(
        (t * 2L, (ctx(rng.nextInt(30)) ++ run ++ ctx(rng.nextInt(30)))),
        (t * 2L + 1, (ctx(rng.nextInt(30)) ++ run ++ ctx(rng.nextInt(30)))))
    }
    val fps = viaExpr(docs.toDF("doc_id", "toks"))
    (0 until 40).foreach { t =>
      val shared = fps(t * 2L).toSet.intersect(fps(t * 2L + 1).toSet)
      assert(shared.nonEmpty, s"plant $t: shared 8-run left no " +
        s"common fingerprint")
    }
  }

  test("contract edges: empty array, short docs, null element") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq.empty[String]),            // no tokens → empty
      (2L, Seq("a", "b")),                // < k tokens → empty
      (3L, Seq("a", "b", "c", "d", "e")) // exactly one gram → its hash
    ).toDF("doc_id", "toks")
    val e = viaExpr(d)
    assert(e(1L).isEmpty && e(2L).isEmpty && e(3L).size == 1)
    // null element → NULL array
    val withNull = spark.sql(
      "SELECT 4L AS doc_id, array('a', CAST(NULL AS STRING)) AS toks")
    val r = withNull.select(WinnowFingerprints
      .winnowFingerprints(col("toks")).as("fps")).collect()
    assert(r.head.isNullAt(0))
  }
}
