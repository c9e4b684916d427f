package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-assembly operators (q101–q103): RNG-free weighted sampling,
  * BM25 scoring, mixture balancing — determinism and contract checks
  * beyond the DuckDB hash gate. */
class LlmOps6Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("Q101 weighted sample: content-deterministic, weight-tilted, " +
      "expected fraction in band") {
    import spark.implicits._
    val n = graft.Tables(spark, dir, "documents").count()
    val kept = LlmOps6.q101(spark, dir).collect()
    val keptIds = kept.map(_.getLong(0)).toSet
    // expected kept fraction is f = 1/5 in the weighted sense; a wide
    // band guards the assertion against fixture drift
    assert(keptIds.size >= n / 10 && keptIds.size <= n * 2 / 5,
      s"kept ${keptIds.size} of $n")
    // membership is a pure function of content — invariant under
    // partition layout (q84's invariance property for the sampler)
    val again = LlmOps6.q101(spark, dir).collect().map(_.getLong(0)).toSet
    assert(again == keptIds)
    // the weighting tilts: mean kept length exceeds the corpus mean
    val meanAll = graft.Tables(spark, dir, "documents")
      .agg(org.apache.spark.sql.functions.avg($"n_chars")).head().getDouble(0)
    val meanKept = kept.map(_.getLong(2).toDouble).sum / kept.length
    assert(meanKept > meanAll,
      s"kept mean $meanKept not above corpus mean $meanAll")
  }

  test("Q102 BM25: hits contain query terms, scores ranked, idf sane") {
    import spark.implicits._
    val rows = LlmOps6.q102(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 3))
    // every returned doc really contains at least one query term
    val terms = Set("spark", "query", "vector")
    val texts = graft.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    rows.foreach { r =>
      assert(texts(r.getLong(0)).intersect(terms).nonEmpty)
    }
  }

  test("Q104 winnow: exact-dup docs share all fingerprints; pairs need " +
      ">= 3 shared; disjoint docs never pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{explode, split}
    val base = (0 until 60).map(i => s"w${(i * 7) % 97}x").mkString(" ")
    val other = (0 until 60).map(i => s"z${(i * 11) % 89}q").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),                     // exact dup pair
      (3L, base.split(" ").take(30).mkString(" ")), // shared 30-token prefix
      (4L, other)                                  // disjoint
    ).toDF("doc_id", "text")
    val got = LlmOps6.winnowSharedPassages(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fpCount = docs.filter($"doc_id" === 1L)
      .select(explode(graft.functions.WinnowFingerprints
        .winnowFingerprints(split($"text", " ")))).count()
    assert(got((1L, 2L)) == fpCount) // exact dups share every fingerprint
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L))) // shared passage
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L)) // disjoint
    assert(got((1L, 3L)) < fpCount) // partial overlap is partial
  }

  test("Q103 mixture: per-source quotas filled (capped by availability), " +
      "nothing stolen across sources") {
    import spark.implicits._
    val quotas = Map("src0" -> 15, "src1" -> 10, "src2" -> 20, "src3" -> 5)
    val avail = graft.Tables(spark, dir, "documents")
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = LlmOps6.q103(spark, dir).collect()
      .groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length }
    assert(got.keySet.subsetOf(quotas.keySet))
    quotas.foreach { case (src, q) =>
      val want = math.min(q.toLong, avail.getOrElse(src, 0L))
      assert(got.getOrElse(src, 0).toLong == want, s"$src: $got")
    }
    // rnk is 1..quota within each source
    LlmOps6.q103(spark, dir).collect()
      .groupBy(_.getString(1)).foreach { case (src, rs) =>
        assert(rs.map(_.getInt(2)).sorted.toSeq ==
          (1 to rs.length).toSeq, src)
      }
  }
}
