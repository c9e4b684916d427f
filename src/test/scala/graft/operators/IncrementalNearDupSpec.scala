package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental near-dup vs the full-sweep oracle (the delta-touching
  * subset of `LlmOps.neardupPairs`, itself hash-gated against DuckDB),
  * plus the scale pin: the candidate-incidence volume is delta-bounded,
  * never the corpus×corpus self-join. */
class IncrementalNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df(rows: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "toks")
  }

  /** Planted near-dup corpus: docs mutate one of `nBases` base sets by
    * up to 2 tokens, so threshold-crossing pairs are plentiful; a few
    * docs carry empty token sets (must pair with nothing). */
  private def corpus(seed: Int, nDocs: Int): Seq[(Long, Seq[String])] = {
    val rng = new scala.util.Random(seed)
    val vocab = (0 until 40).map(i => s"t$i")
    val bases = (0 until 8).map(_ =>
      rng.shuffle(vocab).take(6 + rng.nextInt(5)).toSet)
    (0L until nDocs.toLong).map { id =>
      if (rng.nextInt(12) == 0) (id, Seq.empty[String])
      else {
        val b = bases(rng.nextInt(bases.size))
        val mutated = b.filter(_ => rng.nextInt(8) > 0) ++
          rng.shuffle(vocab).take(rng.nextInt(3))
        (id, mutated.toSeq.sorted)
      }
    }
  }

  private def collectPairs(d: DataFrame): Map[(Long, Long), Double] =
    d.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("randomized: newPairs == full-sweep pairs touching the delta") {
    for (seed <- Seq(7, 31, 59)) {
      val all = corpus(seed, 80)
      val (delta, old) = all.partition(_._1 % 4 == 0)
      val want = collectPairs(graft.queries.LlmOps.neardupPairs(
          df(all), 0.5, forceInverted = true))
        .filter { case ((a, b), _) => a % 4 == 0 || b % 4 == 0 }
      val got = collectPairs(
        IncrementalNearDup.newPairs(df(old), df(delta), 0.5))
      assert(got == want, s"seed=$seed diff: " +
        s"${(got.keySet -- want.keySet).take(5)} / " +
        s"${(want.keySet -- got.keySet).take(5)}")
      assert(want.nonEmpty, s"seed=$seed: degenerate fixture, no pairs")
      // the fixture must exercise BOTH orientations and new–new pairs
      assert(want.keys.exists { case (a, b) => a % 4 == 0 && b % 4 != 0 })
      assert(want.keys.exists { case (a, b) => a % 4 != 0 && b % 4 == 0 })
      assert(want.keys.exists { case (a, b) => a % 4 == 0 && b % 4 == 0 })
    }
  }

  test("empty delta -> no pairs; empty corpus -> delta self-sweep") {
    val all = corpus(11, 40)
    val (delta, old) = all.partition(_._1 % 4 == 0)
    assert(IncrementalNearDup.newPairs(df(old),
      df(Seq.empty[(Long, Seq[String])]), 0.5).isEmpty)
    val want = collectPairs(graft.queries.LlmOps.neardupPairs(
      df(delta), 0.5, forceInverted = true))
    val got = collectPairs(IncrementalNearDup.newPairs(
      df(Seq.empty[(Long, Seq[String])]), df(delta), 0.5))
    assert(got == want)
  }

  test("scale pin: candidate incidences are delta-bounded, not the " +
      "corpus self-join") {
    // 200 corpus docs + 2 delta docs all sharing one hot token: the
    // full sweep's incidence count for that token is C(202,2) = 20301;
    // the incremental join must produce exactly
    // df_all*df_delta - df_delta - C(df_delta,2) = 202*2 - 2 - 1 = 401.
    val old = (0L until 200L).map(i => (i, Seq("hot", s"u$i")))
    val delta = Seq((1000L, Seq("hot", "a")), (1001L, Seq("hot", "b")))
    val got = IncrementalNearDup
      .candidateIncidences(df(old), df(delta)).count()
    // per-token expectation over the whole fixture: "hot" contributes
    // 401; "a"/"b"/"u*" are singletons (0 pairs)
    assert(got == 401L,
      s"incidence volume $got != delta-bounded 401 (full sweep: 20301)")
  }
}
