package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Generalized pigeonhole Hamming join vs brute force — beyond q52's
  * d=2/32-bit case: 64-bit fingerprints, d=3, both default and custom
  * band counts, and the uneven last band (64 / 5 bands). */
class HammingJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def brute(fps: Seq[(Long, Long)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= d
    } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb))).toSet

  /** Clustered fingerprints: seeds + ≤3-bit perturbations, so the
    * distance spectrum actually has mass at 0..3. */
  private def fixture(seed: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    val seeds = Seq.fill(20)(rng.nextLong())
    (0 until 300).map { i =>
      val base = seeds(rng.nextInt(seeds.size))
      val flips = rng.nextInt(4)
      val f = (0 until flips).foldLeft(base)((acc, _) =>
        acc ^ (1L << rng.nextInt(64)))
      (i.toLong, f)
    }
  }

  test("d=3 over 64-bit fingerprints == brute force (default and 5 bands)") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val fps = fixture(seed)
      val want = brute(fps, 3)
      for (bandCount <- Seq(0, 5)) { // 0 → default d+2=5... keep both paths
        val got = HammingJoin.selfJoin(fps.toDF("id", "f"), "id", "f",
            maxDist = 3, bits = 64, numBands = bandCount)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == want, s"seed $seed bands $bandCount")
      }
      assert(want.nonEmpty)
    }
  }

  test("q52's exact configuration through the operator (4x8-bit, d=2)") {
    import spark.implicits._
    val fps = fixture(7).map { case (i, f) => (i, f & 0xffffffffL) }
    val want = brute(fps, 2)
    val got = HammingJoin.selfJoin(fps.toDF("id", "f"), "id", "f",
        maxDist = 2, bits = 32, numBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("newPairs == the full pair set filtered to pairs touching the " +
      "delta: old-new once, new-new once, old-old never") {
    import spark.implicits._
    for (seed <- Seq(11, 12)) {
      val fps = fixture(seed)
      // split so both sides share fingerprint clusters: old-old,
      // old-new AND new-new true pairs all exist
      val (corpus, delta) = fps.partition(_._1 % 3 != 0)
      val deltaIds = delta.map(_._1).toSet
      val want = brute(fps, 3)
        .filter(p => deltaIds(p._1) || deltaIds(p._2))
      val got = HammingJoin.newPairs(corpus.toDF("id", "f"),
          delta.toDF("id", "f"), "id", "f", maxDist = 3, bits = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"seed $seed")
      // the filter above must have actually removed old-old true pairs
      // — otherwise this test degenerates to the selfJoin one
      assert(brute(fps, 3).size > want.size, s"seed $seed: no old-old pairs")
      assert(want.exists(p => deltaIds(p._1) && deltaIds(p._2)),
        s"seed $seed: no new-new pairs")
      assert(want.exists(p => deltaIds(p._1) ^ deltaIds(p._2)),
        s"seed $seed: no old-new pairs")
    }
  }

  test("newPairs with an empty delta is empty") {
    import spark.implicits._
    val fps = fixture(13)
    val got = HammingJoin.newPairs(fps.toDF("id", "f"),
      Seq.empty[(Long, Long)].toDF("id", "f"), "id", "f",
      maxDist = 3, bits = 64)
    assert(got.count() == 0)
  }
}
