package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** E11 — image near-dup (VERDICT r13 task 2): the composition of the
  * REAL image decode path into the dedup machinery. The ground truth is
  * exact by construction, the q52 rule: the engine's banded
  * [[graft.operators.HammingJoin]] must equal a brute-force all-pairs
  * popcount over the SAME dHash fingerprints (banding is
  * recall-complete by pigeonhole; collisions are exactly verified), and
  * the fixture plants the near-dup classes the operator exists to
  * catch — a re-encode (PNG→BMP), a downscale, a global brightness
  * shift — against visually distinct images that must NOT pair.
  * Engine-only row (DuckDB cannot decode images), the E03 precedent. */
class ImageNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Deterministic textured image: a low-frequency luminance field
    * whose orientation/frequency depend on `seed`, kept inside
    * [40, 215] so a +25 brightness shift never clamps (clamping would
    * flatten gradients and change the hash for real). */
  private def pattern(seed: Int, w: Int, h: Int,
      brightness: Int = 0): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val fx = 0.20 + 0.13 * (seed % 4)
    val fy = 0.11 + 0.17 * ((seed / 4) % 4)
    val ph = seed * 1.7
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = 127.5 + 87.0 * math.sin(fx * x + fy * y + ph)
      val v = math.max(0, math.min(255, math.round(v0).toInt + brightness))
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    im
  }

  private def encode(im: java.awt.image.BufferedImage,
      fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def media(rows: Seq[(Long, String, Array[Byte])]) = {
    import spark.implicits._
    rows.map { case (id, t, p) => Multimodal.MediaRecord(id, t, p) }.toDS()
  }

  test("planted duplicates pair, distinct images do not, and the " +
      "banded join equals the brute-force popcount over the same " +
      "fingerprints") {
    // 6 distinct base images; image 0 additionally ships 3 near-dup
    // variants: re-encoded (BMP), downscaled (the real resizeImage),
    // brightness-shifted (+25)
    val base = (0 until 6).map(s => s.toLong ->
      encode(pattern(s, 48, 36), "png")).toMap
    val reenc = encode(pattern(0, 48, 36), "bmp")
    val resized = Multimodal.Codecs.resizeImage(base(0L), 24, 18).get
    assert(!java.util.Arrays.equals(resized, base(0L)),
      "fixture: the resized copy must actually be a different payload")
    val brighter = encode(pattern(0, 48, 36, brightness = 25), "png")
    val rows = base.toSeq.map { case (id, p) => (id, "image/png", p) } ++ Seq(
      (100L, "image/bmp", reenc),
      (101L, "image/png", resized),
      (102L, "image/png", brighter))
    val ds = media(rows)

    val maxDist = 10
    val pairs = Multimodal.imageNearDupPairs(ds, maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(p => (p._1, p._2))

    // ground truth: brute-force popcount over the SAME fingerprints
    val fps = Multimodal.imageFingerprints(ds).collect()
      .map(f => f.doc_id -> f.fp).sortBy(_._1)
    assert(fps.length == rows.length, "every fixture image must decode")
    val brute = (for {
      i <- fps.indices; j <- (i + 1) until fps.length
      d = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if d <= maxDist
    } yield (math.min(fps(i)._1, fps(j)._1),
        math.max(fps(i)._1, fps(j)._1), d)).sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == brute.toSeq,
      s"banded join diverged from brute force:\n engine ${pairs.toSeq}\n" +
        s" brute  ${brute.toSeq}")

    // the planted variants each pair with their original...
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    for (v <- Seq(100L, 101L, 102L))
      assert(pairSet.contains((0L, v)),
        s"planted near-dup $v of image 0 did not pair (fps: " +
          s"${fps.toSeq.filter(f => f._1 == 0L || f._1 == v)})")
    // ...and no two DISTINCT base images pair
    for (a <- 0L until 6L; b <- (a + 1) until 6L)
      assert(!pairSet.contains((a, b)),
        s"distinct images $a and $b paired — fixture patterns too close")
  }

  test("incremental image near-dup: a new batch pairs against the " +
      "corpus and within itself, but corpus-internal duplicates never " +
      "emit") {
    // corpus: images 0..3 where 3 is a re-encode of 2 (an OLD-OLD
    // duplicate pair the delta probe must NOT emit); delta: a
    // brightness-shifted copy of 0 (old-new), two resized copies of 1
    // (old-new ×2 AND new-new between themselves), one fresh image
    val base = (0 until 5).map(s => s.toLong ->
      encode(pattern(s, 48, 36), "png")).toMap
    val corpus = media(Seq(
      (0L, "image/png", base(0L)), (1L, "image/png", base(1L)),
      (2L, "image/png", base(2L)),
      (3L, "image/bmp", encode(pattern(2, 48, 36), "bmp"))))
    val delta = media(Seq(
      (100L, "image/png", encode(pattern(0, 48, 36, brightness = 25), "png")),
      (101L, "image/png", Multimodal.Codecs.resizeImage(base(1L), 24, 18).get),
      (102L, "image/png", Multimodal.Codecs.resizeImage(base(1L), 24, 18).get),
      (103L, "image/png", base(4L))))
    val maxDist = 10
    val got = Multimodal.imageNearDupPairsDelta(corpus, delta, maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: brute popcount over ALL fingerprints, filtered to
    // pairs touching the delta
    val all = Multimodal.imageFingerprints(media(
      corpus.collect().map(m => (m.doc_id, m.media_type, m.payload)).toSeq ++
        delta.collect().map(m => (m.doc_id, m.media_type, m.payload)).toSeq))
      .collect().map(f => f.doc_id -> f.fp)
    val want = (for {
      (ia, fa) <- all; (ib, fb) <- all
      if ia < ib && (ia >= 100L || ib >= 100L) &&
        java.lang.Long.bitCount(fa ^ fb) <= maxDist
    } yield (ia, ib)).toSet
    assert(got == want, s"engine $got vs brute-filtered $want")
    // the planted relations, by name:
    assert(got.contains((0L, 100L)), "old-new brightness pair missing")
    assert(got.contains((1L, 101L)) && got.contains((1L, 102L)),
      "old-new resize pairs missing")
    assert(got.contains((101L, 102L)), "new-new pair missing")
    assert(!got.exists(p => p._1 < 100L && p._2 < 100L),
      s"corpus-internal pair emitted by the delta probe: $got")
    assert(!got.exists(p => p._1 == 103L || p._2 == 103L),
      "fresh distinct image paired with something")
  }

  test("undecodable payloads and synthetic image/fake rows are dropped " +
      "from the fingerprint relation, never a failed job") {
    val ok = encode(pattern(1, 32, 24), "png")
    val ds = media(Seq(
      (1L, "image/png", ok),
      (2L, "image/png", Array[Byte](9, 9, 9)),                // corrupt
      (3L, "image/fake", "not an image at all".getBytes("UTF-8")),
      (4L, "image/png", ok)))                                 // exact twin
    val fps = Multimodal.imageFingerprints(ds).collect()
    assert(fps.map(_.doc_id).sorted.toSeq == Seq(1L, 4L))
    assert(fps(0).fp == fps(1).fp, "identical payloads must hash equal")
    val pairs = graft.Graft.imageNearDupPairs(ds).collect()
    assert(pairs.length == 1 &&
      pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 4L &&
      pairs(0).getInt(2) == 0)
  }

  test("imageDedup facade: retention == the brute-force greedy " +
      "expectation; fingerprint-less rows are retained") {
    // the planted fixture from the pairs test, plus a corrupt row and
    // a synthetic fake row (no fingerprint → must survive dedup)
    val base = (0 until 6).map(s => s.toLong ->
      encode(pattern(s, 48, 36), "png")).toMap
    val rows = base.toSeq.map { case (id, p) => (id, "image/png", p) } ++ Seq(
      (100L, "image/bmp", encode(pattern(0, 48, 36), "bmp")),
      (101L, "image/png", Multimodal.Codecs.resizeImage(base(0L), 24, 18).get),
      (102L, "image/png", encode(pattern(0, 48, 36, brightness = 25), "png")),
      (200L, "image/png", Array[Byte](1, 2, 3)), // corrupt: retained
      (201L, "image/fake", "text bytes".getBytes("UTF-8"))) // retained
    val ds = media(rows)
    val maxDist = 10
    val kept = Multimodal.imageDedup(ds, maxDist)
      .collect().map(_.doc_id).toSet
    // brute-force greedy expectation over the SAME fingerprints: drop
    // every id that is the GREATER side of any ≤maxDist pair
    val fps = Multimodal.imageFingerprints(ds).collect()
      .map(f => f.doc_id -> f.fp)
    val dropped = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= maxDist
    } yield ib).toSet
    val want = rows.map(_._1).toSet -- dropped
    assert(kept == want, s"engine $kept vs brute greedy $want")
    // by name: the three variants of image 0 dropped, the originals
    // and both fingerprint-less rows retained
    assert(Set(100L, 101L, 102L).intersect(kept).isEmpty, kept.toString)
    assert(Set(0L, 1L, 2L, 3L, 4L, 5L, 200L, 201L).subsetOf(kept),
      kept.toString)
  }

  test("imageDedupDelta: only delta rows are decided — a corpus dup of " +
      "a corpus image survives the delta pass, and the full-dedup twin " +
      "drops it exactly once") {
    // the incremental fixture: corpus 0..3 where 3 re-encodes 2 (a
    // corpus-INTERNAL duplicate); delta 100..103 with dups of 0 and 1
    val base = (0 until 5).map(s => s.toLong ->
      encode(pattern(s, 48, 36), "png")).toMap
    val corpusRows = Seq(
      (0L, "image/png", base(0L)), (1L, "image/png", base(1L)),
      (2L, "image/png", base(2L)),
      (3L, "image/bmp", encode(pattern(2, 48, 36), "bmp")))
    val deltaRows = Seq(
      (100L, "image/png", encode(pattern(0, 48, 36, brightness = 25), "png")),
      (101L, "image/png", Multimodal.Codecs.resizeImage(base(1L), 24, 18).get),
      (102L, "image/png", Multimodal.Codecs.resizeImage(base(1L), 24, 18).get),
      (103L, "image/png", base(4L)))
    val corpus = media(corpusRows)
    val delta = media(deltaRows)
    // delta pass: 100 (dup of 0), 101/102 (dups of 1, and of each
    // other) drop; the fresh 103 survives. Corpus rows are not decided
    // here — 3 duplicates 2 but is already published.
    val keptDelta = Multimodal.imageDedupDelta(corpus, delta)
      .collect().map(_.doc_id).toSet
    assert(keptDelta == Set(103L), keptDelta.toString)
    // the full-dedup twin over corpus ∪ delta drops the corpus-internal
    // duplicate 3 EXACTLY once (and everything the delta pass dropped)
    val keptFull = graft.Graft.imageDedup(media(corpusRows ++ deltaRows))
      .collect().map(_.doc_id).toSeq
    assert(keptFull.length == keptFull.distinct.length,
      s"duplicate retained rows: $keptFull")
    assert(keptFull.toSet == Set(0L, 1L, 2L, 103L), keptFull.toString)
  }

  test("dHash is deterministic and brightness-insensitive by " +
      "construction: same payload twice == same hash; +25 brightness " +
      "within clamp-free range == distance 0") {
    val p = encode(pattern(3, 48, 36), "png")
    assert(Multimodal.Codecs.dHash(p) == Multimodal.Codecs.dHash(p))
    val shifted = encode(pattern(3, 48, 36, brightness = 25), "png")
    val d = java.lang.Long.bitCount(
      Multimodal.Codecs.dHash(p).get ^ Multimodal.Codecs.dHash(shifted).get)
    // ≤2, not ==0: the scaler's integer rounding can flip a
    // near-tie comparison; the shift itself preserves every gradient
    assert(d <= 2,
      s"a clamp-free global brightness shift changed $d gradient bits")
  }
}
