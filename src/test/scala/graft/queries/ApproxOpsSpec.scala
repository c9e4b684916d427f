package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-error verification of the approximate operators against
  * their exact twins (SURVEY rule §2.C.0.6). */
class ApproxOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("Q47 MinHash LSH recalls nearly all exact Jaccard>=0.7 pairs") {
    val exact = LlmOps.q36(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ApproxOps.q47(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & approx).size.toDouble / exact.size
    // 8 OR-ed hash tables at s>=0.7: P(candidate) = 1-(1-s)^8 > 0.9999
    assert(recall >= 0.95, s"recall $recall")
  }

  test("x105 incremental LSH == exact delta pairs within banding recall " +
      "(both vocab regimes); every emitted pair touches the delta") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // exact truth = operators.IncrementalNearDup (itself spec'd against
    // the full sweep and, via q105, the DuckDB oracle)
    def run(d: org.apache.spark.sql.DataFrame, t: Double,
        mod: Long): Unit = {
      val old = d.filter(col("doc_id") % mod =!= 0)
      val neu = d.filter(col("doc_id") % mod === 0)
      val exact = graft.operators.IncrementalNearDup
        .newPairs(old, neu, t).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val approx = ApproxOps.minhashNearDupPairsDelta(old, neu, t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(exact.nonEmpty, "degenerate fixture")
      val recall =
        (exact.keySet & approx.keySet).size.toDouble / exact.size
      assert(recall >= 0.95, s"recall $recall")
      // verify is exact, so every emitted pair is a TRUE pair with the
      // exact jaccard, and must touch the delta
      approx.foreach { case (k, jac) =>
        assert(exact.contains(k), s"false positive $k")
        assert(exact(k) == jac, s"jaccard mismatch at $k")
        assert(k._1 % mod == 0 || k._2 % mod == 0,
          s"corpus-only pair $k emitted")
      }
    }
    // bitmask regime (31-token unigram vocab → map-side mask verify)
    run(LlmOps.docTokens(spark, dir), 0.7, 4L)
    // generic regime (trigram sets, vocab ≫ 62 → array_intersect
    // verify) — the q105/x105 shape
    run(LlmOps2.triSets(spark, dir)
      .select(col("doc_id"), col("tris").as("toks")), 0.2, 5L)
    // empty delta → empty output
    val d = LlmOps.docTokens(spark, dir)
    assert(ApproxOps.minhashNearDupPairsDelta(
      d, d.filter(col("doc_id") < -1), 0.7).isEmpty)
  }

  test("x105 scale pin: delta-probed candidate volume is " +
      "|bucket|·|bucket∩delta| per band, never |bucket|²") {
    import spark.implicits._
    // hot-bucket fixture (the q105 pin's LSH analogue, VERDICT r7 #6):
    // 200 corpus docs + 2 delta docs with IDENTICAL token sets land in
    // ONE bucket per band. Per band the production deltaBandJoin emits
    // |bucket|·|bucket∩delta| − |delta| self-pairs − C(|delta|,2)
    // id-disordered new–new rows = 202·2 − 2 − 1 = 403 − 2 = 401; the
    // full sweep's self-join would emit C(202,2) = 20301 per band.
    val toks = Seq("a", "b", "c")
    val old = (0L until 200L).map(i => (i, toks)).toDF("doc_id", "toks")
    val delta = Seq((1000L, toks), (1001L, toks)).toDF("doc_id", "toks")
    val got = ApproxOps.deltaCandidates(old, delta).count()
    assert(got == 16L * 401L,
      s"candidate volume $got != delta-bounded ${16 * 401} " +
        s"(full sweep: ${16 * 20301})")
  }

  test("sparse corpus (<0.01% true-pair density): LSH candidates ≪ all-pairs, " +
      "recall holds, clusters coherent") {
    import spark.implicits._
    // The driver fixture is pathologically DENSE (41% true-pair density
    // at sf0.01 — VERDICT r3), so q47's 20 s there is candidate-volume-
    // inherent, not plan overhead. This corpus is the other regime —
    // the one 100 TB web data actually lives in: ~500 docs, 2000-token
    // vocabulary (forcing the generic non-bitmask paths), 10 planted
    // drop-one near-dup pairs (jac 0.95) + 1 exact-dup pair. Random
    // 20-token sets overlap by ~0.2 tokens expected, so no accidental
    // pairs. Proves the banding PRUNES when density allows: candidates
    // track true pairs, not all-pairs.
    val tmp = java.nio.file.Files.createTempDirectory("sparse_docs").toString
    val vocab = 2000
    def randSet(seed: Int, n: Int = 20): Seq[String] = {
      val rng = new scala.util.Random(seed)
      Iterator.continually(rng.nextInt(vocab)).distinctBy(identity)
        .take(n).map(i => f"w$i%04d").toSeq
    }
    val base = (0 until 480).map(i => (i.toLong, randSet(i)))
    val planted = (0 until 10).flatMap { k =>
      val ts = randSet(100000 + k)
      Seq((1000L + 2 * k, ts), (1001L + 2 * k, ts.dropRight(1))) // jac 19/20
    }
    val exactDup = { val ts = randSet(200000); Seq((2000L, ts), (2001L, ts)) }
    val docs = base ++ planted ++ exactDup
    docs.map { case (id, ts) =>
      (id, ts.mkString(" "), "en", "synth", ts.mkString(" ").length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val n = docs.size.toLong
    val allPairs = n * (n - 1) / 2
    val exact = LlmOps.q36(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // corpus is as sparse as designed: 11 true pairs / ~126k all-pairs
    assert(exact.size == 11, s"planted 11 pairs, found ${exact.size}")
    assert(exact.size.toDouble / allPairs < 0.0001)

    // candidate volume through the PRODUCTION band signatures: the
    // prune must track true pairs, not all-pairs (≤ ~10× slack for
    // random band collisions; the dense fixture's 41% can't get this)
    val bands = ApproxOps.bandSignatures(LlmOps.docTokens(spark, tmp))
    val candPairs = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.sig" === $"y.sig" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id", $"y.doc_id").distinct().count()
    assert(candPairs < allPairs / 1000,
      s"$candPairs candidates vs $allPairs all-pairs — banding did not prune")
    assert(candPairs <= 110, s"$candPairs candidates for 11 true pairs")

    // full pipeline on the sparse corpus: exact agreement (planted pairs
    // sit at jac 0.95/1.0 — P(all 16 bands miss) < 1e-13)
    val approx = ApproxOps.q47(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == exact, s"diff: ${(approx -- exact) ++ (exact -- approx)}")

    // cluster twin: 11 components of size 2, q80 keeps one doc per
    // component plus every singleton
    val labels = LlmOps3.clusterLabels(spark, tmp)
    val sizes = LlmOps3.q57From(spark, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.count(_._2 == 2L) == 11 && sizes.forall(_._2 <= 2L))
    val kept = LlmOps3.q80From(spark, tmp, labels).collect().map(_.getLong(0))
    assert(kept.length == n - 11)
  }

  test("LSH band shape derives from the requested threshold " +
      "(low thresholds widen bands instead of silently dropping recall)") {
    import spark.implicits._
    // ADVICE r4: the fixed 16-band × 3-row scheme is the s=0.7 design
    // point; at threshold 0.4 its candidate recall is ~0.65 while the
    // facade still claimed the ≥0.95 spec. bandRowsFor re-derives the
    // most selective banding meeting the ≥0.98 theoretical candidate
    // probability at the REQUESTED threshold over the same 48-hash budget.
    assert(ApproxOps.bandRowsFor(0.7) == 3)  // the measured default shape
    assert(ApproxOps.bandRowsFor(0.9) == 6)  // tighter bands when allowed
    assert(ApproxOps.bandRowsFor(0.4) == 2)  // wider bands when needed
    assert(ApproxOps.bandRowsFor(0.15) == 1)
    intercept[IllegalArgumentException](ApproxOps.bandRowsFor(0.0))

    // functional twin at a moderate threshold: 12 planted pairs sharing
    // 10 of 30 distinct tokens (jaccard exactly 1/3) in a 100-doc
    // background corpus. The derived banding (r=1, b=48 at t=0.3:
    // P(candidate) ≈ 1) recovers every planted pair; the fixed 0.7-tuned
    // shape provably cannot (P(candidate|s=1/3) ≈ 0.45 per pair).
    // Deterministic: fixed seeds, fixed hash constants.
    def randSet(seed: Int, n: Int = 20): Seq[String] = {
      val rng = new scala.util.Random(seed)
      Iterator.continually(rng.nextInt(2000)).distinctBy(identity)
        .take(n).map(i => f"w$i%04d").toSeq
    }
    val planted = (0 until 12).flatMap { k =>
      val a = randSet(300000 + k)
      val b = a.take(10) ++ randSet(400000 + k).filterNot(a.contains).take(10)
      Seq((3000L + 2 * k, a), (3001L + 2 * k, b)) // jac = 10/30
    }
    val docs = (0 until 100).map(i => (i.toLong, randSet(i))) ++ planted
    val d = docs.toDF("doc_id", "toks")
    val plantedPairs = (0 until 12).map(k => (3000L + 2 * k, 3001L + 2 * k)).toSet

    val got = ApproxOps.minhashNearDupPairs(d, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plantedPairs.subsetOf(got),
      s"derived banding missed: ${plantedPairs -- got}")

    // and the un-derived 0.7-tuned candidates DO miss planted pairs on
    // this corpus — the regression the derivation exists to prevent
    val fixedBands = ApproxOps.bandSignatures(d, bandRows = 3)
    val fixedCands = fixedBands.as("x").join(fixedBands.as("y"),
        $"x.band" === $"y.band" && $"x.sig" === $"y.sig" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id", $"y.doc_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((plantedPairs -- fixedCands).nonEmpty,
      "corpus no longer demonstrates the fixed-banding recall gap")
  }

  test("threshold 1.0 degenerates to exact token-SET equality: only " +
      "identical distinct-token sets pair, with certainty (r12 edge)") {
    import spark.implicits._
    // 3 planted identical-set groups (one with permuted order and a
    // duplicated token — set semantics must still pair them), plus
    // near-identical decoys at jaccard 30/31 and 9/10 that must NOT
    // pair at t=1.0 though they would at the 0.7 default
    val base = (0 until 30).map(i => s"t$i")
    val docs = Seq(
      (1L, base),
      (2L, base.reverse),                       // same set, permuted
      (3L, base :+ "t0"),                       // same set, duplicate token
      (4L, base :+ "extra"),                    // jac 30/31 decoy
      (10L, Seq("a", "b", "c")),
      (11L, Seq("c", "b", "a")),                // same set
      (20L, (0 until 9).map(i => s"u$i")),
      (21L, (0 until 10).map(i => s"u$i")))     // jac 9/10 decoy
      .toDF("doc_id", "toks")
    val got = ApproxOps.minhashNearDupPairs(docs, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L))
    assert(got == want, s"t=1.0 pairs: got $got want $want")
    // sanity: the decoys DO pair at the default threshold
    val loose = ApproxOps.minhashNearDupPairs(docs, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((1L, 4L)) && loose.contains((20L, 21L)))
  }

  test("Q48 IVF ANN recalls a usable share of the exact top-10") {
    val exact = LlmOps.q37(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = ApproxOps.q48(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // nprobe=4 of 16 cells scans ~25% of vectors, but the probed cells
    // are the query's NEAREST cells, which hold most of its true top-10
    // even on near-uniform data: measured 0.87 at sf0.001 and sf0.01,
    // identical for k-means and raw-seed quantizers (no cluster
    // structure to exploit). Floor leaves margin for fixture changes.
    assert(recall >= 0.6, s"recall $recall")
    assert(approx.size == 30) // 3 queries x k=10, all cells non-empty
  }

  test("x53 approx_percentile tracks exact percentiles within 2%") {
    val exact = Relational2.q53(spark, dir).collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    val approx = Relational2.q53Approx(spark, dir).collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (flag, es) =>
      es.zip(approx(flag)).foreach { case (e, a) =>
        // accuracy=10000 over ~2k rows/group at sf0.001 → rank-exact,
        // but exact percentile() INTERPOLATES between order statistics
        // while the sketch returns an actual sample — so allow one
        // inter-value step (l_quantity is integer-valued, step 1.0) on
        // top of the 2% relative band
        assert(math.abs(a - e) <= math.max(0.02 * math.abs(e), 1.0),
          s"$flag: approx $a vs exact $e")
      }
    }
  }

  test("Q15 approx_count_distinct is within 5% of exact") {
    val rows = Relational2.q15(spark, dir).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
