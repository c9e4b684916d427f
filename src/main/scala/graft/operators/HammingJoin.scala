package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All fingerprint pairs within a Hamming-distance bound, without the
  * O(n²) comparison — pigeonhole banding generalized from the
  * q52 formulation (`graft.queries.LlmOps2`, which delegates here).
  *
  * Lemma: cut a `bits`-wide fingerprint into B disjoint bands. Two
  * fingerprints within Hamming distance d differ in at most d bands,
  * so they agree EXACTLY on ≥ B − d bands; with B ≥ d + 1 they share
  * at least one whole band, making the (band, band_value) equi-join
  * recall-complete. Candidates are verified exactly (XOR + popcount),
  * so band collisions cost time, never correctness.
  *
  * Scale: candidates per band bucket are |docs in bucket|² — band
  * width is the knob (more bands → smaller buckets but looser
  * pigeonhole; the default B = d + 2 matches q52's measured 4×8-bit
  * split at d=2). A pair agreeing on several bands is verified that
  * many times; the post-verify distinct dedupes the small surviving
  * set instead of the much larger raw candidate stream. */
object HammingJoin {

  /** Pairs of `fp` (`idCol`, `fpCol`: integer fingerprint) with
    * Hamming distance ≤ `maxDist`. Output: (id_a < id_b, hamming).
    *
    * EAGER: the verified pair set is materialized at call time (an
    * eager `localCheckpoint` cuts the banded join out of downstream
    * lineage and lets the band cache be released before returning), so
    * this call runs a job rather than composing lazily — callers that
    * need a lazy frame should compose the banding themselves. The
    * unpersist runs even if the checkpoint job fails. */
  def selfJoin(fp: DataFrame, idCol: String, fpCol: String, maxDist: Int,
      bits: Int = 32, numBands: Int = 0): DataFrame = {
    val (bands, pairs) = bandedPairs(fp, idCol, fpCol, maxDist, bits, numBands)
    try graft.Hygiene.eagerCut(pairs)
    finally bands.unpersist(blocking = false)
  }

  /** Pairs within Hamming distance ≤ `maxDist` with at least one end
    * in `delta`, without ever comparing corpus fingerprints to each
    * other — the incremental twin of [[selfJoin]]
    * ([[IncrementalNearDup]]'s shape transplanted into Hamming space,
    * e.g. for per-batch image dedup against an already-deduped corpus).
    * The index side is corpus ∪ delta bands (a new fingerprint must see
    * both old and new partners); the PROBE side is the delta's bands
    * only, so candidate volume per band bucket is |all|·|delta| instead
    * of |all|² — proportional to the increment, not the corpus.
    * Old–new pairs emit exactly once (old is always on the index side);
    * new–new pairs are restricted to probe.id < index.id. Ids must be
    * globally unique across corpus ∪ delta (the IncrementalNearDup
    * contract). Output: (idCol_a < idCol_b, hamming); eager like
    * [[selfJoin]]. */
  def newPairs(corpus: DataFrame, delta: DataFrame, idCol: String,
      fpCol: String, maxDist: Int, bits: Int = 32, numBands: Int = 0)
      : DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val b = if (numBands > 0) numBands else maxDist + 2
    require(b > maxDist, s"need more bands ($b) than the distance ($maxDist)")
    require(b <= bits, s"more bands ($b) than bits ($bits)")
    val specs = bandSpecs(bits, b)
    def bandsOf(df: DataFrame, isNew: Boolean) = df
      .select(col(idCol).as("id"), col(fpCol).as("f"))
      .select($"id", $"f", explode(expr(specs)).as("bs"))
      .select($"id", $"f", $"bs.band".as("band"), $"bs.bkey".as("bkey"),
        lit(isNew).as("is_new"))
    val index = bandsOf(corpus, isNew = false)
      .union(bandsOf(delta, isNew = true))
      .repartition($"band", $"bkey").persist()
    val probe = bandsOf(delta, isNew = true)
      .repartition($"band", $"bkey").persist()
    val pairs = probe.as("p").join(index.as("i"),
        $"p.band" === $"i.band" && $"p.bkey" === $"i.bkey" &&
          (!$"i.is_new" || $"p.id" < $"i.id"))
      .withColumn("hamming", bit_count(expr("p.f ^ i.f")))
      .filter($"hamming" <= maxDist)
      .select(least($"p.id", $"i.id").as(s"${idCol}_a"),
        greatest($"p.id", $"i.id").as(s"${idCol}_b"), $"hamming")
      .distinct()
    try graft.Hygiene.eagerCut(pairs)
    finally {
      index.unpersist(blocking = false)
      probe.unpersist(blocking = false)
    }
  }

  /** Band-split SQL fragment over fingerprint column `f`: band i covers
    * [i*base, i*base+width_i) with the last band taking the remainder —
    * every bit in exactly one band. Shared with [[HammingStore]], which
    * freezes (bits, numBands) in its meta so probes band exactly as the
    * build did. */
  private[operators] def bandSpecs(bits: Int, b: Int): String = {
    val base = bits / b
    (0 until b).map { i =>
      val width = if (i == b - 1) bits - i * base else base
      val mask = if (width == 64) -1L else (1L << width) - 1L
      s"named_struct('band', $i, 'bkey', shiftright(f, ${i * base}) & ${mask}L)"
    }.mkString("array(", ", ", ")")
  }

  /** The pre-checkpoint shape of [[selfJoin]]: the cached band relation
    * (still persisted — the caller must unpersist) and the verified
    * pair frame whose plan still shows the banded equi-join (the
    * plan-shape spec pins it here; after the lineage cut in [[selfJoin]]
    * the returned frame is just a checkpointed-RDD scan). */
  private[graft] def bandedPairs(fp: DataFrame, idCol: String, fpCol: String,
      maxDist: Int, bits: Int, numBands: Int): (DataFrame, DataFrame) = {
    val s = fp.sparkSession
    import s.implicits._
    val b = if (numBands > 0) numBands else maxDist + 2
    require(b > maxDist, s"need more bands ($b) than the distance ($maxDist)")
    require(b <= bits, s"more bands ($b) than bits ($bits)")
    val specs = bandSpecs(bits, b)
    // compact (4 longs/row) band relation, cached PRE-PARTITIONED on
    // the join key (the q47 round-6 pattern): the fingerprint
    // derivation in `fp`'s lineage runs once into the cache instead of
    // once per join side, and both sides reuse the cache's
    // HashPartitioning(band, bkey) so the self-join plans no exchanges.
    // Eager-cut like q44: the verified pair set is checkpointed and the
    // cache released before returning.
    val bands = fp.select(col(idCol).as("id"), col(fpCol).as("f"))
      .select($"id", $"f", explode(expr(specs)).as("bs"))
      .select($"id", $"f", $"bs.band".as("band"), $"bs.bkey".as("bkey"))
      .repartition($"band", $"bkey").persist()
    val pairs = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey"
          && $"a.id" < $"b.id")
      .withColumn("hamming", bit_count(expr("a.f ^ b.f")))
      .filter($"hamming" <= maxDist)
      .select($"a.id".as(s"${idCol}_a"), $"b.id".as(s"${idCol}_b"), $"hamming")
      .distinct()
    (bands, pairs)
  }
}
