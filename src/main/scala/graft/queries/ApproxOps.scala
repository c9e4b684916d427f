package graft.queries

import graft.Tables
import graft.functions.CosineSimilarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate scale-path variants of the exact similarity operators
  * (SURVEY.md §2.C.10 "scale path"). These are the plans you would run
  * at 100 TB, where the exact all-pairs formulations (Q36/Q45) and the
  * brute-force top-k (Q37) stop being feasible:
  *
  *  - Q47: banded MinHash LSH for Jaccard near-dup — b=16 bands of r=3
  *    minhashes; only pairs colliding on a whole band become candidates
  *    (P(candidate) = 1-(1-s^3)^16 ≈ 0.999 at s=0.7), then candidates are
  *    verified EXACTLY, so false band collisions cost time, never
  *    correctness. All hashes are portable integer arithmetic with fixed
  *    constants — fully deterministic, no RNG state.
  *    (MLlib's MinHashLSH.approxSimilarityJoin was measured 200×
  *    slower here: with a 31-token vocabulary its per-table OR-join
  *    degenerates into a handful of giant buckets.)
  *  - Q48: IVF-style partitioned ANN — vectors are assigned to the
  *    nearest of C coarse centroids (one broadcast join), queries probe
  *    only `nprobe` cells; scoring volume drops by ~C/nprobe.
  *
  * Both are verified by bounded recall against their exact twins in
  * ApproxOpsSpec (SURVEY rule §2.C.0.6 — approximate operators are
  * never hash-matched).
  */
object ApproxOps {

  private val P = 2147483647L // Mersenne prime 2^31-1
  private val NumHashes = 48
  private val BandRows = 3 // → 16 bands; P(candidate|s=0.7) ≈ 0.999

  /** Band shape for a requested similarity threshold, at the fixed
    * NumHashes=48 budget: the LARGEST rows-per-band r (dividing 48)
    * whose theoretical candidate probability at s = threshold,
    * `1 − (1 − s^r)^(48/r)`, stays ≥ 0.98 — i.e. the most selective
    * banding that still meets the recall design point. At the default
    * 0.7 this derives exactly the measured 16-band × 3-row scheme; at
    * e.g. 0.4 it derives 24 × 2 (the 16 × 3 scheme's candidate recall
    * at s=0.4 would be ~0.65 — the silent-recall-drop ADVICE r4 flagged). */
  private[graft] def bandRowsFor(threshold: Double): Int = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"similarity threshold must be in (0, 1]: $threshold")
    val divisors = Seq(16, 12, 8, 6, 4, 3, 2, 1) // descending r, each divides 48
    divisors.find { r =>
      1.0 - math.pow(1.0 - math.pow(threshold, r), NumHashes.toDouble / r) >= 0.98
    }.getOrElse(1)
  }

  /** MinHash band signatures `(doc_id, band, sig)` over a
    * `(doc_id, toks)` frame — the LSH candidate key: two docs are a
    * candidate pair iff they share a `(band, sig)` value. Extracted
    * from [[q47]] so specs can count candidates with the EXACT
    * production signature computation (ApproxOpsSpec's sparse-corpus
    * case asserts the prune actually prunes when density allows). */
  private[graft] def bandSignatures(docsWithToks: DataFrame,
      carryCols: Seq[String] = Nil, bandRows: Int = BandRows): DataFrame = {
    import docsWithToks.sparkSession.implicits._
    val carry = carryCols.map(col)
    // fused codegen Expression (functions.MinHashBands): one two-level
    // loop per row inside whole-stage codegen, bit-equal to the HOF
    // chain below (MinHashBandsSpec) — the HOF plumbing allocated 48
    // intermediate arrays per row through interpreted lambdas.
    docsWithToks
      .withColumn("sigs", graft.functions.MinHashBands
        .minhashBands($"toks", NumHashes, bandRows))
      .select(($"doc_id" +: carry) :+ posexplode($"sigs"): _*)
      .select($"doc_id" +: $"pos".as("band") +: $"col".as("sig")
        +: carry: _*)
  }

  /** The declarative HOF reference for [[bandSignatures]] — kept as
    * the readable specification of the signature scheme and as the
    * equality oracle for the fused Expression. Token hash = builtin
    * `xxhash64(t)` (one per token, reused by all 48 lanes — replaced a
    * per-character substring+ascii fold, 5.8 s → 1.1 s at sf0.1;
    * engine-internal hash, the verify stays exact); lane i =
    * min over tokens of `pmod(xxhash64(th, i), P)`; 16 base-31
    * polynomial band signatures. */
  private[graft] def bandSignaturesHof(docsWithToks: DataFrame,
      carryCols: Seq[String] = Nil, bandRows: Int = BandRows): DataFrame = {
    import docsWithToks.sparkSession.implicits._
    val carry = carryCols.map(col)
    docsWithToks
      .withColumn("ths", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("mhs", expr(
        s"""transform(sequence(0, ${NumHashes - 1}),
            i -> array_min(transform(ths, h -> pmod(xxhash64(h, i), $P))))"""))
      // polynomial band signature; a band collision is only a CANDIDATE —
      // verification in q47 is exact, so signature collisions are harmless
      .select($"doc_id" +: explode(expr(
        s"""transform(sequence(0, ${NumHashes / bandRows - 1}),
            b -> named_struct('band', b, 'sig',
              aggregate(sequence(0, ${bandRows - 1}), 0L,
                (acc, r) -> acc + mhs[b * $bandRows + r]
                  * CAST(pow(31, r) AS BIGINT) % $P) % $P))""")).as("bs")
        +: carry: _*)
      .select($"doc_id" +: $"bs.band".as("band") +: $"bs.sig".as("sig")
        +: carry: _*)
  }

  /** Q47 ≈: near-dup pairs via the full 100 TB pipeline shape:
    * exact-dedupe token sets first (distinct-set representatives), run
    * banded MinHash over representatives only, verify candidates
    * exactly, then expand back to document pairs (identical-set groups
    * contribute their jaccard=1 pairs directly). On this corpus the
    * dedupe step alone removes ~20% of the LSH input; at real scale it
    * is the difference between hashing every copy of a boilerplate page
    * and hashing it once. */
  def q47(s: SparkSession, dir: String): DataFrame =
    minhashNearDupPairs(LlmOps.docTokens(s, dir)) // shared token-set definition

  /** `(doc_id, band, sig, mask)` rows for the STREAMING near-dup path
    * (E09, [[graft.streaming.StreamingNearDup]]): the same band
    * signatures and exact-verify bitmasks the batch pipeline uses,
    * exploded per band. Bitmask-vocabulary corpora only (the
    * streaming state holds one int64 per member). */
  private[graft] def docSigs(s: SparkSession, dir: String): DataFrame =
    docSigsFor(LlmOps.docTokens(s, dir))

  /** [[docSigs]] over an arbitrary `(doc_id, toks)` frame — the
    * streaming adversarial pass feeds degenerate corpora through the
    * same signature path the table-keyed twin uses. Empty token sets
    * (null/empty text) produce NO signature rows (MinHashBands is NULL
    * on an empty array), so such docs never enter a bucket — the batch
    * empty-set contract, preserved structurally in the stream. */
  private[graft] def docSigsFor(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    val masks = LlmOps
      .tokenBitmasks(d.select($"doc_id", $"toks"))
      .getOrElse(throw new IllegalStateException(
        "streaming near-dup needs the int64 bitmask vocabulary regime"))
    bandSignatures(d.join(masks, "doc_id"), carryCols = Seq("mask"))
  }

  /** The frame-shaped core of [[q47]] — MinHash-LSH near-dup pairs over
    * any `(doc_id, toks)` frame (facade: `Graft.minHashNearDupPairs`).
    * Same plan as the driver-verified query: dedupe → map-side
    * signatures over representatives → banded self-join → broadcast
    * exact verify → one post-verify distinct shuffle → expand.
    * The band shape is DERIVED from `threshold` ([[bandRowsFor]]) so
    * the candidate-recall design point (≥ 0.98 theoretical) moves with
    * the request instead of silently degrading below the 0.7 tuning. */
  private[graft] def minhashNearDupPairs(docsWithToks: DataFrame,
      threshold: Double = 0.7, sorted: Boolean = true): DataFrame = {
    val s = docsWithToks.sparkSession
    import s.implicits._
    val bandRows = bandRowsFor(threshold)
    val d = docsWithToks.select($"doc_id", $"toks")
    // group identical token sets; one representative per distinct set.
    // All three within-call persists (masks, groups, bands) are freed
    // before returning: the result is eager-cut (q44's pattern) so the
    // caches never outlive the call — they cannot be deduped across
    // invocations anyway (lambda-bearing plans don't canonicalize
    // equal; see the bands note below).
    val masksOpt = LlmOps.tokenBitmasks(d.select($"doc_id", $"toks"))
      .map(_.persist())
    // empty-set docs pair with NOTHING (the exact twin's contract —
    // jaccard(∅,·) is 0 or 0/0-undefined and q36 never emits such
    // pairs), so they are excluded from grouping entirely: without the
    // filter the intra-group stage below would declare all empty docs
    // mutual jaccard-1 duplicates, a pair set the exact path provably
    // never produces
    val masks = masksOpt match {
      case Some(m) => m.filter($"mask" =!= 0L)
      // generic fallback: the sorted token array is the set identity
      case None => d.filter(size($"toks") > 0)
        .select($"doc_id", sort_array($"toks").cast("string").as("mask"))
    }
    val groups = masks.groupBy($"mask")
      .agg(min($"doc_id").as("rep"), sort_array(collect_list($"doc_id")).as("ids"))
      .persist()

    // minhash only the representatives — entirely MAP-SIDE via nested
    // HOFs: per doc, hash each token once (builtin xxhash64 on the
    // string — see bandSignatures), then mh_i = min over tokens of
    // pmod(xxhash64(th, i), P), then the 16 polynomial band signatures —
    // all inside one projection over the (rep, toks) rows. The round-1/2
    // shape (explode tokens ×48 hash indices → groupBy(doc_id, i) min →
    // groupBy(doc_id, band) sum) shuffled reps×48 rows twice and needed
    // a distinct+broadcast token-hash dictionary; this computes the
    // identical values with zero shuffles and no dictionary (measured
    // 13.8 s → 10.2 s for the whole query at sf0.1).
    // xxhash64 mixing is still the hash family: linear congruential
    // families are NOT min-wise independent enough on dense sets
    // (measured recall plateaus: 0.85 with small multipliers, 0.91 with
    // large). Engine-only operator → an engine-specific hash is fine
    // here (the verification step stays portable-exact).
    // PERSISTED like masks/groups above: the band relation is tiny
    // (reps × 16 rows) but its lineage carries the whole signature
    // computation, and the self-join below would otherwise compute it
    // on BOTH sides — lambda-bearing HOF plans don't canonicalize
    // equal, so ReuseExchange (which deduped the round-1 explode-based
    // formulation) cannot fire on this shape.
    // REPARTITIONED by the join key BEFORE the persist: both sides of
    // the banded self-join then read the cache's HashPartitioning(band,
    // sig) and the join plans ZERO exchanges (only sorts) — the
    // partition-local banding NOTES r5 proposed. Measured at sf0.1:
    // q47 median 10.3 s → 6.0 s (steady-state runs 5.7–7.0).
    val repToks = groups.select($"rep".as("doc_id")).join(d, "doc_id")
    // on the bitmask path, CARRY the 8-byte mask inside the band
    // relation: the self-join below then has both sides' masks in-row
    // and the exact verify is a pure map-side filter with ZERO joins —
    // measured 7.3 s → (verify folded into the join stage) at sf0.1.
    // The generic fallback's set identity is the whole token array —
    // too wide to carry ×16 bands — so it keeps the join-based verify.
    val bands = (masksOpt match {
      case Some(m) => bandSignatures(repToks.join(m, "doc_id"),
        carryCols = Seq("mask"), bandRows = bandRows)
      case None => bandSignatures(repToks, bandRows = bandRows)
    }).repartition($"band", $"sig").persist()

    // NOTE deliberately NO distinct here: a pair colliding in several
    // bands is verified several times (26.4M raw candidates vs 6.1M
    // distinct pairs at sf0.1), but the verify step is map-side integer
    // ops — duplicates cost a few cycles each, while a pre-verify
    // pair-level distinct is an extra full shuffle of the raw candidate
    // stream (measured: 18 s → 21–24 s when tried). The post-verify
    // distinct below is the one unavoidable shuffle, placed after the
    // map-side filter.
    val verified = (masksOpt match {
      case Some(_) =>
        bands.as("x").join(bands.as("y"),
            $"x.band" === $"y.band" && $"x.sig" === $"y.sig"
              && $"x.doc_id" < $"y.doc_id")
          .select($"x.doc_id".as("ra"), $"y.doc_id".as("rb"),
            $"x.mask".as("ma"), $"y.mask".as("mb"))
          .withColumn("inter", bit_count($"ma".bitwiseAND($"mb")).cast("double"))
          .withColumn("jac",
            $"inter" / (bit_count($"ma") + bit_count($"mb") - $"inter"))
      case None =>
        bands.as("x").join(bands.as("y"),
            $"x.band" === $"y.band" && $"x.sig" === $"y.sig"
              && $"x.doc_id" < $"y.doc_id")
          .select($"x.doc_id".as("ra"), $"y.doc_id".as("rb"))
          .join(d.select($"doc_id".as("ra"), $"toks".as("ta")), "ra")
          .join(d.select($"doc_id".as("rb"), $"toks".as("tb")), "rb")
          .withColumn("inter", size(array_intersect($"ta", $"tb")).cast("double"))
          .withColumn("jac", $"inter" / (size($"ta") + size($"tb") - $"inter"))
    }).filter($"jac" >= threshold).select($"ra", $"rb", $"jac").distinct()

    // expand representatives back to all member docs
    val crossGroup = verified
      .join(groups.select($"rep".as("ra"), $"ids".as("ia")), "ra")
      .join(groups.select($"rep".as("rb"), $"ids".as("ib")), "rb")
      .select(explode($"ia").as("a"), $"ib", $"jac")
      .select($"a", explode($"ib").as("b"), $"jac")
      .select(least($"a", $"b").as("doc_a"), greatest($"a", $"b").as("doc_b"),
        round($"jac", 6).as("jaccard"))
    // identical-set groups: every intra-group pair is an exact dup (jac=1)
    val intraGroup = groups.filter(size($"ids") > 1)
      .select(explode($"ids").as("a"), $"ids")
      .select($"a", explode($"ids").as("b"))
      .filter($"a" < $"b")
      .select($"a".as("doc_a"), $"b".as("doc_b"), lit(1.0).as("jaccard"))

    // eager-cut: materialize the pair set, then free every within-call
    // cache (the checkpointed result carries no lineage back to them);
    // the finally keeps a failed checkpoint job from leaking the caches.
    // `sorted=false` (pipeline composition — e.g. feeding connected
    // components, which reshuffles immediately) skips the global sort
    // of the multi-million-row pair set; the driver-verified q47
    // binding keeps the sorted contract
    val all = crossGroup.unionAll(intraGroup)
    try graft.Hygiene.eagerCut(
      if (sorted) all.orderBy($"doc_a", $"doc_b") else all)
    finally {
      bands.unpersist()
      groups.unpersist()
      masksOpt.foreach(_.unpersist())
    }
  }

  /** x105 ≈: the LSH twin of the incremental exact near-dup
    * ([[graft.operators.IncrementalNearDup]]) — every banded-MinHash
    * candidate pair with at least one end in `delta`, verified EXACTLY,
    * i.e. q47's banding probed by the increment only. This is the
    * 100 TB shape of per-increment dedup: corpus band signatures are a
    * pure function of each doc — compute once, store alongside the
    * corpus — the delta's signatures probe them, and candidate volume
    * per (band, sig) bucket is |bucket| · |bucket ∩ delta| —
    * proportional to the increment, never the corpus×corpus |bucket|²
    * the full sweep pays. No rep contraction here
    * ([[minhashNearDupPairs]]'s dedupe-first step spans corpus∪delta
    * and would force re-grouping the corpus every increment — the
    * opposite of incremental); identical sets simply collide in every
    * band and verify at jaccard 1.
    *
    * THIS inline variant recomputes the corpus signatures because both
    * frames are in hand for a single call (the hash-gated fixture
    * shape). The production daily-increment surface is
    * [[graft.operators.NearDupSignatureStore]]: `build` writes the band
    * signatures cell-partitioned to parquet once, `probe` joins an
    * increment against the STORE (partition-pruned scan, zero
    * corpus-side signature jobs), `append` adds the increment's
    * signatures back — so successive increments never rescan or
    * re-shuffle the corpus. Its spec proves probe == this operator's
    * pair set.
    *
    * Orientation mirrors the exact operator: old–new candidates match
    * once (old on the index side), new–new candidates keep only the
    * id-ordered row, and the post-verify distinct collapses multi-band
    * collisions. Recall vs the exact delta pair set is the banding's
    * (≥ 0.98 theoretical at the derived shape; spec'd ≥ 0.95 on the
    * fixture corpus). */
  private[graft] def minhashNearDupPairsDelta(corpus: DataFrame,
      delta: DataFrame, threshold: Double = 0.7): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val bandRows = bandRowsFor(threshold)
    val all = corpus.select($"doc_id", $"toks", lit(false).as("is_new"))
      .unionByName(delta.select($"doc_id", $"toks", lit(true).as("is_new")))
      .select($"doc_id", $"toks", $"is_new")
    val masksOpt = LlmOps.tokenBitmasks(all.select($"doc_id", $"toks"))
      .map(_.persist())
    // one band relation, cached pre-partitioned on the join key (the
    // q47/q52 pattern): the probe side below is a FILTER of the same
    // cache, so both join inputs read the cache's HashPartitioning and
    // the join plans no exchanges. Masks ride along where the
    // vocabulary allows a map-side exact verify.
    val bands = (masksOpt match {
      case Some(m) => bandSignatures(all.join(m, "doc_id"),
        carryCols = Seq("mask", "is_new"), bandRows = bandRows)
      case None => bandSignatures(all,
        carryCols = Seq("is_new"), bandRows = bandRows)
    }).repartition($"band", $"sig").persist()
    val probe = bands.filter($"is_new")
    val candidates = deltaBandJoin(bands, probe)
    val verified = (masksOpt match {
      case Some(_) =>
        candidates
          .select($"x.doc_id".as("ra"), $"y.doc_id".as("rb"),
            $"x.mask".as("ma"), $"y.mask".as("mb"))
          .withColumn("inter", bit_count($"ma".bitwiseAND($"mb")).cast("double"))
          .withColumn("jac",
            $"inter" / (bit_count($"ma") + bit_count($"mb") - $"inter"))
      case None =>
        val toks = all.select($"doc_id", $"toks")
        candidates
          .select($"x.doc_id".as("ra"), $"y.doc_id".as("rb"))
          .join(toks.select($"doc_id".as("ra"), $"toks".as("ta")), "ra")
          .join(toks.select($"doc_id".as("rb"), $"toks".as("tb")), "rb")
          .withColumn("inter", size(array_intersect($"ta", $"tb")).cast("double"))
          .withColumn("jac", $"inter" / (size($"ta") + size($"tb") - $"inter"))
    }).filter($"jac" >= threshold)
      .select(least($"ra", $"rb").as("doc_a"),
        greatest($"ra", $"rb").as("doc_b"),
        round($"jac", 6).as("jaccard"))
      .distinct()
      .orderBy($"doc_a", $"doc_b")
    try graft.Hygiene.eagerCut(verified)
    finally {
      bands.unpersist()
      masksOpt.foreach(_.unpersist())
    }
  }

  /** THE delta-probed candidate join of the incremental LSH path —
    * the one copy of the orientation rule shared by
    * [[minhashNearDupPairsDelta]] and the scale-pin spec, so the pinned
    * candidate volume is asserted on the production join shape, not a
    * reconstruction. `bands` is the full (corpus ∪ delta) band relation
    * with an `is_new` flag; `probe` is its delta-side filter. Per
    * (band, sig) bucket the join emits |bucket| · |bucket ∩ delta| rows
    * minus self-pairs and the id-disordered new–new half — proportional
    * to the increment, never |bucket|². */
  private[graft] def deltaBandJoin(bands: DataFrame,
      probe: DataFrame): DataFrame = {
    import bands.sparkSession.implicits._
    bands.as("x").join(probe.as("y"),
      $"x.band" === $"y.band" && $"x.sig" === $"y.sig" &&
        $"x.doc_id" =!= $"y.doc_id" &&
        (!$"x.is_new" || $"x.doc_id" < $"y.doc_id"))
  }

  /** The pre-verify candidate pairs of [[minhashNearDupPairsDelta]],
    * exposed for the scale-pin spec (the x105 analogue of
    * `IncrementalNearDup.candidateIncidences`): same signatures, same
    * [[deltaBandJoin]], no verify — so a spec can pin the join's row
    * count to the per-bucket |bucket| · |bucket ∩ delta| bound on a
    * hot-bucket fixture. */
  private[graft] def deltaCandidates(corpus: DataFrame, delta: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val all = corpus.select($"doc_id", $"toks", lit(false).as("is_new"))
      .unionByName(delta.select($"doc_id", $"toks", lit(true).as("is_new")))
    val bands = bandSignatures(all, carryCols = Seq("is_new"),
      bandRows = bandRowsFor(threshold))
    deltaBandJoin(bands, bands.filter($"is_new"))
      .select($"x.doc_id".as("ra"), $"y.doc_id".as("rb"))
  }

  /** x105's driver binding: same corpus/delta split as q105 (trigram
    * sets, delta = doc_id % 5 == 0) at its 0.2 threshold — the derived
    * banding widens to keep the candidate-recall design point
    * ([[bandRowsFor]]). No oracle by SURVEY rule §2.C.0.6; bounded
    * recall vs the exact q105 in ApproxOpsSpec. */
  def x105(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = LlmOps2.triSets(s, dir).select($"doc_id", $"tris".as("toks"))
      .persist()
    try minhashNearDupPairsDelta(
      d.filter($"doc_id" % 5 =!= 0), d.filter($"doc_id" % 5 === 0), 0.2)
    finally d.unpersist(blocking = false)
  }

  /** Q48 ≈: IVF top-k ANN. Coarse centroids come from the deterministic
    * k-means quantizer ([[graft.operators.KMeans]]: farthest-first
    * seeding and Lloyd iterations over a config-bounded, deterministic
    * pseudo-shuffled sample, trained driver-side); every vector joins
    * its nearest centroid, queries probe the `nprobe` nearest cells
    * only. */
  def q48(s: SparkSession, dir: String, k: Int = 10, c: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import s.implicits._
    import graft.plans.GraftOps
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
      // un-indexable vectors (null / NaN / zero-norm) never rank — and
      // a null embedding NPEs the k-means sampler (r9 contract)
      .filter(LlmOps.wellFormedVec($"v"))
    val cents = graft.operators.KMeans.fit(emb, c)
    // assign every vector to its nearest centroid: broadcast join +
    // bounded-heap argmax (k=1). The partial pass collapses the C
    // candidate rows per vector to 1 before any exchange — a row_number
    // window here would shuffle n×C rows to sort each C-row group.
    val assigned = GraftOps.topKPerGroup(
        emb.join(broadcast(cents))
          .select($"vec_id", $"v", $"cent_id",
            CosineSimilarity.cosineSim($"v", $"cv").as("sim")),
        1, Seq("vec_id"),
        Seq(GraftOps.Order("sim", desc = true), GraftOps.Order("cent_id")))
      .select($"vec_id", $"v", $"cent_id")
    // queries probe their nprobe nearest cells (|queries|×C rows — tiny)
    val probes = GraftOps.topKPerGroup(
        emb.filter($"vec_id".isin(0, 1, 2))
          .select($"vec_id".as("query_id"), $"v".as("qv"))
          .join(broadcast(cents))
          .select($"query_id", $"qv", $"cent_id",
            CosineSimilarity.cosineSim($"qv", $"cv").as("sim")),
        nprobe, Seq("query_id"),
        Seq(GraftOps.Order("sim", desc = true), GraftOps.Order("cent_id")))
      .select($"query_id", $"qv", $"cent_id")
    // score only vectors in probed cells; final top-k through the same
    // partial-heap operator (only k×|queries| rows per partition shuffle).
    // probes is |queries|×nprobe rows but carries no stats (topK output),
    // so without the hint the planner sort-merge-joins on cent_id — a
    // shuffle of every vector into ≤C partitions
    val scored = broadcast(probes).join(assigned, "cent_id")
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        round(CosineSimilarity.cosineSim($"qv", $"v"), 6).as("score"))
    LlmOps.topKByScore(scored, k)
  }
}
