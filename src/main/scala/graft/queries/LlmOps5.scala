package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline operators round 5 (session 3): the retention/selection leg
  * of corpus deduplication, a cross-document repetition signal, and a
  * hyperplane-LSH similarity search — the three pieces that turn the
  * repo's pair/cluster machinery into an end-to-end "which rows survive"
  * pipeline.
  *
  * Portability rule (SURVEY §2.C.0) holds throughout: every oracle-
  * checked value is integer arithmetic or `round(exact-ratio, 6)`.
  */
object LlmOps5 {

  // ---- Q76: greedy near-dup retention (the DROP step of dedup) --------
  // Policy: a document is dropped iff ANY earlier document (smaller
  // doc_id) is a near-duplicate (exact Jaccard >= 0.7 on token sets) —
  // the standard pair-list retention rule in production dedup: it needs
  // only the canonical (doc_a < doc_b) pair set, is deterministic, and
  // is embarrassingly parallel (one anti-join). It deliberately does NOT
  // require the earlier doc to itself survive (that transitive variant
  // is cluster-canonical retention = q57's component labels; this one is
  // a single pass with no iteration).
  // Scale shape: the survivor set comes from LlmOps.greedySurvivors —
  // q36's adaptive dispatch (bitmask or inverted index, never blind
  // all-pairs), but on the bitmask path derived ENTIRELY at the mask-
  // group level (min-doc + neighbor-group-min per group): no doc-pair
  // clique expansion and no pair-level distinct shuffle — the two terms
  // that grow with corpus duplication. Measured at par with the
  // pair-based formulation at sf0.1 (±0.2 s ambient; this fixture's
  // dense duplication makes the 5.1M-row expansion cheap relative to
  // the shared mask pipeline), kept for the scale shape: q76's tail
  // beyond the shared q36 core measures ~0.1 s. The survivor set is
  // O(corpus), so it is NOT broadcast-hinted — the join shuffles on
  // doc_id and AQE demotes it to a broadcast join at runtime when the
  // set turns out small.
  def q76(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables(s, dir, "documents")
    d.join(LlmOps.greedySurvivors(LlmOps.docTokens(s, dir)), Seq("doc_id"))
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }
  val q76Sql: String =
    """WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      |           FROM documents),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM d a JOIN d b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.7)
      |SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
      |ORDER BY doc_id""".stripMargin

  // ---- Q77: duplicated-n-gram fraction (cross-doc repetition) ---------
  // RefinedWeb-style contamination signal: per document, the fraction of
  // its token 8-gram OCCURRENCES whose gram appears in more than one
  // distinct document. Distinct-doc frequency (not raw occurrences) so a
  // gram repeated only within one doc does not count as cross-doc dup —
  // within-doc repetition is q67's signal.
  // Scale shape: the gram explosion is the inverted-index pattern — both
  // the doc-frequency aggregation and the gram join shuffle on the gram
  // key (sparse, high-cardinality), and the second shuffle reuses the
  // first's partitioning. Nothing is quadratic; docs with < 8 tokens are
  // re-attached by a left join (0 grams, fraction 0).
  def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables(s, dir, "documents")
    // sequence(1, n) with n <= 0 generates a DESCENDING [1, 0] in Spark,
    // so the short-doc case must be guarded to an empty array explicitly.
    val grams = d.select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", explode(expr(
        """CASE WHEN size(toks) >= 8
          |THEN transform(sequence(1, size(toks) - 7),
          |               i -> array_join(slice(toks, i, 8), ' '))
          |ELSE array() END""".stripMargin)).as("gram"))
    val docFreq = grams.groupBy($"gram")
      .agg(countDistinct($"doc_id").as("docfreq"))
    // shuffle_hash PINNED (round-16 long-doc audit): docFreq is
    // corpus-scale (it came FROM grams), but under the explode Spark's
    // size estimate collapses and AQE elects to BROADCAST it — at the
    // 2000-doc × 100 KB protocol scale that is a driver collect of the
    // whole gram relation (maxResultSize abort; 113.5 s even with the
    // limit raised) where the hinted shuffle-hash join — the scaladoc's
    // claimed plan, both shuffles on the gram key — runs in 43.1 s.
    // Hashing the grams to 64 bits before the exchange was measured
    // too (65 s, high variance) and rejected: no clear win over the
    // hint, and it trades the exact distinct-doc counts for collision
    // risk. Fixture-scale cost of losing the broadcast: see NOTES_r16.
    val perDoc = grams.join(docFreq.hint("shuffle_hash"), "gram")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"docfreq" > 1, 1L).otherwise(0L)).as("n_dup"))
      .select($"doc_id", $"n_grams",
        round($"n_dup".cast("double") / $"n_grams", 6).as("dup_frac"))
    d.select($"doc_id").join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"dup_frac", lit(0.0)).as("dup_frac"))
      .orderBy($"doc_id")
  }
  val q77Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
      |    i -> array_to_string(toks[i:i+7], ' '))) AS gram FROM t),
      |df AS (
      |  SELECT gram, count(DISTINCT doc_id) AS docfreq FROM g GROUP BY gram),
      |per_doc AS (
      |  SELECT g.doc_id, count(*) AS n_grams,
      |    round(CAST(sum(CASE WHEN df.docfreq > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |      / count(*), 6) AS dup_frac
      |  FROM g JOIN df USING (gram) GROUP BY g.doc_id)
      |SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
      |  coalesce(p.dup_frac, 0.0) AS dup_frac
      |FROM documents d LEFT JOIN per_doc p USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---- Q78: sign-random-projection LSH ANN (hyperplane banding) -------
  // The third similarity-search formulation next to q37 (exact
  // brute-force) and q48 (IVF): each vector gets a `SigBits`-bit
  // signature — bit h is the sign of the dot product with hyperplane h,
  // whose components are pseudo-random ±1 derived from xxhash64(h, j)
  // (deterministic, seedless, engine-portable; no RNG state to ship).
  // Signatures band into `Bands` groups of `SigBits / Bands` bits; a
  // candidate is any vector sharing >= 1 exact band value with the
  // probe. Exact cosine verify + bounded-heap top-k after.
  //
  // Scale shape: signatures are one pass over the scan (codegen'd HOFs,
  // no shuffle); the data side explodes x Bands (constant factor); the
  // probe side is tiny and broadcasts; candidate volume is controlled by
  // band width (wider bands = fewer collisions) — at 100 TB raise
  // SigBits/Bands so each bucket holds ~constant rows. No oracle entry:
  // candidate recall is data-dependent; the spec asserts recall vs q37's
  // exact top-k and full determinism across runs.
  //
  // Band-width tradeoff, measured on the fixture: per-bit collision
  // probability for an angle-θ pair is 1 − θ/π, and the fixture
  // embeddings are near-uniform (top-10 neighbors sit at cos ≈ 0.3,
  // θ ≈ 72° ⇒ p ≈ 0.6) — 4-bit bands gave recall 0.50, so the shipped
  // default is 8 bands × 2 bits (expected ≥1-band-match ≈ 0.97 at
  // θ = 72°). On real embedding corpora (clustered, neighbors at
  // cos ≥ 0.8 ⇒ p ≥ 0.8) the same 16 bits in 4×4 bands prunes ~10×
  // harder at equal recall; both knobs are just these constants.
  private val SigBits = 16
  private val Bands = 8
  private val BandBits = SigBits / Bands

  /** Signature + banded (band_id, band_val) rows for a (vec_id, v)
    * frame. v must be array<double>. `useExpr` swaps the nested-HOF
    * signature for the fused codegen twin
    * ([[graft.functions.SrpSignature]]) — bit-identical by spec. */
  private[queries] def srpBands(vecs: DataFrame,
      useExpr: Boolean = false): DataFrame = {
    import vecs.sparkSession.implicits._
    // bit h = sign of sum_j v[j] * s(h, j), s = +-1 from xxhash64 parity
    val sig =
      if (useExpr) graft.functions.SrpSignature.srpSignature($"v", SigBits)
      else expr(
        s"""aggregate(
           |  transform(sequence(0, ${SigBits - 1}), h ->
           |    IF(aggregate(
           |         zip_with(v, sequence(0, size(v) - 1),
           |           (x, j) -> x * IF(pmod(xxhash64(h * 1000003 + j), 2) = 0, 1.0D, -1.0D)),
           |         0D, (acc, x) -> acc + x) >= 0D, 1, 0)),
           |  0, (acc, b) -> acc * 2 + b)""".stripMargin)
    vecs.withColumn("sig", sig)
      .select($"vec_id", $"v", $"sig",
        explode(expr(s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"named_struct('band', b, 'bval', (sig div shiftleft(1, b * $BandBits)) % ${1 << BandBits}))")).as("bb"))
      .select($"vec_id", $"v", $"bb.band".as("band"), $"bb.bval".as("bval"))
  }

  // ---- Q79: quality-based data selection (top 25% per language) -------
  // The selection step downstream of q41's scoring: keep the best
  // quarter of each language's documents by the exact integer quality
  // score, deterministic tie-break by doc_id. Semantically identical to
  //   row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id)
  //     <= ceil(cnt / 4)
  // but NOT computed that way: a per-language row_number sorts every
  // row of the largest language through one task at 100 TB. Instead the
  // scale-safe exact algorithm:
  //   1. histogram: count per (lang, score) — the score domain is
  //      bounded (0..10000 + 3000 cap term), so the histogram is tiny
  //      regardless of corpus size;
  //   2. per-language running totals over the histogram (window over
  //      ≤ |langs|×|scores| rows, not over documents) → the cutoff
  //      score and how many tie rows at the cutoff are admitted;
  //   3. one broadcast join: score > cutoff keeps the row outright;
  //      score == cutoff ranks ONLY the tie rows (window input is the
  //      cutoff-score slice, a few rows per language).
  // No full-corpus sort, no single-task group: the only per-document
  // work is a map-side score + broadcast-join filter.
  def q79(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persisted: consumed by the histogram AND (twice) by the final
    // filter — without it the corpus is tokenized+scored 3×. The cached
    // projection is 3 narrow columns (no text), ~24 bytes/row; freed
    // before returning via the eager-cut below (the kept quarter is
    // small by definition).
    val scored = Tables(s, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .select($"doc_id", $"lang",
        LlmOps2.qualityScore("toks").as("quality_score"))
      .persist()
    val hist = scored.groupBy($"lang", $"quality_score")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"quality_score".desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum($"n").over(w))
      .withColumn("total", sum($"n").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lang")))
      .withColumn("quota", expr("(total + 3) div 4"))
    // cutoff row: highest score whose running total reaches the quota
    val cutoffs = cum.filter($"cum" >= $"quota")
      .groupBy($"lang")
      .agg(max($"quality_score").as("cutoff"),
        first($"quota").as("quota"))
      .join(cum.select($"lang", $"quality_score".as("cutoff"),
        ($"cum" - $"n").as("cum_above")), Seq("lang", "cutoff"))
      .select($"lang", $"cutoff", ($"quota" - $"cum_above").as("admit"))
    val withCut = scored.join(broadcast(cutoffs), "lang")
    val above = withCut.filter($"quality_score" > $"cutoff")
      .select($"doc_id", $"lang", $"quality_score")
    val atCutoff = withCut.filter($"quality_score" === $"cutoff")
    val admitted = atCutoff.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"doc_id")))
      .filter($"rn" <= $"admit")
      .select($"doc_id", $"lang", $"quality_score")
    // finally: a failed checkpoint job must not leak the persist
    try graft.Hygiene.eagerCut(
      above.unionAll(admitted).orderBy($"doc_id"))
    finally scored.unpersist()
  }
  val q79Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |s AS (
      |  SELECT doc_id, lang,
      |    CAST((4000 * len(list_distinct(toks))
      |        + 3000 * len(list_filter(toks, t -> t IN ('the','a','data','value','table'))))
      |        // len(toks) + 30 * least(len(toks), 100) AS BIGINT) AS quality_score
      |  FROM d),
      |r AS (
      |  SELECT doc_id, lang, quality_score,
      |    row_number() OVER (PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM s)
      |SELECT doc_id, lang, quality_score FROM r
      |WHERE rn <= (cnt + 3) // 4 ORDER BY doc_id""".stripMargin

  // ---- Q84: deterministic per-group sample (N docs per source) --------
  // "Take N examples per source" without RNG: rank docs inside each
  // source by (portable content hash, doc_id) and keep the first 20 —
  // reproducible on any engine, stable under repartitioning, and
  // streaming-friendly (membership is a pure row property plus a
  // bounded rank). The rank runs through TopKPerGroup's partial
  // bounded-heap pass, so only 20 rows per (partition, source) reach
  // the exchange — a row_number window would shuffle every doc into
  // |sources| partitions first.
  def q84(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // null-text docs hash to NULL; coalesce past any real hash value
    // (< 1e9+7) so they rank LAST in every group (q63's convention —
    // TopKPerGroup's Order has no null-placement knob, and the output
    // doesn't carry h, so the coalesce is invisible)
    val ranked = Tables(s, dir, "documents")
      .select($"doc_id", $"source", $"lang", $"n_chars",
        coalesce(graft.functions.RollingHash.rollingHash($"text", 64),
          lit(Long.MaxValue)).as("h"))
    graft.plans.GraftOps.topKPerGroup(ranked, 20, Seq("source"),
        Seq(graft.plans.GraftOps.Order("h"),
          graft.plans.GraftOps.Order("doc_id")), rankName = "rk")
      .select($"source", $"rk", $"doc_id", $"lang", $"n_chars")
      .orderBy($"source", $"rk")
  }
  val q84Sql: String =
    """WITH h AS (
      |  SELECT doc_id, source, lang, n_chars,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, least(len(text), 64)),
      |                       i -> CAST(ascii(text[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
      |  FROM documents),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY source
      |    ORDER BY coalesce(h, 9223372036854775807), doc_id) AS rk
      |  FROM h)
      |SELECT source, rk, doc_id, lang, n_chars FROM r
      |WHERE rk <= 20 ORDER BY source, rk""".stripMargin

  def q78(s: SparkSession, dir: String): DataFrame = q78Impl(s, dir, false)

  /** q78 twin with the signature computed by the fused codegen
    * Expression instead of the nested-HOF chain (x78_srp_expr). */
  def q78Expr(s: SparkSession, dir: String): DataFrame = q78Impl(s, dir, true)

  private def q78Impl(s: SparkSession, dir: String,
      useExpr: Boolean): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val banded = srpBands(emb, useExpr)
    val probes = banded.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"band", $"bval")
    val cands = banded.join(broadcast(probes),
        Seq("band", "bval"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", $"qv", $"v")
      .dropDuplicates("query_id", "vec_id")
    val scored = cands.select($"query_id", $"vec_id",
      round(LlmOps.cosineCols($"qv", $"v"), 6).as("score"))
    LlmOps.topKByScore(scored, 10)
  }

  // ---- Q95: fuzzy key join (edit distance ≤ 1) -----------------------
  // Entity-resolution primitive: all key pairs within Levenshtein
  // distance 1, WITHOUT the O(n²) cross join. Deletion-neighborhood
  // banding (the SymSpell dictionary trick): each key emits itself plus
  // its |key| single-character deletions; two keys are within distance
  // 1 iff their neighborhoods intersect — substitution ⇒ deleting the
  // differing position in both yields the same string; insert/delete ⇒
  // the longer's deletion equals the shorter itself. So the equi-join
  // on the variant is recall-complete and the exact levenshtein check
  // only discards (same candidate→verify shape as q47/q52). Candidates
  // are bounded per variant bucket (keys sharing a deletion), never by
  // corpus size; the explode factor is |key|+1 — at 100 TB of keys this
  // beats the quadratic by the corpus/bucket ratio, and generalizes to
  // distance d with d-deletion neighborhoods.
  // The measured plan decisions (map-side array_distinct before the
  // explode, shuffle_hash over the planner's broadcast — 4.6 s vs
  // 1.6 s here — verify before the pair-level distinct) live in the
  // generalized operator, [[graft.operators.FuzzyJoin]], which also
  // serves d ≥ 2 (spec'd on a synthetic text-key corpus — THIS
  // fixture's sequential numeric keys are pathologically dense at d=2:
  // 204k pairs from 1.5k names at sf0.01).
  def q95(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = Tables(s, dir, "customer").select($"c_name".as("name"))
    graft.operators.FuzzyJoin.selfJoin(names, "name", maxDist = 1)
      .select($"name_a", $"name_b")
      .orderBy($"name_a", $"name_b")
  }
  val q95Sql: String =
    """SELECT a.c_name AS name_a, b.c_name AS name_b
      |FROM customer a JOIN customer b ON a.c_name < b.c_name
      |WHERE levenshtein(a.c_name, b.c_name) = 1
      |ORDER BY name_a, name_b""".stripMargin
}
