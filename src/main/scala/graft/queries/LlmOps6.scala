package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline operators round 5: the corpus-assembly leg of a training
  * run — quality-weighted subsampling, retrieval scoring, and source
  * mixture balancing. Each is RNG-free (the engine's portable rolling
  * hash is the randomness source, q43's formula) so membership is
  * deterministic, reproducible across engines, and oracle-checkable —
  * the property an auditable data pipeline needs from its sampling
  * stages (q84 pins the same invariance for hash-split sampling).
  * Each query is a thin binding of a frame-shaped core the facade
  * exposes (`Graft.weightedSample` / `bm25Score` / `mixtureSample`).
  *
  * Portability rule (SURVEY §2.C.0) holds: decisions are exact
  * integer/decimal arithmetic; the only float is the BM25 score,
  * `round(..., 6)` like q39's TF-IDF.
  */
object LlmOps6 {

  /** q43's portable content hash as a SQL fragment over `col` (base-31
    * fold over the first 64 chars, mod 1e9+7) — the shared RNG-free
    * uniform every sampler here draws from. */
  private def rhSql(col: String) =
    s"""aggregate(
       |  transform(sequence(1, least(length($col), 64)),
       |            i -> ascii(substring($col, i, 1))),
       |  0L, (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  // ---- Q101: weighted Bernoulli subsample (quality-weighted keep) -----
  // P(keep doc) = f · w · N / Σw  with f = 1/5 and w = n_chars — the
  // standard quality-weighted corpus thinning: long (informative) docs
  // keep proportionally more mass, expected kept fraction is f.
  def q101(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    weightedSample(
        Tables(s, dir, "documents")
          .select($"doc_id", $"source", $"n_chars", $"text"),
        "text", "n_chars")
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Frame-shaped core of [[q101]] (facade: `Graft.weightedSample`):
    * keep each row with probability `(fNum/fDen) · w · N / Σw`, decided
    * by the portable rolling hash of `textCol` — deterministic weighted
    * Bernoulli thinning, no RNG state, membership a pure function of
    * content. Rows whose implied probability exceeds 1 are always kept.
    *
    * Decision: `rh·Σw·fDen < P·w·N·fNum` in DECIMAL arithmetic — EXACT
    * (int64 would overflow once Σw passes ~9e9), bit-identical in any
    * engine. Explicit operand widths keep every product under both
    * engines' 38-digit cap; the bounds they encode (w < 1e10, Σw < 1e18,
    * N < 1e12, fNum/fDen < 100) hold far past 100 TB of documents —
    * w's width is 10 digits, not 6, so a book-length per-doc weight
    * (≥ 1e6) stays in range instead of casting to NULL and silently
    * dropping the row.
    *
    * Scale shape: the (Σw, N) scalar aggregate broadcasts, then the
    * keep decision is a pure map-side filter — one pass over the
    * corpus, no shuffle of the data itself. */
  private[graft] def weightedSample(df: DataFrame, textCol: String,
      weightCol: String, fNum: Int = 1, fDen: Int = 5): DataFrame = {
    // the decision arithmetic casts fNum/fDen to DECIMAL(2,0) and the
    // weight to DECIMAL(10,0): out-of-range literals would cast to NULL
    // (silently empty output) or throw under ANSI, so the bounds the
    // widths encode are enforced here. Weights must be integral
    // (fractional weights round at the cast — express 1% as
    // fNum=1/fDen=100… which is why fDen stops at 99: use fNum=1,
    // fDen=50 + halved weights, or scale weights up instead).
    require(fNum >= 1 && fDen >= 1, s"fNum/fDen must be >= 1: $fNum/$fDen")
    require(fNum <= 99 && fDen <= 99,
      s"fNum/fDen must fit DECIMAL(2,0), i.e. <= 99: $fNum/$fDen " +
        "(scale the weights instead for finer fractions)")
    val tot = df.agg(sum(col(weightCol)).as("__sumw"),
      count(lit(1)).as("__n"))
    df.withColumn("__rh", expr(rhSql(textCol)))
      .crossJoin(broadcast(tot))
      .filter(expr(
        s"""CAST(__rh AS DECIMAL(10,0)) * CAST(__sumw AS DECIMAL(18,0))
           |    * CAST($fDen AS DECIMAL(2,0))
           |  < CAST(1000000007 AS DECIMAL(10,0))
           |    * CAST($weightCol AS DECIMAL(10,0))
           |    * CAST(__n AS DECIMAL(12,0)) * CAST($fNum AS DECIMAL(2,0))"""
          .stripMargin))
      .drop("__rh", "__sumw", "__n")
  }
  val q101Sql: String =
    s"""WITH d AS (SELECT doc_id, source, n_chars,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, least(len(text), 64)),
       |                     i -> CAST(ascii(text[i]) AS BIGINT))),
       |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rh
       |  FROM documents),
       |tot AS (SELECT SUM(n_chars) AS sumw, COUNT(*) AS n FROM documents)
       |SELECT doc_id, source, n_chars FROM d CROSS JOIN tot
       |WHERE CAST(rh AS DECIMAL(10,0)) * CAST(sumw AS DECIMAL(18,0))
       |      * CAST(5 AS DECIMAL(2,0))
       |    < CAST(1000000007 AS DECIMAL(10,0))
       |      * CAST(n_chars AS DECIMAL(10,0)) * CAST(n AS DECIMAL(12,0))
       |      * CAST(1 AS DECIMAL(2,0))
       |ORDER BY doc_id""".stripMargin

  // ---- Q102: BM25 retrieval scoring (decontamination / search) --------
  // Okapi BM25 (k1 = 1.2, b = 0.75) of every document against a pinned
  // query term set, top-20 — the scoring half of retrieval-based
  // decontamination (x68 does membership; this ranks).
  def q102(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import s.implicits._
    bm25Score(Tables(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", Seq("spark", "query", "vector"))
      .orderBy($"bm25".desc, $"doc_id")
      .limit(k)
  }

  /** Frame-shaped core of [[q102]] (facade: `Graft.bm25Score`): Okapi
    * BM25 of every document in `docs` against `terms`. Document length
    * is RAW token occurrences (not the distinct sets the Jaccard family
    * uses); idf = ln(1 + (N − df + ½)/(df + ½)) — the non-negative
    * variant. Float enters only at the final `round(score, 6)`, q39's
    * discipline. Output: (idCol, bm25, n_terms_hit), one row per doc
    * containing ≥ 1 query term.
    *
    * Scale shape: the term explode is filtered to the query terms
    * BEFORE the tf aggregate, so only matching occurrences shuffle;
    * df and the (N, Σdl) stats are scalar-sized broadcasts. */
  private[graft] def bm25Score(docs: DataFrame, idCol: String,
      textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val d = docs.select(col(idCol),
      size(split(col(textCol), " ")).as("dl"),
      split(col(textCol), " ").as("toks"))
    val stats = d.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val tf = d.select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") * col("n") / col("sumdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }
  val q102Sql: String =
    """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |                  string_split(text, ' ') AS toks FROM documents),
      |stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM d),
      |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
      |       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
      |       WHERE term IN ('spark', 'query', 'vector')
      |       GROUP BY doc_id, dl, term),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |c AS (SELECT tf.doc_id,
      |        ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
      |          * (tf.tf * 2.2)
      |          / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl * stats.n / stats.sumdl))
      |          AS contrib
      |      FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats)
      |SELECT doc_id, round(SUM(contrib), 6) AS bm25,
      |       COUNT(*) AS n_terms_hit
      |FROM c GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  // ---- Q103: source-mixture balancer (pinned per-source quotas) -------
  def q103(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mixtureSample(Tables(s, dir, "documents")
        .select($"doc_id", $"source", $"text"),
        "source", "text", "doc_id",
        Map("src0" -> 15, "src1" -> 10, "src2" -> 20, "src3" -> 5))
      .select($"doc_id", $"source", $"rnk")
      .orderBy($"doc_id")
  }

  /** Frame-shaped core of [[q103]] (facade: `Graft.mixtureSample`):
    * assemble a corpus slice matching declared per-source quotas — per
    * source, the quota rows with the smallest (rolling hash of
    * `textCol`, `tieCol`) survive, a deterministic uniform subset with
    * no RNG. `tieCol` must be unique per row: exact-duplicate texts
    * share a hash, and without a total order the survivors among them
    * would be partition-order-dependent. Sources without a pinned
    * quota contribute nothing; an under-populated source yields what
    * it has (row_number past its row count selects nothing — it cannot
    * steal from other sources). Output: the surviving rows plus their
    * within-source `rnk`.
    *
    * Scale shape: one hash-partition shuffle on the source column for
    * the row_number window; quotas are a literal CASE expression. The
    * window sorts within source partitions only (no global sort), and
    * since only top-quota rows per source survive, skewed sources fall
    * under AQE's skew handling rather than a planning change. */
  private[graft] def mixtureSample(df: DataFrame, sourceCol: String,
      textCol: String, tieCol: String, quotas: Map[String, Int]): DataFrame = {
    require(quotas.nonEmpty && quotas.values.forall(_ >= 1))
    val qCol = quotas.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (acc, (src, q)) => when(col(sourceCol) === src, q).otherwise(acc)
    }
    df.withColumn("__rh", expr(rhSql(textCol)))
      .withColumn("__quota", qCol)
      .filter(col("__quota") > 0)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(sourceCol))
          // NULLS LAST (q63's convention, pinned in the oracle too): a
          // null-text doc has a null hash and must not outrank every
          // real document in its source's quota window
          .orderBy(col("__rh").asc_nulls_last, col(tieCol))))
      .filter(col("rnk") <= col("__quota"))
      .drop("__rh", "__quota")
  }
  val q103Sql: String =
    """WITH d AS (SELECT doc_id, source,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, least(len(text), 64)),
      |                     i -> CAST(ascii(text[i]) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rh,
      |  CASE source WHEN 'src0' THEN 15 WHEN 'src1' THEN 10
      |              WHEN 'src2' THEN 20 WHEN 'src3' THEN 5 ELSE 0 END AS quota
      |  FROM documents),
      |r AS (SELECT doc_id, source, quota,
      |        ROW_NUMBER() OVER (PARTITION BY source
      |                           ORDER BY rh NULLS LAST, doc_id) AS rnk
      |      FROM d WHERE quota > 0)
      |SELECT doc_id, source, rnk FROM r WHERE rnk <= quota
      |ORDER BY doc_id""".stripMargin

  // ---- Q105: incremental near-dup — pairs INTRODUCED by a delta batch -
  // The daily-increment dedup shape: corpus = docs with doc_id % 5 != 0,
  // delta = the rest (a 20% "new crawl"); output = every trigram-Jaccard
  // ≥ 0.2 pair touching the delta, computed WITHOUT the corpus×corpus
  // half of q44's self-join (operators.IncrementalNearDup — candidate
  // volume Σ df_all·df_delta, not Σ df_all²). Output is by construction
  // the delta-touching subset of q44's pair set, which is what the
  // oracle asserts.
  def q105(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = LlmOps2.triSets(s, dir)
      .select($"doc_id", $"tris".as("toks"))
      // persist + eager cut (q44's measured rule): the trigram
      // derivation dominates per-row cost and would otherwise run once
      // per branch per join side; the cache lives only for this call
      .persist()
    try {
      val pairs = graft.operators.IncrementalNearDup.newPairs(
        d.filter($"doc_id" % 5 =!= 0), d.filter($"doc_id" % 5 === 0), 0.2)
      graft.Hygiene.eagerCut(pairs)
    } finally d.unpersist(blocking = false)
  }
  val q105Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN len(sp) >= 3 THEN
      |      list_distinct(list_transform(generate_series(1, len(sp) - 2),
      |        i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2]))
      |    ELSE CAST([] AS VARCHAR[]) END AS tris
      |  FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  round(CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
      |    / (len(a.tris) + len(b.tris) - len(list_intersect(a.tris, b.tris))), 6) AS jaccard
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
      |  AND CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
      |    / (len(a.tris) + len(b.tris) - len(list_intersect(a.tris, b.tris))) >= 0.2
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- Q104: passage-level dedup via winnowing fingerprints -----------
  // The dedup family the doc-level operators (q35 exact, q36/q47
  // near-dup) don't cover: SHARED PASSAGES between otherwise-different
  // documents (boilerplate headers, quoted blocks). Winnowing
  // (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every word 5-gram,
  // then keep only each 4-window's MINIMUM hash — a ~2/(w+1) density
  // fingerprint subset with the guarantee that any shared run of
  // ≥ k+w−1 tokens shares ≥ 1 fingerprint. Docs shorter than one
  // window contribute their global-min hash (coverage never drops to
  // zero). Pairs sharing ≥ 3 fingerprints are reported with the count.
  def q104(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    winnowSharedPassages(
      Tables(s, dir, "documents").select($"doc_id", $"text"),
      "doc_id", "text")
  }

  /** Frame-shaped core of [[q104]] (facade: `Graft.sharedPassages`):
    * `(doc_a, doc_b, n_shared)` for document pairs sharing ≥
    * `minShared` winnowed fingerprints. Every hash is the portable
    * base-31 fold (q43's), so the fingerprint sets — and therefore the
    * pairs — are bit-identical in any engine.
    *
    * Scale shape: fingerprinting is pure map-side HOF work (no UDF);
    * the pair generation is the inverted-index join on the fingerprint
    * key — candidates exist only for docs actually sharing a passage
    * fingerprint, and the winnowed index is ~1/w the size of the full
    * gram index q44's trigram join carries. The one quadratic hazard
    * is a fingerprint shared by a large doc set (classic boilerplate);
    * `maxDocsPerFp` drops fingerprints above that document frequency —
    * exactly the stop-word analogue for passages, and standard
    * practice for winnowing indexes (a fingerprint in thousands of
    * docs identifies boilerplate, not plagiarism-style duplication). */
  private[graft] def winnowSharedPassages(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 5, w: Int = 4, minShared: Int = 3,
      maxDocsPerFp: Long = 10000): DataFrame = {
    require(k >= 2 && w >= 2 && minShared >= 1)
    // fingerprinting is the fused codegen Expression
    // (functions.WinnowFingerprintsText): one byte loop per row with
    // the tokenization ABSORBED (no split() array per row), bit-equal
    // to winnow_fingerprints(split(text)) and to the HOF reference
    // below. The all-HOF formulation walked interpreted lambdas per
    // CHARACTER — measured 201 s for the 5 000-doc sf0.1 corpus vs
    // ~1 s fused; fusing the split shaved another ~0.3 s (q104 median
    // 1.313 → 1.028 at sf0.1).
    val fps = docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.WinnowFingerprints
          .winnowFingerprintsText(col(textCol), k, w)).as("fp"))
    // boilerplate guard: a fingerprint in more than maxDocsPerFp docs
    // is dropped BEFORE the self-join (document frequency is one
    // aggregate on the already-shuffled fp key; the join reuses that
    // partitioning)
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocsPerFp && col("__df") >= 2)
      .select(col("fp"))
    val indexed = fps.join(rare, "fp")
    indexed.as("x").join(indexed.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }
  /** The declarative HOF reference for [[winnowSharedPassages]]'s
    * fingerprint step — kept as the readable specification of the
    * scheme and as the equality oracle for the fused Expression
    * (WinnowFingerprintsSpec): gram strings built once, char-folded
    * with q43's portable hash, then per-window minima, distinct in
    * first-occurrence order. Input (doc_id, toks) → (doc_id, fps). */
  private[graft] def winnowFingerprintsHof(d: DataFrame, k: Int = 5,
      w: Int = 4): DataFrame =
    d.withColumn("grams", expr(
        s"""CASE WHEN size(toks) >= $k THEN
           |  transform(sequence(1, size(toks) - ${k - 1}),
           |            i -> array_join(slice(toks, i, $k), ' '))
           |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      .withColumn("ghs", expr(
        s"""transform(grams, g ->
           |  aggregate(
           |    transform(sequence(1, least(length(g), 64)),
           |      j -> ascii(substring(g, j, 1))),
           |    0L, (acc, x) -> (acc * 31 + x) % 1000000007))""".stripMargin))
      .withColumn("fps", expr(
        s"""CASE WHEN size(ghs) >= $w THEN
           |  array_distinct(transform(sequence(1, size(ghs) - ${w - 1}),
           |    i -> array_min(slice(ghs, i, $w))))
           |WHEN size(ghs) >= 1 THEN array(array_min(ghs))
           |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
      .select(col("doc_id"), col("fps"))

  val q104Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g0 AS (SELECT doc_id,
      |  CASE WHEN len(toks) >= 5 THEN
      |    list_transform(generate_series(1, len(toks) - 4),
      |                   i -> array_to_string(list_slice(toks, i, i + 4), ' '))
      |  ELSE CAST([] AS VARCHAR[]) END AS grams
      |  FROM t),
      |g AS (SELECT doc_id,
      |  list_transform(grams, s ->
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, least(len(s), 64)),
      |          j -> CAST(ascii(s[j]) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS ghs
      |  FROM g0),
      |f AS (SELECT doc_id,
      |  CASE WHEN len(ghs) >= 4 THEN
      |    list_distinct(list_transform(generate_series(1, len(ghs) - 3),
      |      i -> list_min(list_slice(ghs, i, i + 3))))
      |  WHEN len(ghs) >= 1 THEN [list_min(ghs)]
      |  ELSE CAST([] AS BIGINT[]) END AS fps
      |  FROM g),
      |e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
      |rare AS (SELECT fp FROM e GROUP BY fp
      |         HAVING COUNT(*) <= 10000 AND COUNT(*) >= 2),
      |i AS (SELECT e.doc_id, e.fp FROM e JOIN rare USING (fp))
      |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_shared
      |FROM i x JOIN i y ON x.fp = y.fp AND x.doc_id < y.doc_id
      |GROUP BY 1, 2 HAVING COUNT(*) >= 3
      |ORDER BY doc_a, doc_b""".stripMargin
}
