package graft.queries

import graft.Tables
import graft.functions.CosineSimilarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additional training-data-pipeline operators beyond SURVEY §2.C.10:
  * language-ID heuristics, quality scoring, subword token counting,
  * document fingerprinting (rolling hash), n-gram Jaccard near-dup,
  * embedding-cosine near-dup, SimHash. All use portable arithmetic
  * (integer polynomial hashes, decimal/rounded doubles) so every one is
  * verified against the DuckDB oracle, not just rows-counted.
  */
object LlmOps2 {

  // ---- Q41: text quality + n-gram-free language-ID heuristic ----------

  private[graft] val StopWords = Seq("the", "a", "data", "value", "table")

  /** THE exact-integer quality score over a token-array column — shared
    * by q41, q79's selection, and the E07 streaming spec so the formula
    * cannot drift between the scorer, the selector, and the
    * streaming-readiness proof. `toksCol` is the column NAME of a
    * string-array column in scope. */
  private[graft] def qualityScore(toksCol: String): Column =
    (expr(s"(4000 * size(array_distinct($toksCol)) + 3000 * size(filter($toksCol, " +
      s"t -> t IN (${StopWords.map("'" + _ + "'").mkString(",")})))) div size($toksCol)") +
      lit(30) * least(size(col(toksCol)), lit(100))).cast("long")

  def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stop = StopWords
    Tables(s, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("n_distinct", size(array_distinct($"toks")))
      .withColumn("n_stop",
        size(filter($"toks", t => t.isin(stop.map(x => x: Any): _*))))
      .withColumn("sum_len",
        expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))"))
      .select($"doc_id", $"n_tokens", $"n_distinct",
        round($"n_distinct".cast("double") / $"n_tokens", 4).as("ttr"),
        round($"n_stop".cast("double") / $"n_tokens", 4).as("stop_ratio"),
        round($"sum_len".cast("double") / $"n_tokens", 4).as("avg_token_len"),
        // exact integer arithmetic (0..10000): no float rounding at
        // half-way boundaries, identical in any engine; shared formula
        qualityScore("toks").as("quality_score"),
        when($"n_stop".cast("double") / $"n_tokens" >= 0.1, "en")
          .otherwise("other").as("pred_lang"))
      .orderBy($"doc_id")
  }
  val q41Sql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    len(toks) AS n_tokens,
      |    len(list_distinct(toks)) AS n_distinct,
      |    len(list_filter(toks, t -> t IN ('the','a','data','value','table'))) AS n_stop,
      |    CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT) AS sum_len
      |  FROM d)
      |SELECT doc_id, n_tokens, n_distinct,
      |  round(CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS ttr,
      |  round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
      |  round(CAST(sum_len AS DOUBLE) / n_tokens, 4) AS avg_token_len,
      |  CAST((4000 * n_distinct + 3000 * n_stop) // n_tokens
      |      + 30 * least(n_tokens, 100) AS BIGINT) AS quality_score,
      |  CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.1 THEN 'en' ELSE 'other' END AS pred_lang
      |FROM f ORDER BY doc_id""".stripMargin

  // ---- Q42: token counting — whitespace, regex, BPE-ish subwords ------
  def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .select($"doc_id",
        size($"toks").as("n_ws_tokens"),
        size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+"), lit(0)))
          .as("n_re_tokens"),
        expr("aggregate(toks, 0L, (acc, t) -> acc + CAST((length(t) + 3) / 4 AS BIGINT))")
          .as("n_subwords"))
      .orderBy($"doc_id")
  }
  val q42Sql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_re_tokens,
      |  CAST(list_sum(list_transform(string_split(text, ' '),
      |    t -> (len(t) + 3) // 4)) AS BIGINT) AS n_subwords
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- Q43: document fingerprint — polynomial rolling hash ------------
  // Portable arithmetic (base-31 fold mod 1e9+7 over the first 64 chars)
  // gives bit-identical fingerprints in any engine — unlike built-in
  // hash()/xxhash64, whose bit patterns are engine-specific.
  def q43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"n_chars",
        expr("""aggregate(
          transform(sequence(1, least(length(text), 64)),
                    i -> ascii(substring(text, i, 1))),
          0L, (acc, x) -> (acc * 31 + x) % 1000000007)""").as("fingerprint"))
      .orderBy($"doc_id")
  }
  val q43Sql: String =
    """SELECT doc_id, n_chars,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, least(len(text), 64)),
      |                     i -> CAST(ascii(text[i]) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- Q44: n-gram (word trigram) Jaccard near-dup pairs --------------
  // Trigram sets are sparse (unlike the 31-token unigram vocab), so the
  // inverted-index join IS the scale path here: candidates only exist
  // for docs sharing a full trigram.
  /** Per-doc DISTINCT word-trigram sets `(doc_id, tris)` — q44's
    * derivation, shared with q105's incremental formulation. Runs the
    * fused [[graft.functions.WordNGrams]] byte pass — the round-16
    * long-document audit found the previous HOF chain latently
    * QUADRATIC: its lambda referenced the outer `sp = split(text)`
    * array, and under an unpersisted explode the optimizer inlines the
    * split INTO the lambda body, re-splitting the full text once per
    * gram index (every worker thread-dump-pinned in `ConcatWs.eval →
    * StringSplit.nullSafeEval` at 2000×100 KB docs; killed after
    * 15+ min vs 2.1 s non-inlined, 0.44 s fused). Bit-equality with the
    * old chain, including array_distinct's first-occurrence order and
    * the empty-token corners, is pinned by WordNGramsSpec. */
  private[queries] def triSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id",
        graft.functions.WordNGrams.wordNGrams($"text", 3).as("tris"))
  }

  def q44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = triSets(s, dir)
      .select($"doc_id", $"tris", size($"tris").cast("double").as("sz"))
      // persist + EAGER CUT (unpersisted before returning): the trigram
      // derivation, unpersisted, runs ~6× per row — once per join side
      // plus the filter copies that generate-inference inlines into
      // each scan (measured 18 s vs 3 s at sf0.1 under the old HOF
      // chain; the fused WordNGrams pass shrinks the per-copy cost but
      // the scan itself still re-runs per side, so the cache stays).
      // The cache lives only for the duration of this call.
      .persist()
    val tri = d.select($"doc_id", $"sz", explode($"tris").as("tri"))
    val pairs = tri.as("x").join(tri.as("y"),
        $"x.tri" === $"y.tri" && $"x.doc_id" < $"y.doc_id")
      .groupBy($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        $"x.sz".as("sza"), $"y.sz".as("szb"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .withColumn("jac", $"inter" / ($"sza" + $"szb" - $"inter"))
      .filter($"jac" >= 0.2)
      .select($"doc_a", $"doc_b", round($"jac", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
    // materialize the (small) surviving pair set, then release the cache:
    // the caller gets a lineage-truncated frame and no trigram relation
    // stays pinned in storage after this call returns. (Corollary: a
    // Hygiene.clearAll invalidates this frame — consume it first, as
    // the harness mains do; see Hygiene's contract note.)
    // finally: a failed checkpoint job must not leak the persist
    try graft.Hygiene.eagerCut(pairs)
    finally d.unpersist(blocking = false)
  }
  val q44Sql: String =
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
      |WHERE CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
      |    / (len(a.tris) + len(b.tris) - len(list_intersect(a.tris, b.tris))) >= 0.2
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- Q45: embedding-cosine near-dup pairs (exact, threshold 0.35) ---
  // Adaptive dispatch, mirroring q36's shape test: exact all-pairs under
  // a row-count threshold (the declared-exact baseline — feasible and
  // fastest when n² pairs fit a single stage), IVF-candidate generation
  // + exact verify above it. Scoring runs through the custom codegen
  // Expression — one fused loop per pair.
  def q45(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    embedNeardupPairs(emb, 0.35)
  }

  /** Core of Q45 over any (vec_id, v) frame. Above `maxExactRows` the
    * all-pairs join becomes the scale-killer, so the IVF path prunes
    * with a PROVABLY recall-complete cell bound instead:
    *
    *  1. every vector joins its nearest of `c` coarse centroids (cells);
    *  2. each cell records its angular radius r = max angle(member, centroid);
    *  3. a cell pair (i, j) can only contain a qualifying pair if
    *     angle(c_i, c_j) − r_i − r_j ≤ arccos(threshold)  (angular
    *     triangle inequality), so all other cell pairs are pruned;
    *  4. surviving candidates are verified EXACTLY.
    *
    * Pruning safety is a theorem, not a tuning outcome — the result is
    * the exact pair set for any (c, data). How MUCH is pruned depends on
    * cluster tightness, dimensionality, and the threshold: on the
    * fixture embeddings at t=0.35 (arccos ≈ 69.5°) NOTHING prunes
    * (measured: all c² cell pairs admissible for c∈{16,32,64} — in 64
    * dims pair angles concentrate near 90°, so no radius configuration
    * beats so wide a bound; metric pruning for low cosine thresholds in
    * high dimensions is structurally hard, which is WHY the exact
    * all-pairs plan stays the declared baseline). On clusterable data /
    * tighter thresholds the bound engages (asserted in LlmOpsSpec), and
    * at 100 TB `c` grows to keep cells executor-sized while the
    * cell-pair relation (c² rows) stays broadcastable. */
  private[queries] def embedNeardupPairs(emb: DataFrame, threshold: Double,
      maxExactRows: Long = 20000, c: Int = 16,
      forceIvf: Boolean = false): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val pairs = if (!forceIvf && emb.count() <= maxExactRows) {
      emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
        // cosineGuard: the codegen Expression stays IEEE-pure (NaN for
        // zero-norm/NaN inputs, bit-equality spec'd); the QUERY maps
        // NaN to NULL so ill-formed vectors never pair (r9 contract)
        .withColumn("cos",
          graft.queries.LlmOps.cosineGuard(
            CosineSimilarity.cosineSim($"a.v", $"b.v")))
        .filter($"cos" >= threshold)
        .select($"a.vec_id".as("a_id"), $"b.vec_id".as("b_id"),
          round($"cos", 6).as("cosine"))
    } else {
      val (assigned, cellPairs) = ivfCells(emb, threshold, c)
      // candidates within admissible cell pairs only; each vector lives
      // in exactly one cell, so every pair is generated at most once —
      // no distinct needed. Exact verify makes the pruning safe.
      // (assigned is recomputed per consumer — three linear passes —
      // rather than persisted: no storage residue, same plan at scale.)
      assigned.select($"vec_id".as("l_id"), $"v".as("lv"), $"cent_id".as("ca"))
        .join(broadcast(cellPairs), "ca")
        .join(assigned.select($"vec_id".as("r_id"), $"v".as("rv"),
            $"cent_id".as("rcell")),
          $"cb" === $"rcell" && $"l_id" < $"r_id")
        .withColumn("cos",
          graft.queries.LlmOps.cosineGuard(
            CosineSimilarity.cosineSim($"lv", $"rv")))
        .filter($"cos" >= threshold)
        .select($"l_id".as("a_id"), $"r_id".as("b_id"),
          round($"cos", 6).as("cosine"))
    }
    pairs.orderBy($"a_id", $"b_id")
  }

  /** IVF building blocks for [[embedNeardupPairs]]: nearest-centroid
    * assignment (vec_id, v, cent_id) and the admissible cell-pair
    * relation (ca, cb) under the angular triangle bound. Exposed
    * separately so the pruning behavior itself is testable. */
  private[queries] def ivfCells(emb: DataFrame, threshold: Double,
      c: Int): (DataFrame, DataFrame) = {
    val s = emb.sparkSession
    import s.implicits._
    import graft.plans.GraftOps
    def ang(cos: Column): Column = // numerically safe arccos
      acos(least(lit(1.0), greatest(lit(-1.0), cos)))
    // deterministic k-means coarse centroids (farthest-first seeded,
    // Lloyd-refined on a bounded driver-side sample): tighter cells
    // mean smaller radii, so the triangle bound prunes MORE cell pairs
    // than raw seed vectors would on clusterable data
    val cents = graft.operators.KMeans.fit(emb, c)
    // nearest-centroid assignment via the bounded-heap operator (the
    // partial pass collapses c candidate rows per vector pre-shuffle)
    val assigned = GraftOps.topKPerGroup(
        emb.join(broadcast(cents))
          .select($"vec_id", $"v", $"cent_id",
            CosineSimilarity.cosineSim($"v", $"cv").as("sim")),
        1, Seq("vec_id"),
        Seq(GraftOps.Order("sim", desc = true), GraftOps.Order("cent_id")))
      .select($"vec_id", $"v", $"cent_id", ang($"sim").as("vang"))
    val radii = assigned.groupBy($"cent_id").agg(max($"vang").as("r"))
    // admissible cell pairs: c² rows of centroid-pair angles vs the
    // triangle bound (tiny relation, broadcast by the caller); ordered
    // pairs both ways + diagonal so vec_id < vec_id covers each case once
    val cellPairs = cents.as("x").join(cents.as("y"))
      .select($"x.cent_id".as("ca"), $"y.cent_id".as("cb"),
        ang(CosineSimilarity.cosineSim($"x.cv", $"y.cv")).as("cang"))
      .join(radii.select($"cent_id".as("ca"), $"r".as("ra")), "ca")
      .join(radii.select($"cent_id".as("cb"), $"r".as("rb")), "cb")
      .filter($"cang" - $"ra" - $"rb" <= lit(math.acos(threshold) + 1e-9))
      .select($"ca", $"cb")
    (assigned.select($"vec_id", $"v", $"cent_id"), cellPairs)
  }
  val q45Sql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |        list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * b.v[k]), (x,y) -> x + y)
      |        / (sqrt(list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * a.v[k]), (x,y) -> x + y))
      |         * sqrt(list_reduce(list_transform(generate_series(1, 64), k -> b.v[k] * b.v[k]), (x,y) -> x + y))) AS cos
      |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT a_id, b_id, round(cos, 6) AS cosine
      |FROM s WHERE cos IS NOT NULL AND NOT isnan(cos) AND cos >= 0.35
      |ORDER BY a_id, b_id""".stripMargin

  // ---- Q46: SimHash fingerprint (32-bit, portable token hashes) -------
  def q46(s: SparkSession, dir: String): DataFrame =
    simhashes(s, dir).orderBy(col("doc_id"))

  private def simhashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docTok = Tables(s, dir, "documents")
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("tok"))
    // tiny dimension: one portable hash per distinct token
    val tokHash = docTok.select($"tok").distinct()
      .withColumn("h", expr(
        """aggregate(
           transform(sequence(1, length(tok)), i -> ascii(substring(tok, i, 1))),
           0L, (acc, x) -> (acc * 131 + x) % 2147483647)"""))
    val bits = docTok.join(broadcast(tokHash), "tok")
      .select($"doc_id", $"h", explode(sequence(lit(0), lit(31))).as("j"))
      .withColumn("sgn",
        expr("CASE WHEN (shiftright(h, CAST(j AS INT)) & 1) = 1 THEN 1 ELSE -1 END"))
      .groupBy($"doc_id", $"j")
      .agg(sum($"sgn").as("s"))
    bits.groupBy($"doc_id")
      .agg(sum(when($"s" > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
        .otherwise(0L)).as("simhash"))
  }

  // ---- Q52: SimHash near-dup pairs (Hamming distance ≤ 2) -------------
  // The point of SimHash: near-dup detection reduces to cheap integer
  // XOR+popcount between fingerprints — and, crucially, to BUCKETED
  // lookup: the 32-bit fingerprint is cut into 4 disjoint 8-bit bands.
  // Two fingerprints within Hamming distance 2 differ in ≤2 bands, so by
  // pigeonhole they agree EXACTLY on ≥2 of the 4 bands — an equi-join on
  // (band, band_value) is recall-complete, never all-pairs. Candidates
  // are then verified exactly (XOR+popcount), so band collisions cost
  // time, never correctness. A pair agreeing on several bands is
  // verified several times; the post-verify distinct dedupes the small
  // surviving set instead of the much larger raw candidate stream.
  // (the banded join itself is the generalized operator — 4 bands × 8
  // bits over the 32-bit fingerprint, exactly the measured split)
  def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.HammingJoin.selfJoin(
        simhashes(s, dir), "doc_id", "simhash", maxDist = 2, bits = 32,
        numBands = 4)
      .select($"doc_id_a".as("doc_a"), $"doc_id_b".as("doc_b"), $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }
  val q52Sql: String =
    """WITH dt AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents),
      |th AS (
      |  SELECT tok,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, len(tok)), i -> CAST(ascii(tok[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 131 + x) % 2147483647) AS h
      |  FROM (SELECT DISTINCT tok FROM dt)),
      |bits AS (
      |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM dt JOIN th USING (tok)
      |  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j)
      |  GROUP BY doc_id, j),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bits GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
      |ORDER BY doc_a, doc_b""".stripMargin
  val q46Sql: String =
    """WITH dt AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents),
      |th AS (
      |  SELECT tok,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, len(tok)), i -> CAST(ascii(tok[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 131 + x) % 2147483647) AS h
      |  FROM (SELECT DISTINCT tok FROM dt)),
      |bits AS (
      |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM dt JOIN th USING (tok)
      |  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j)
      |  GROUP BY doc_id, j)
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
      |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- Q49: binary column support — UTF-8 bytes, length, sha256 -------
  def q49(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("bin", encode($"text", "UTF-8"))
      .select($"doc_id",
        octet_length($"text").as("byte_len"),
        sha2($"bin", 256).as("digest"),
        // null-SAFE equality (<=>): a null payload round-trips
        // faithfully (true), instead of a NULL boolean whose pandas
        // dtype rendering differs between the two comparator sides
        (decode($"bin", "UTF-8") <=> $"text").as("roundtrip_ok"))
      .orderBy($"doc_id")
  }
  val q49Sql: String =
    """SELECT doc_id, octet_length(encode(text)) AS byte_len, sha256(text) AS digest,
      |  decode(encode(text)) IS NOT DISTINCT FROM text AS roundtrip_ok
      |FROM documents ORDER BY doc_id""".stripMargin
}
