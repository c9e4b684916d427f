package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline operators round 6: corpus-hygiene primitives a web-scale
  * training run applies between crawl and tokenizer — C4's
  * cross-document line dedup, character-entropy gibberish scoring,
  * and Zipf-slope vocabulary auditing. Like every other gated query,
  * decisions are exact integer arithmetic; the floats (entropy, slope)
  * are `round(..., 6)` like q39's TF-IDF.
  */
object LlmOps7 {

  /** Words per synthetic "line": the fixture corpus is newline-free
    * (single-spaced word streams), so the q108 binding chunks each
    * document into fixed 12-word windows — the same deterministic
    * re-lining trick q69 uses for chunking — and the operator itself
    * ([[graft.operators.Dedup.lineDedup]]) is line-source-agnostic. */
  private val LineWords = 12

  // ---- Q108: C4-style cross-document line dedup ----------------------
  // The C4 cleaning step (Raffel et al. 2020 §2.2): any "line" occurring
  // more than once in the corpus is kept only at its first occurrence
  // (here: smallest doc_id, then smallest line index) and removed
  // everywhere else; documents are reassembled from their surviving
  // lines. The wide shuffle carries (doc_id, line_idx, hash) only —
  // never the text — see the operator scaladoc for the 100 TB shape.
  def q108(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // null text ⇒ zero lines (the transform chain propagates the null;
    // coalesce pins the "document with no lines" representation)
    val lined = Tables(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id",
        coalesce(
          transform(
            sequence(lit(0), ceil(size($"w") / lit(LineWords.toDouble)).cast("int") - 1),
            i => array_join(slice($"w", i * LineWords + 1, lit(LineWords)), " ")),
          array().cast("array<string>"))
          .as("lines"))
    graft.operators.Dedup.lineDedup(lined, "doc_id", "lines", sep = " ")
      .orderBy($"doc_id")
  }
  val q108Sql: String =
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE text IS NOT NULL
       |), lines AS (
       |  SELECT doc_id, i AS line_idx,
       |         array_to_string(w[i*$LineWords+1 : i*$LineWords+$LineWords], ' ') AS line
       |  FROM words,
       |       unnest(range(0, CAST(ceil(len(w)/$LineWords.0) AS BIGINT))) AS t(i)
       |), ranked AS (
       |  SELECT doc_id, line_idx, line,
       |         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
       |  FROM lines
       |), agg AS (
       |  SELECT doc_id,
       |         count(*) AS n_lines,
       |         count(*) FILTER (rn = 1) AS n_kept,
       |         string_agg(line, ' ' ORDER BY line_idx) FILTER (rn = 1) AS t
       |  FROM ranked GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |       coalesce(a.n_lines, 0) AS n_lines,
       |       coalesce(a.n_kept, 0) AS n_kept,
       |       coalesce(a.t, '') AS new_text
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---- Q109: character-entropy quality signal -------------------------
  // Shannon entropy (bits/char) of each document's character
  // distribution — the standard cheap gibberish/boilerplate detector
  // (near-zero for "aaaa...", ~4.1 for English prose). Computed
  // per-row by the fused codegen Expression
  // [[graft.functions.CharEntropy]] — a map-only plan with NO shuffle
  // except the presentation sort; at 100 TB this is a pure scan-side
  // column, pipelined into whatever filter consumes it.
  //
  // Measured before fused (VERDICT r14 task 7; numbers in NOTES_r15):
  // the r14 HOF chain (`transform(array_distinct(chs), c ->
  // size(filter(chs, …)))`) is O(|alphabet|·len) per document — fine
  // at fixture lengths, 98 s on a 2000-doc × 100 KB corpus vs 10.3 s
  // for a single-pass sorted-runs HOF vs 0.21 s for the fused one-pass
  // loop (no per-doc char array at all). All three agree ≤1e-9
  // (entropy is summation-order-free up to float drift, far under the
  // 6-decimal print); segmentation stays code-point-exact with the
  // oracle (CharEntropySpec pins emoji/multibyte equality).
  def q109(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // null/empty text ⇒ null entropy (undefined distribution — the
    // Expression's rule, matching the oracle's left join); the `+ 0.0`
    // keeps the r14 −0.0 normalization pinned even though the fused
    // formula (log2 t − Σn·log2 n / t) already yields +0.0 for
    // single-character documents
    Tables(s, dir, "documents")
      .select($"doc_id",
        (round(graft.functions.CharEntropy.charEntropy($"text"), 6) +
          lit(0.0)).as("entropy"))
      .orderBy($"doc_id")
  }
  val q109Sql: String =
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
      |), freq AS (
      |  SELECT doc_id, ch, count(*)::DOUBLE AS n FROM chars
      |  WHERE ch <> '' GROUP BY 1, 2
      |), tot AS (
      |  SELECT doc_id, sum(n) AS t FROM freq GROUP BY 1
      |), ent AS (
      |  SELECT f.doc_id,
      |         round(-sum((n/t) * ln(n/t) / ln(2.0)), 6) + 0.0 AS entropy
      |  FROM freq f JOIN tot USING (doc_id) GROUP BY f.doc_id
      |)
      |SELECT d.doc_id, e.entropy
      |FROM documents d LEFT JOIN ent e USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---- Q111: Zipf-slope vocabulary audit ------------------------------
  // Per-language log-log regression of frequency against rank over the
  // top-100 words — the corpus-auditing statistic that flags template
  // spam (slope near 0) and mono-token floods (steep cliffs) before
  // training. Top-100 via the engine's bounded-heap TopKPerGroup plan
  // (x22): partial heaps before the shuffle, so the exchange carries
  // at most 100 rows per (partition, lang) — never a full per-language
  // sort of the vocabulary. Ranks are tie-broken by word so the same
  // (word, rank) assignment falls out of any engine.
  def q111(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val freq = Tables(s, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"lang", $"w").agg(count(lit(1)).cast("double").as("n"))
    graft.plans.GraftOps.topKPerGroup(freq, 100, Seq("lang"),
        Seq(graft.plans.GraftOps.Order("n", desc = true),
          graft.plans.GraftOps.Order("w")), rankName = "r")
      .groupBy($"lang")
      .agg(count(lit(1)).as("vocab_top"),
        (round(regr_slope(log($"n"), log($"r".cast("double"))), 6) + lit(0.0))
          .as("zipf_slope"))
      .orderBy($"lang")
  }
  val q111Sql: String =
    """WITH words AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
      |), freq AS (
      |  SELECT lang, w, count(*)::DOUBLE AS n FROM words
      |  WHERE w <> '' GROUP BY 1, 2
      |), ranked AS (
      |  SELECT lang, n,
      |         row_number() OVER (PARTITION BY lang ORDER BY n DESC, w) AS r
      |  FROM freq
      |)
      |SELECT lang, count(*) AS vocab_top,
      |       round(regr_slope(ln(n), ln(r)), 6) + 0.0 AS zipf_slope
      |FROM ranked WHERE r <= 100 GROUP BY lang ORDER BY lang""".stripMargin

  /** Prefix width of the q113 boilerplate key: long enough that two
    * unrelated documents essentially never share it, short enough
    * that template families (mutated tails — the fixture's near-dup
    * construction) collide. */
  private val PrefixWords = 8

  // ---- Q113: cross-source boilerplate overlap matrix -------------------
  // Which crawls/feeds ship the same templates? For every source pair
  // (source_a ≤ source_b), the number of DOCUMENT PAIRS sharing an
  // identical first-8-words prefix — within-source pairs counted
  // n·(n−1)/2, cross-source n_a·n_b. Exact duplicates are a subset
  // (same text ⇒ same prefix), so this is the audit that decides which
  // of two overlapping feeds to drop BEFORE paying full dedup over the
  // union. Scale shape (the q35 rule): the exchange carries a 32-byte
  // prefix DIGEST + source, never text; the pair arithmetic then runs
  // only on digests seen ≥2 times (the duplicated-boilerplate set —
  // tiny next to the corpus), each contributing its per-source counts,
  // not its documents. NULL text forms its own prefix group on both
  // engines (digest sentinel '' / IS NOT DISTINCT FROM), distinct from
  // empty-string text (sha2('') is a real digest).
  def q113(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the generalized operator (round 16: [[graft.operators
    // .SourceOverlap]] — prefix/suffix/mid-document windows behind one
    // matrix shape); q113 is its default PREFIX instantiation, plan and
    // oracle unchanged. The corpus-scanned-ONCE iteration history (the
    // first cut profiled Scan=4/Exchange=11; the window ≥2 prune +
    // eager cut landed Scan=2/Exchange=7) lives in the operator now.
    graft.operators.SourceOverlap.overlapMatrix(
        Tables(s, dir, "documents"), "text", "source",
        graft.operators.SourceOverlap.Prefix(PrefixWords))
      .orderBy($"source_a", $"source_b")
  }
  val q113Sql: String =
    """WITH g AS (
      |  SELECT array_to_string((string_split(text, ' '))[1:8], ' ') AS p,
      |         source, count(*) AS n
      |  FROM documents GROUP BY 1, 2
      |), dup AS (
      |  SELECT p FROM g GROUP BY 1 HAVING sum(n) >= 2
      |), gd AS (
      |  SELECT g.* FROM g JOIN dup ON g.p IS NOT DISTINCT FROM dup.p
      |)
      |SELECT a.source AS source_a, b.source AS source_b,
      |       CAST(SUM(CASE WHEN a.source = b.source
      |                     THEN (a.n * (a.n - 1)) // 2
      |                     ELSE a.n * b.n END) AS BIGINT) AS dup_pairs
      |FROM gd a JOIN gd b
      |  ON a.p IS NOT DISTINCT FROM b.p AND a.source <= b.source
      |GROUP BY 1, 2
      |HAVING SUM(CASE WHEN a.source = b.source
      |           THEN (a.n * (a.n - 1)) // 2 ELSE a.n * b.n END) > 0
      |ORDER BY source_a, source_b""".stripMargin

  // ---- Q114: per-label embedding-coherence audit -----------------------
  // Label-quality QA over the embeddings table: per label, the count
  // and the mean/min cosine of each member to its label CENTROID — a
  // coherent label reads avg ≈ high with no deep min; a mislabeled or
  // mixed cluster shows up as a low min (the outlier member) before
  // any model ever trains on it. The per-row cosine runs through the
  // codegen CosineSimilarity expression (the q37/x37 kernel); the
  // centroid is one explode+avg pass, re-assembled position-sorted,
  // and BROADCAST back (labels are few — the one corpus-sized pass is
  // the explode). NaN cosines (a zero-norm member or an exactly-zero
  // centroid) are excluded on both engines (the oracle's norm > 0
  // guard). Floats cast to double up front; both engines round the
  // O(1)-magnitude stats to 6 decimals, far above summation-order ulps
  // (the q111 regr_slope precedent).
  def q114(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // sanitize BEFORE the centroid: a null/NaN-element or zero-norm
    // member must neither poison the label centroid nor count as a
    // member — and the exclusion must be THIS side of the oracle diff
    // (DuckDB's sum() skips NULL elements and its NaN compares greater
    // than everything, so leaving degenerate vectors to downstream
    // NaN-filtering diverges: the seed-909 adversarial embeddings
    // sweep caught exactly that — a NaN component kept the label row
    // in DuckDB and erased it in Spark). The predicate is the ONE
    // ill-formed-vector contract (`LlmOps.wellFormedVec` — also the
    // DomainCheck.WellFormedVector preflight rule): a drop that
    // preflights clean audits every vector here. Sub-denormal norms
    // (x≠0 but x² underflows to 0) still converge: Spark's cosine
    // goes NaN → the isnan filter, the oracle's nx > 0 guard.
    val e = Tables(s, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
      .filter(LlmOps.wellFormedVec($"v"))
    val cent = e.select($"label", posexplode($"v").as(Seq("p", "x")))
      .groupBy($"label", $"p").agg(avg($"x").as("c"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"p", $"c"))),
        s0 => s0.getField("c")).as("cv"))
    e.join(broadcast(cent), "label")
      .select($"label",
        graft.functions.CosineSimilarity.cosineSim($"v", $"cv").as("cos"))
      .filter($"cos".isNotNull && !isnan($"cos"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        (round(avg($"cos"), 6) + lit(0.0)).as("avg_cos"),
        (round(min($"cos"), 6) + lit(0.0)).as("min_cos"))
      .orderBy($"label")
  }
  val q114Sql: String =
    """WITH clean AS (
      |  SELECT vec_id FROM embeddings
      |  WHERE embedding IS NOT NULL
      |    AND len(list_filter(embedding,
      |          x -> x IS NULL OR isnan(x))) = 0
      |    AND len(list_filter(embedding, x -> x <> 0)) > 0
      |), pos AS (
      |  SELECT e.vec_id, e.label,
      |         unnest(generate_series(1, len(e.embedding))) AS p,
      |         CAST(unnest(e.embedding) AS DOUBLE) AS x
      |  FROM embeddings e JOIN clean c ON e.vec_id = c.vec_id
      |), cent AS (
      |  SELECT label, p, avg(x) AS c FROM pos GROUP BY 1, 2
      |), dotn AS (
      |  SELECT pos.vec_id, pos.label,
      |         sum(pos.x * cent.c) AS dot,
      |         sqrt(sum(pos.x * pos.x)) AS nx,
      |         sqrt(sum(cent.c * cent.c)) AS nc
      |  FROM pos JOIN cent ON pos.label = cent.label AND pos.p = cent.p
      |  GROUP BY 1, 2
      |), cos AS (
      |  SELECT label, dot / (nx * nc) AS cs FROM dotn
      |  WHERE nx > 0 AND nc > 0 AND NOT isnan(dot / (nx * nc))
      |)
      |SELECT label, count(*) AS n,
      |       round(avg(cs), 6) + 0.0 AS avg_cos,
      |       round(min(cs), 6) + 0.0 AS min_cos
      |FROM cos GROUP BY label ORDER BY label""".stripMargin

  // ---- Q116: per-source boilerplate strip ------------------------------
  // The ACTING half of q113's audit: every (source, first-8-words)
  // family shared by ≥2 documents of the SAME source has that prefix
  // removed from each member (token splice — the separator space is
  // the only character consumed); every other document, including a
  // lone doc in another source under the very same prefix, passes
  // through byte-unchanged. Null text is never a family member here
  // (nothing to strip), where the overlap MATRIX deliberately counts
  // null-null pairs. Whole-span members (≤8-word docs) strip to ''.
  // Scale shape: operators.Boilerplate — family detection exchanges
  // (source, digest) only, family keys broadcast back, so corpus text
  // never shuffles; the oracle's coalesce covers DuckDB's NULL
  // out-of-range slice where Spark's zero-length slice yields ''.
  def q116(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Boilerplate.strip(
        Tables(s, dir, "documents"), "text", "source",
        graft.operators.SourceOverlap.Prefix(PrefixWords), minDocs = 2)
      .select($"doc_id", $"source", $"text".as("text_out"), $"stripped")
      .orderBy($"doc_id")
  }
  val q116Sql: String =
    """WITH p AS (
      |  SELECT doc_id, source, text,
      |         CASE WHEN text IS NOT NULL THEN
      |           array_to_string((string_split(text, ' '))[1:8], ' ')
      |         END AS pfx
      |  FROM documents
      |), fam AS (
      |  SELECT source, pfx FROM p WHERE pfx IS NOT NULL
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |)
      |SELECT p.doc_id, p.source,
      |       CASE WHEN f.pfx IS NOT NULL THEN
      |         coalesce(
      |           array_to_string((string_split(p.text, ' '))[9:], ' '), '')
      |       ELSE p.text END AS text_out,
      |       CAST(f.pfx IS NOT NULL AS INT) AS stripped
      |FROM p LEFT JOIN fam f ON p.source = f.source AND p.pfx = f.pfx
      |ORDER BY doc_id""".stripMargin
}
