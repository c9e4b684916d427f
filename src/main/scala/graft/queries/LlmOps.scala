package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (SURVEY.md §2.C.10): dedup, near-dup
  * similarity, ANN search, text statistics, TF-IDF, nested/multimodal
  * columns. Designed for 100 TB: no operator materializes O(n²) rows
  * unless the declared output itself is a pair set, and the near-dup
  * join picks its physical strategy by data shape (bitmask encoding for
  * tiny vocabularies, inverted-index token join otherwise).
  */
object LlmOps {
  import Relational.rd

  private def docs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars",
        array_distinct(split($"text", " ")).as("toks"))
  }

  /** THE token-set definition for every Jaccard-based operator
    * (q36/q47/q76/q80 all derive their pair sets from this frame) —
    * single definition so a tokenization change can't silently diverge
    * one operator's pair set from another's.
    *
    * NULL text normalizes to the EMPTY token set (r9 adversarial
    * finding): a NULL `toks` array slipped through the mask-0
    * empty-set guards (`NULL =!= 0` is NULL, so the doc vanished from
    * both the survivor groups and the zero-mask keep list — q76
    * silently DROPPED null-text docs where the oracle and the declared
    * empty-set contract keep them). Empty and null token sets mean the
    * same thing everywhere: pairs with nothing, clusters with nothing,
    * never dropped by a keep policy. */
  private[queries] def docTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id",
        coalesce(array_distinct(split($"text", " ")),
          array().cast("array<string>")).as("toks"))
  }

  /** If the global vocabulary fits in an int64 (≤ 62 distinct tokens),
    * return each doc's token set as a bitmask — set intersection then
    * costs one AND + popcount instead of an array walk. `None` when the
    * vocabulary is too large (callers fall back to array_intersect /
    * inverted-index formulations). Input: (doc_id, toks) array rows.
    *
    * The vocabulary index is COLLECTED (≤ 62 strings — bounded driver
    * metadata at any scale) and the mask folded MAP-SIDE over each
    * doc's token array via a literal token→bit map: no join and no
    * groupBy shuffle of the exploded token relation, which the round-4
    * shape paid on every bitmask-path operator (q36/q47/q57/q76/q80).
    * Measured at sf0.1: q47 10.7 → 10.0 s, q80 6.0 → 5.5 s; q36/q76 at
    * par (their remaining exploded-token shuffle is the vocab-distinct
    * precondition scan, whose partial aggregation is already tiny).
    * The bitwise-OR fold is idempotent, so repeated tokens cost
    * nothing. NULL tokens are ignored (see below); a doc whose token
    * set is empty after null-filtering gets mask 0 — callers forming
    * pairs must exclude mask 0 (such docs pair with nothing, exactly
    * as the inverted-index path behaves). */
  private[queries] def tokenBitmasks(d: DataFrame): Option[DataFrame] = {
    import d.sparkSession.implicits._
    // NULL tokens are ignored (matching the inverted-index path, whose
    // equi-join drops them): filtered out of the vocabulary here, and
    // out of the per-row index array below — otherwise one null element
    // nulls the whole aggregate fold and the doc silently vanishes from
    // every bitmask-path operator.
    // ONE probe job, not count-then-collect (optimization r16): the
    // old shape ran the exploded-token distinct TWICE (a full count,
    // then the orderBy+collect); limit(63) answers both questions in
    // one pass — >62 rows back means the bitmask regime is out (and the
    // limit lets Spark stop early instead of finishing a corpus-wide
    // distinct just to learn the vocabulary is huge). Bit order stays
    // the old orderBy's (UTF8String binary order, sorted driver-side),
    // so masks are bit-identical to the two-job form.
    val vs = d.select(explode($"toks").as("tok")).filter($"tok".isNotNull)
      .distinct().limit(63).collect().map(_.getString(0))
    if (vs.length > 62) None
    else {
      def u(x: String) = org.apache.spark.unsafe.types.UTF8String.fromString(x)
      val idx = vs.sortWith((a, b) => u(a).compareTo(u(b)) < 0)
        .zipWithIndex.toMap
      Some(d
        .select($"doc_id",
          transform($"toks", t => element_at(typedLit(idx), t)).as("idxs"))
        .selectExpr("doc_id",
          "aggregate(filter(idxs, i -> i IS NOT NULL), 0L, " +
            "(acc, i) -> acc | shiftleft(1L, i)) AS mask"))
    }
  }

  // ---- Q35: exact dedup (one row per distinct text, keep MIN(doc_id)) -
  def q35(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .groupBy($"text")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"),
        min($"n_chars").as("n_chars"))
      .select($"keep_id", $"n_dups", $"n_chars")
      .orderBy($"keep_id")
  }
  val q35Sql: String =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups, MIN(n_chars) AS n_chars
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  /** Q35 twin keyed on a SHA-256 digest of the text instead of the raw
    * text: the dedup shuffle then carries 32 bytes per row instead of
    * whole documents — at 100 TB the shuffle payload IS the cost of
    * exact dedup, so digest-first is the formulation that scales.
    * Output is identical to q35 absent a SHA-256 collision (none exist
    * publicly; at 2^-128 the risk is below hardware error rates). */
  def q35Hash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"n_chars", sha2($"text", 256).as("digest"))
      .groupBy($"digest")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"),
        min($"n_chars").as("n_chars"))
      .select($"keep_id", $"n_dups", $"n_chars")
      .orderBy($"keep_id")
  }

  // ---- Q36: near-dup pairs, exact Jaccard >= 0.7 on token sets --------
  // Physical strategy is chosen by vocabulary size (one tiny distinct
  // count up front):
  //  * vocab <= 62  → encode each token set as an int64 bitmask, dedupe
  //    masks, compare distinct masks pairwise with bit_count arithmetic
  //    (columnar, no row explosion), then expand back to doc pairs.
  //  * otherwise    → inverted-index token join (explode tokens, equi-join
  //    on token, count co-occurrences) — the standard scalable set-join.
  // Both paths produce the exact-Jaccard pair set; only candidates are
  // pruned differently.
  def q36(s: SparkSession, dir: String): DataFrame =
    neardupPairs(docs(s, dir).select(col("doc_id"), col("toks")))

  /** Core of Q36 over any (doc_id, toks) frame; `forceInverted` pins the
    * generic inverted-index path (used by tests — the driver data's
    * 31-token vocabulary always takes the bitmask path otherwise).
    *
    * Dispatch guards on BOTH shape statistics: `vocab ≤ 62` makes the
    * bitmask encodable, but does not bound the number of DISTINCT masks
    * the pairwise comparison below is quadratic in (a 62-token vocab
    * admits 2^62 distinct sets), so the bitmask path additionally
    * requires distinct-mask count ≤ `maxDistinctMasks` — above that the
    * inverted-index token join is the right plan. */
  private[graft] def neardupPairs(docsWithToks: DataFrame,
      threshold: Double = 0.7, forceInverted: Boolean = false,
      maxDistinctMasks: Long = 16384, sorted: Boolean = true): DataFrame = {
    val s = docsWithToks.sparkSession
    import s.implicits._
    val d = docsWithToks.select($"doc_id", $"toks", size($"toks").as("sz"))
    val tok = d.select($"doc_id", explode($"toks").as("tok"))

    val masks =
      if (forceInverted) None
      else tokenBitmasks(d.select($"doc_id", $"toks")).filter { m =>
        // distinct masks ≤ doc count, so a cheap row count short-circuits
        // the (heavier) distinct-mask count when it can't exceed the cap
        graft.Hygiene.labeled(s, "neardup: mask-regime guard")(
          d.count() <= maxDistinctMasks ||
            m.select($"mask").distinct().count() <= maxDistinctMasks)
      }
    val pairs = masks match {
      case Some(masks) =>
        // mask 0 (empty/all-null token set) pairs with NOTHING — the
        // inverted path drops such docs for free (no token rows to
        // join), and here a 0-0 pair would make the Jaccard
        // denominator zero
        val groups = masks.filter($"mask" =!= 0L).groupBy($"mask")
          .agg(sort_array(collect_list($"doc_id")).as("ids"),
            bit_count($"mask").cast("double").as("sz"))
        val g1 = groups.as("g1")
        val g2 = groups.as("g2")
        g1.join(g2, $"g1.mask" <= $"g2.mask")
          .withColumn("inter", bit_count($"g1.mask".bitwiseAND($"g2.mask")).cast("double"))
          .withColumn("jac", $"inter" / ($"g1.sz" + $"g2.sz" - $"inter"))
          .filter($"jac" >= threshold)
          .select($"g1.mask".as("m1"), $"g2.mask".as("m2"),
            explode($"g1.ids").as("a"), $"g2.ids", $"jac")
          .select($"m1", $"m2", $"a", explode($"g2.ids").as("b"), $"jac")
          // same-mask group joined to itself once: keep a<b; distinct
          // masks: every cross pair is valid, canonicalize to (min,max).
          .filter($"m1" < $"m2" || $"a" < $"b")
          .select(least($"a", $"b").as("doc_a"), greatest($"a", $"b").as("doc_b"),
            round($"jac", 6).as("jaccard"))
      case None =>
        val x = tok.join(d.select($"doc_id", $"sz"), "doc_id")
        x.as("x").join(x.as("y"),
            $"x.tok" === $"y.tok" && $"x.doc_id" < $"y.doc_id")
          .groupBy($"x.doc_id".as("a"), $"y.doc_id".as("b"),
            $"x.sz".as("sza"), $"y.sz".as("szb"))
          .agg(count(lit(1)).cast("double").as("inter"))
          .withColumn("jac", $"inter" / ($"sza" + $"szb" - $"inter"))
          .filter($"jac" >= threshold)
          .select($"a".as("doc_a"), $"b".as("doc_b"), round($"jac", 6).as("jaccard"))
      }
    if (sorted) pairs.orderBy($"doc_a", $"doc_b") else pairs
  }
  val q36Sql: String =
    """WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      |           FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.7
      |ORDER BY doc_a, doc_b""".stripMargin

  /** The near-dup graph CONTRACTED over identical-token-set groups:
    * `(membership (doc_id, rep), repEdges (src, dst))` with rep = min
    * doc_id of each identical set group. For clustering (q57/q80) the
    * clique-expanded doc-pair relation q36's declared output requires
    * is pure waste — identical-set groups are intra-component by
    * definition — so this derivation stops BEFORE the group explode:
    * at sf0.1, 2.3M rep edges instead of 5.1M doc pairs, and on the
    * bitmask path no doc-level pair relation is ever materialized
    * (measured: q57 9.3 s → 6.0 s). The jaccard test is byte-identical
    * to [[neardupPairs]]' bitmask branch (ClusteringSpec ties the
    * resulting components to a union-find over q36's pairs). */
  private[graft] def neardupGraph(docsWithToks: DataFrame,
      threshold: Double = 0.7, forceInverted: Boolean = false,
      maxDistinctMasks: Long = 16384): (DataFrame, DataFrame) = {
    val s = docsWithToks.sparkSession
    import s.implicits._
    val d = docsWithToks.select($"doc_id", $"toks", size($"toks").as("sz"))
    val masks =
      if (forceInverted) None
      else tokenBitmasks(d.select($"doc_id", $"toks")).filter { m =>
        graft.Hygiene.labeled(s, "neardup: mask-regime guard")(
          d.count() <= maxDistinctMasks ||
            m.select($"mask").distinct().count() <= maxDistinctMasks)
      }
    masks match {
      case Some(masks) =>
        // empty-set docs (mask 0) pair with NOTHING in the exact pair
        // semantics (jaccard(∅,∅) is 0/0-undefined, and q36 emits no
        // such pair), so each must stay its OWN singleton component —
        // the per-doc discriminator keeps them out of a shared
        // identical-set group (which would mislabel them as one cluster
        // and let canonical-keep silently drop all but one)
        val groups = masks.groupBy($"mask",
            when($"mask" === 0L, $"doc_id").otherwise(lit(0L)).as("__e"))
          .agg(min($"doc_id").as("rep"),
            collect_list($"doc_id").as("ids"),
            bit_count($"mask").cast("double").as("sz"))
        val membership = groups.select(explode($"ids").as("doc_id"), $"rep")
        val g1 = groups.as("g1")
        val g2 = groups.as("g2")
        // strict < : a group joined to itself is membership, not an edge
        // (two mask-0 groups tie on mask, so empties never edge either)
        val repEdges = g1.join(g2, $"g1.mask" < $"g2.mask")
          .withColumn("inter",
            bit_count($"g1.mask".bitwiseAND($"g2.mask")).cast("double"))
          // zero-denominator guard (two mask-0 groups): the jac filter
          // gets MERGED into the nested-loop join condition, where
          // conjunct order is unspecified — without the when(), the
          // division can evaluate before the mask< conjunct rejects the
          // (0, 0) candidate row and throw DIVIDE_BY_ZERO under ANSI
          .withColumn("den", $"g1.sz" + $"g2.sz" - $"inter")
          .withColumn("jac", when($"den" > 0, $"inter" / $"den"))
          .filter($"jac" >= threshold)
          .select($"g1.rep".as("src"), $"g2.rep".as("dst"))
        (membership, repEdges)
      case None =>
        // generic path: no mask groups — contract the doc-pair relation
        // through identical-sorted-set membership instead; empty sets
        // get the same per-doc discriminator (singletons, as above)
        val membership = d
          .select($"doc_id", $"sz",
            sort_array($"toks").cast("string").as("setkey"))
          .withColumn("rep", min($"doc_id").over(
            Window.partitionBy($"setkey",
              when($"sz" === 0, $"doc_id").otherwise(lit(-1L)))))
          .select($"doc_id", $"rep")
        val pairs = neardupPairs(docsWithToks, threshold,
          forceInverted = true, sorted = false)
        val m1 = membership.select($"doc_id".as("doc_a"), $"rep".as("rep_a"))
        val m2 = membership.select($"doc_id".as("doc_b"), $"rep".as("rep_b"))
        val repEdges = pairs.join(m1, "doc_a").join(m2, "doc_b")
          .filter($"rep_a" =!= $"rep_b")
          .select($"rep_a".as("src"), $"rep_b".as("dst")).distinct()
        (membership, repEdges)
    }
  }

  /** Survivor ids of the greedy near-dup retention policy (q76): doc
    * `d` survives iff NO smaller `doc_id` is a Jaccard ≥ `threshold`
    * near-dup of it. On the bitmask path this needs NO doc-pair
    * relation at all: jaccard depends only on the mask group, so with
    * `m(g)` = min doc of group `g` and `n(g)` = min over qualifying
    * neighbor groups of their `m`, every non-min group member is
    * dropped by `m(g)` (identical sets are jac-1 pairs) and the group
    * min survives iff `n(g) ≥ m(g)`. The derivation joins the
    * group-level relation (≤ `maxDistinctMasks` rows) instead of
    * expanding the 5.1M-doc-pair cliques q36's declared output
    * requires — the same contraction [[neardupGraph]] uses for
    * clustering, specialized to the keep-earliest policy. */
  private[graft] def greedySurvivors(docsWithToks: DataFrame,
      threshold: Double = 0.7, forceInverted: Boolean = false,
      maxDistinctMasks: Long = 16384): DataFrame = {
    val s = docsWithToks.sparkSession
    import s.implicits._
    val d = docsWithToks.select($"doc_id", $"toks")
    val masks =
      if (forceInverted) None
      else tokenBitmasks(d.select($"doc_id", $"toks")).filter { m =>
        graft.Hygiene.labeled(s, "neardup: mask-regime guard")(
          d.count() <= maxDistinctMasks ||
            m.select($"mask").distinct().count() <= maxDistinctMasks)
      }
    masks match {
      case Some(masks) =>
        // empty-set docs (mask 0) pair with nothing, so the policy
        // keeps them ALL — the group-min rule below must not see them
        // (it would treat them as a jac-1 identical-set group). Their
        // ids are collected INSIDE this one aggregate (collect_list
        // skips the nulls the `when` emits for every nonzero group) so
        // the mask fold runs exactly once — a second `masks` reference
        // would recompute the whole map-side fold (measured +1 s at
        // sf0.1). The zero group is degenerate-corpus-only, so the
        // collected list is empty in practice.
        val groupsAll = masks.groupBy($"mask")
          .agg(min($"doc_id").as("m"),
            bit_count($"mask").cast("double").as("sz"),
            collect_list(when($"mask" === 0L, $"doc_id")).as("zids"))
        val groups = groupsAll.filter($"mask" =!= 0L)
          .select($"mask", $"m", $"sz")
        val g1 = groups.as("g1")
        val g2 = groups.as("g2")
        // qualifying neighbor-group pairs (strict <: a group's own
        // members are handled by the m(g) rule below); each pair feeds
        // the neighbor-min aggregate in BOTH directions via a 2-row
        // explode — NOT a union of two projections, which would run the
        // quadratic group join twice (measured +0.3 s at sf0.1)
        val n = g1.join(g2, $"g1.mask" < $"g2.mask")
          .withColumn("inter",
            bit_count($"g1.mask".bitwiseAND($"g2.mask")).cast("double"))
          .withColumn("jac", $"inter" / ($"g1.sz" + $"g2.sz" - $"inter"))
          .filter($"jac" >= threshold)
          .select(explode(array(
            struct($"g1.mask".as("mask"), $"g2.m".as("nm")),
            struct($"g2.mask".as("mask"), $"g1.m".as("nm")))).as("e"))
          .groupBy($"e.mask".as("mask")).agg(min($"e.nm").as("n"))
        groups.join(n, Seq("mask"), "left")
          .filter($"n".isNull || $"n" >= $"m")
          .select($"m".as("doc_id"))
          .unionByName(groupsAll.filter($"mask" === 0L)
            .select(explode($"zids").as("doc_id")))
      case None =>
        // generic path: the inverted-index pair relation is the plan,
        // and the drop side is its distinct doc_b set
        d.select($"doc_id").join(
          neardupPairs(docsWithToks, threshold, forceInverted = true,
            sorted = false).select($"doc_b".as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
    }
  }

  /** Cosine similarity between two double arrays via codegen'd HOFs:
    * element-order-sequential reduction (SURVEY rule §2.C.0.4). */
  def cosineCols(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0), (acc, x) => acc + x * x)
    val nb = aggregate(b, lit(0.0), (acc, x) => acc + x * x)
    // ill-formed-vector contract (r9 adversarial finding): a zero-norm
    // vector DIVIDE_BY_ZERO-failed the whole job under ANSI, and a
    // NaN component made the score NaN (whose ordering differs across
    // engines). Scores are NULL — defined, portable, never ranked
    // ([[topKByScore]] filters) and never paired (null >= t is false)
    cosineGuard(dot / nullif(sqrt(na) * sqrt(nb), lit(0.0)))
  }

  /** NaN → NULL for similarity scores: the one place the r9
    * ill-formed-vector contract is encoded (null vectors and null
    * components already propagate NULL through the arithmetic). */
  def cosineGuard(score: Column): Column =
    nanvl(score, lit(null).cast("double"))

  /** Indexable-vector predicate (the r9 contract's other half): ANN
    * index builders and their query sides drop vectors that can never
    * produce a rankable score — null, containing null or NaN
    * components, or zero-norm. Brute-force paths reach the same end
    * through [[cosineGuard]] + [[topKByScore]]'s null filter; index
    * paths must drop them EARLY because a null embedding NPEs the
    * k-means sampler before any score exists. */
  def wellFormedVec(v: Column): Column =
    v.isNotNull &&
      !exists(v, x => x.isNull || isnan(x)) &&
      exists(v, x => x =!= 0.0)

  // ---- Q37: brute-force cosine top-k (k=10) for query vectors 0,1,2 ---
  // The 3 query vectors are broadcast; every data partition scores its
  // vectors locally, then TopKPerGroup's PARTIAL pass keeps a bounded
  // k-heap per (partition, query) BEFORE the exchange — so only
  // k × |queries| rows per input partition cross the wire, instead of
  // every scored row shuffling into |queries| partitions the way a
  // row_number window would.
  def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val q = emb.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val scored = emb.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        round(cosineCols($"qv", $"v"), 6).as("score"))
    topKByScore(scored, 10)
  }

  /** Shared final stage of the similarity searches: top-k rows per
    * `query_id` by (score desc, vec_id), ranked, via the bounded-heap
    * TopKPerGroup operator (partial pre-shuffle pass — the scale-safe
    * formulation; see plans/TopKPerGroup.scala). Input must have columns
    * (query_id, vec_id, score). */
  private[graft] def topKByScore(scored: DataFrame, k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    // NULL scores (ill-formed vectors, per the cosineGuard contract)
    // never rank — the oracles filter identically before ROW_NUMBER
    graft.plans.GraftOps.topKPerGroup(scored.filter($"score".isNotNull), k,
      Seq("query_id"),
      Seq(graft.plans.GraftOps.Order("score", desc = true),
        graft.plans.GraftOps.Order("vec_id")), rankName = "rnk")
      .select($"query_id", $"rnk", $"vec_id", $"score")
      .orderBy($"query_id", $"rnk")
  }
  val q37Sql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0,1,2)),
      |s AS (SELECT q.query_id, e.vec_id,
      |        round(
      |          list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * v[i]), (a,b) -> a + b)
      |          / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]), (a,b) -> a + b))
      |           * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (a,b) -> a + b))), 6) AS score
      |      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      |r AS (SELECT query_id, vec_id, score,
      |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      |      FROM s WHERE score IS NOT NULL AND NOT isnan(score))
      |SELECT query_id, rnk, vec_id, score FROM r WHERE rnk <= 10
      |ORDER BY query_id, rnk""".stripMargin

  // ---- Q38: token statistics per language -----------------------------
  def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables(s, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("token"))
    val counts = tok.groupBy($"lang", $"token").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy($"lang")
      .agg(sum($"n").as("total_tokens"), count(lit(1)).as("distinct_tokens"))
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"token")
    counts.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .join(totals, "lang")
      .select($"lang", $"rnk", $"token", $"n", $"total_tokens", $"distinct_tokens")
      .orderBy($"lang", $"rnk")
  }
  val q38Sql: String =
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
      |c AS (SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token),
      |t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS total_tokens, COUNT(*) AS distinct_tokens
      |      FROM c GROUP BY lang),
      |r AS (SELECT lang, token, n,
      |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
      |      FROM c)
      |SELECT lang, rnk, token, n, total_tokens, distinct_tokens
      |FROM r JOIN t USING (lang) WHERE rnk <= 5
      |ORDER BY lang, rnk""".stripMargin

  // ---- Q39: TF-IDF, fixed formula (SURVEY contract) -------------------
  // tf = count(term in doc); idf = ln((N+1)/(df+1)) + 1; ranking uses the
  // ROUNDED score so cross-engine float noise cannot reorder ties.
  def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables(s, dir, "documents")
    val n = d.count()
    val term = d.select($"doc_id", explode(split($"text", " ")).as("term"))
    val tf = term.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    tf.filter($"doc_id" < 50)
      .join(df, "term")
      .withColumn("score",
        round($"tf" * (log((lit(n) + 1.0) / ($"df" + 1.0)) + 1.0), 6))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"rnk", $"term", $"tf", $"score")
      .orderBy($"doc_id", $"rnk")
  }
  val q39Sql: String =
    """WITH term AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM term GROUP BY doc_id, term),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
      |         round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS score
      |       FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
      |       WHERE tf.doc_id < 50),
      |r AS (SELECT doc_id, term, tf, score,
      |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
      |      FROM sc)
      |SELECT doc_id, rnk, term, tf, score FROM r WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  // ---- Q40: nested struct/array columns, parquet round-trip -----------
  def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nested = Tables(s, dir, "documents")
      .groupBy($"source")
      .agg(sort_array(collect_list(struct($"doc_id", $"lang", $"n_chars")))
        .as("records"))
    // exercise ArrayType(StructType) round-trip through parquet
    val tmp = graft.RunTmp.dir("q40_nested")
    nested.write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp)
      .select($"source", posexplode($"records").as(Seq("pos", "rec")))
      .select($"source", ($"pos" + 1).cast("long").as("pos"),
        $"rec.doc_id".as("doc_id"), $"rec.lang".as("lang"),
        $"rec.n_chars".as("n_chars"))
      .orderBy($"source", $"pos")
  }
  val q40Sql: String =
    """SELECT source,
      |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS pos,
      |  doc_id, lang, n_chars
      |FROM documents ORDER BY source, pos""".stripMargin
}
