package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline operators round 3: text normalization and near-dup
  * clustering (the consumer of the near-dup pair sets Q36/Q47 emit).
  */
object LlmOps3 {

  // ---- Q56: text normalization (canonical form + digest) --------------
  def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("norm",
        trim(regexp_replace(regexp_replace(lower($"text"), "[0-9]+", ""),
          "\\s+", " ")))
      .select($"doc_id", length($"norm").as("norm_len"),
        sha2(encode($"norm", "UTF-8"), 256).as("norm_digest"))
      .orderBy($"doc_id")
  }
  val q56Sql: String =
    """SELECT doc_id,
      |  length(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'), '\s+', ' ', 'g'))) AS norm_len,
      |  sha256(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'), '\s+', ' ', 'g'))) AS norm_digest
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- Q62: deterministic train/val/test split by content hash --------
  // The standard reproducible-split trick: bucket on a portable content
  // hash, not on row order or RNG state — the same document lands in
  // the same split on any engine, any partitioning, any rerun.
  def q62(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("h", graft.functions.RollingHash.rollingHash($"text", 64))
      .withColumn("split",
        when($"h" % 100 < 80, "train")
          .when($"h" % 100 < 90, "valid")
          .otherwise("test"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"split", $"lang")
  }
  val q62Sql: String =
    """WITH h AS (
      |  SELECT lang, n_chars,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, least(len(text), 64)),
      |                       i -> CAST(ascii(text[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
      |  FROM documents)
      |SELECT CASE WHEN h % 100 < 80 THEN 'train'
      |            WHEN h % 100 < 90 THEN 'valid' ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM h GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  // ---- Q63: deterministic pseudo-shuffle (reproducible training order) -
  def q63(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("h", graft.functions.RollingHash.rollingHash($"text", 64))
      .withColumn("shuffle_key", expr("(h * 2654435761) % 2147483647"))
      .select($"doc_id", $"shuffle_key")
      // NULLS LAST pinned on BOTH sides (adversarial-harness finding):
      // a null-text doc has a null shuffle key, and Spark's ascending
      // default (NULLS FIRST) vs DuckDB's (NULLS LAST) silently moved
      // it in and out of the LIMIT window. Convention: degenerate docs
      // sort last and never steal sample/order slots.
      .orderBy($"shuffle_key".asc_nulls_last, $"doc_id")
      .limit(100)
  }
  val q63Sql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, least(len(text), 64)),
      |                       i -> CAST(ascii(text[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
      |  FROM documents)
      |SELECT doc_id, (h * 2654435761) % 2147483647 AS shuffle_key
      |FROM h ORDER BY shuffle_key NULLS LAST, doc_id LIMIT 100""".stripMargin

  // ---- Q64: deterministic sequence packing ----------------------------
  // Training-data op: pack documents into fixed-token-budget bins
  // ("sequences") for LLM training. Scale-safe shape: packing runs
  // independently per content-hash shard (a global greedy pack would
  // need a total order over 100 TB — a non-starter), so the window
  // cumsum is partitioned, embarrassingly parallel, and deterministic
  // on any engine: shard = hash(text) % 8, order by doc_id within
  // shard, contiguous-fill bins of 512 tokens. Shard count is pinned
  // to 8 here because it is part of the DECLARED output (the oracle
  // computes the same shards); at 100 TB the shard modulus scales with
  // the cluster (thousands) — it's data layout, not semantics, and
  // parallelism equals the shard count.
  def q64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = 512
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables(s, dir, "documents")
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .withColumn("shard",
        graft.functions.RollingHash.rollingHash($"text", 64) % 8)
      .withColumn("cum", sum($"n_tokens").over(w))
      // bin of the POSITION where this doc ends: contiguous fill
      // (integer `div`, matching DuckDB's `//` — Spark's `/` is double)
      .withColumn("bin", expr(s"(cum - 1) div $budget"))
      .groupBy($"shard", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("bin_tokens"),
        min($"doc_id").as("first_doc"))
      // null-text docs form the (NULL, NULL) bin on both engines; its
      // POSITION is pinned NULLS LAST (the q63 convention)
      .orderBy($"shard".asc_nulls_last, $"bin".asc_nulls_last)
  }
  val q64Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, least(len(text), 64)),
      |                       i -> CAST(ascii(text[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) % 8 AS shard
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens, shard,
      |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t)
      |SELECT shard, CAST((cum - 1) // 512 AS BIGINT) AS bin, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens, MIN(doc_id) AS first_doc
      |FROM c GROUP BY shard, bin
      |ORDER BY shard NULLS LAST, bin NULLS LAST""".stripMargin

  // ---- Q65: deterministic stratified sample ---------------------------
  // Per-language quota sampling by content hash: the same document is
  // in or out on any engine, any partitioning, any rerun (no RNG), and
  // strata rates differ per class — the standard rebalancing primitive.
  def q65(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("h",
        graft.functions.RollingHash.rollingHash($"text", 64) % 100)
      .withColumn("rate", when($"lang" === "en", 80).otherwise(30))
      .filter($"h" < $"rate")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_sampled"), min($"doc_id").as("first_doc"),
        sum($"n_chars").as("sampled_chars"))
      .orderBy($"lang")
  }
  val q65Sql: String =
    """WITH h AS (
      |  SELECT doc_id, lang, n_chars,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, least(len(text), 64)),
      |                       i -> CAST(ascii(text[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) % 100 AS h
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc,
      |  CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
      |FROM h WHERE h < CASE WHEN lang = 'en' THEN 80 ELSE 30 END
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- Q57: near-dup clusters — connected components ------------------
  // Min-label propagation + pointer jumping over the Jaccard≥0.7 pair
  // graph: every doc starts as its own label; each round takes the min
  // label over its neighborhood (one shuffle join), then path-halves by
  // replacing its label with that node's label (a second join). The
  // jump preserves the invariant "my label is the id of a node in my
  // component with id ≤ my previous label", so the fixed point is
  // unchanged (component-min labels), but long chains collapse in
  // O(log diameter) rounds instead of O(diameter). Lineage is truncated
  // per round (localCheckpoint) so the plan does not grow with
  // iterations — the standard large-graph CC shape when a graph library
  // isn't warranted. Cluster id = min doc_id in the component.
  def q57(s: SparkSession, dir: String): DataFrame =
    q57From(s, clusterLabels(s, dir))

  /** q57 from an already-materialized label relation (see
    * [[clusterLabels]] / `Graft.nearDupLabels`): component sizes only —
    * no propagation rounds. */
  def q57From(s: SparkSession, labels: DataFrame): DataFrame = {
    import s.implicits._
    labels
      .groupBy($"label")
      .agg(count(lit(1)).as("cluster_size"))
      .select($"label".as("cluster_id"), $"cluster_size")
      .orderBy($"cluster_id")
  }

  /** Connected-component labels (doc_id, label) over the exact Jaccard
    * ≥ 0.7 near-dup graph; label = min doc_id in the component. Shared
    * by q57 (component sizes) and q80 (cluster-canonical retention).
    *
    * The returned frame is `localCheckpoint`ed — the propagation rounds
    * have already run and their result is pinned, so downstream
    * consumers (q57From/q80From, or both) reuse it without re-running
    * the graph computation. This is the materialize-once entry point a
    * real pipeline should call (via `Graft.nearDupLabels`) when it
    * needs more than one view over the same clustering; the standalone
    * q57/q80 remain for per-query verification. */
  def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Work on the CONTRACTED near-dup graph: identical-token-set groups
    // are intra-component by definition, so propagation runs over group
    // representatives (LlmOps.neardupGraph stops before q36's clique
    // expansion — at sf0.1 that is 2.3M rep edges instead of 5.1M doc
    // pairs and no doc-level pair relation at all), and membership
    // rejoins the labels afterwards. label(doc) = label(rep) and the
    // component min is always a rep (every group min is its rep), so
    // the output is byte-identical to propagating over all docs.
    // Measured at sf0.1 (cold TimeQuery): 9.3 s → 6.0 s; the remaining
    // floor is the mask-group pair join itself (the same ~8M-comparison
    // non-equi compare q36 pays) plus one propagation round over the
    // 2.3M-edge rep graph.
    clusterLabelsFor(LlmOps.docTokens(s, dir))
  }

  /** [[clusterLabels]] over an arbitrary `(doc_id, toks)` frame
    * (facade: `Graft.nearDupLabelsFor`): contracted graph → connected
    * components ([[graft.operators.ConnectedComponents]]: min-label +
    * pointer jumping, per-round edge contraction, checkpointed
    * lineage, broadcast label side under the node cap) → membership
    * rejoin. */
  def clusterLabelsFor(docsWithToks: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val s = docsWithToks.sparkSession
    import s.implicits._
    val (membershipRaw, repEdges) =
      LlmOps.neardupGraph(docsWithToks, threshold)
    val membership = membershipRaw.persist()
    val repLabels = graft.operators.ConnectedComponents.labels(
      membership.select($"rep".as("id")).distinct(),
      repEdges)
    // finally: a failed checkpoint job must not leak the persist
    try membership
      .join(repLabels, membership("rep") === repLabels("id"))
      .select($"doc_id", $"label")
      .localCheckpoint()
    finally membership.unpersist()
  }

  // ---- Q80: cluster-canonical retention ------------------------------
  // The transitive counterpart of q76's greedy retention: keep exactly
  // one document (the min doc_id) per connected component of the
  // near-dup graph. Unlike q76, a doc with only DROPPED near-dup
  // neighbors is still dropped if it's not its component's min — chains
  // collapse to a single survivor. Cost beyond the q57 labels: one
  // filter (label == doc_id, i.e. "I am my component's canonical") and
  // one join back to the documents table.
  def q80(s: SparkSession, dir: String): DataFrame =
    q80From(s, dir, clusterLabels(s, dir))

  /** q80 from an already-materialized label relation: one filter
    * (label == doc_id, "I am my component's canonical") and one join
    * back to documents — no propagation rounds. */
  def q80From(s: SparkSession, dir: String, labels: DataFrame): DataFrame = {
    import s.implicits._
    val canonical = labels
      .filter($"doc_id" === $"label").select($"doc_id")
    Tables(s, dir, "documents")
      .join(canonical, "doc_id")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }
}
