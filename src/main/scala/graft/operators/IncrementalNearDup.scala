package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental exact near-dup detection — the daily-increment shape of
  * the corpus dedup family: given an existing `corpus` and a new
  * `delta` batch, produce every exact-Jaccard pair INTRODUCED by the
  * delta (at least one end new), without ever comparing corpus docs to
  * each other. The reference's near-dup surface (q36/q44's all-pairs
  * declarations) rescans the whole corpus per run; at 100 TB the
  * corpus×corpus half of that join is the cost that makes per-increment
  * reruns infeasible, and it is also pure waste — those pairs were
  * already known after the previous run.
  *
  * Plan: one inverted-index equi-join whose PROBE side is the delta's
  * postings only. The index side is corpus ∪ delta (the delta must see
  * both old and new partners), so the join's candidate volume is
  *   Σ_tok df_all(tok) · df_delta(tok)
  * instead of Σ_tok df_all(tok)², i.e. proportional to the increment,
  * not the corpus (IncrementalNearDupSpec pins the exact incidence
  * count through the join's numOutputRows metric). Corpus postings
  * appear only as the build side of the equi-join — in production the
  * corpus half is precomputed once (stored tokenized / bucketed by
  * token) and only the delta is ever tokenized again.
  *
  * Orientation: old–new pairs are produced exactly once (the old doc is
  * always on the index side of the surviving row); new–new pairs are
  * restricted to `x.doc_id < y.doc_id` so the symmetric probe does not
  * double-count them. Output is canonicalized (doc_a < doc_b) either
  * way, so the result is literally the full-corpus pair set filtered to
  * pairs touching the delta (the equivalence the spec asserts against
  * `LlmOps.neardupPairs`).
  */
object IncrementalNearDup {

  /** Exact-Jaccard ≥ `threshold` pairs `(doc_a < doc_b, jaccard)` with
    * at least one end in `delta`. Both inputs: `(doc_id, toks)` rows
    * with per-doc DISTINCT tokens (pre-deduplicate with
    * `array_distinct`, as every caller of `neardupPairs` does) and
    * globally unique doc ids across `corpus ∪ delta`. Docs with empty
    * token sets pair with nothing (no postings to join — the same
    * contract as the inverted-index path of q36). */
  def newPairs(corpus: DataFrame, delta: DataFrame,
      threshold: Double = 0.7, sorted: Boolean = true): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val pairs = candidateIncidences(corpus, delta)
      .groupBy(least($"x.doc_id", $"y.doc_id").as("doc_a"),
        greatest($"x.doc_id", $"y.doc_id").as("doc_b"),
        $"x.sz".as("szx"), $"y.sz".as("szy"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .withColumn("jac", $"inter" / ($"szx" + $"szy" - $"inter"))
      .filter($"jac" >= threshold)
      .select($"doc_a", $"doc_b", round($"jac", 6).as("jaccard"))
    if (sorted) pairs.orderBy($"doc_a", $"doc_b") else pairs
  }

  /** The raw candidate-incidence relation of [[newPairs]] — one row per
    * (pair, shared token), before the per-pair aggregation. Exposed for
    * the spec's scale pin: its row count must equal
    * Σ_tok (df_all·df_delta − df_delta − C(df_delta, 2)), the
    * delta-bounded volume — NOT the full sweep's Σ_tok C(df_all, 2). */
  private[graft] def candidateIncidences(corpus: DataFrame,
      delta: DataFrame): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val c = corpus.select($"doc_id", $"toks",
      size($"toks").cast("double").as("sz"), lit(false).as("is_new"))
    val n = delta.select($"doc_id", $"toks",
      size($"toks").cast("double").as("sz"), lit(true).as("is_new"))
    val tokAll = c.unionByName(n)
      .select($"doc_id", $"sz", $"is_new", explode($"toks").as("tok"))
    val tokNew = n.select($"doc_id", $"sz", explode($"toks").as("tok"))
    // x = index side (old ∪ new), y = probe side (new only).
    //  - x.doc_id =!= y.doc_id: a doc never pairs with itself;
    //  - !x.is_new || x.doc_id < y.doc_id: an old–new pair matches on
    //    exactly one (x=old, y=new) orientation and is kept; a new–new
    //    pair matches on both orientations and only the ordered one
    //    survives. The grouping key in [[newPairs]] is therefore
    //    consistent per pair (x is the old end, or the smaller new id),
    //    so each shared token contributes exactly one row to exactly
    //    one group.
    tokAll.as("x").join(tokNew.as("y"),
      $"x.tok" === $"y.tok" && $"x.doc_id" =!= $"y.doc_id" &&
        (!$"x.is_new" || $"x.doc_id" < $"y.doc_id"))
  }
}
