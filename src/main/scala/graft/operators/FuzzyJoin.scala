package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy self-join on a string key within Levenshtein distance `d`,
  * without the O(n²) cross join — the d-deletion-neighborhood (SymSpell)
  * banding generalized from the d=1 case proven out in
  * [[graft.queries.LlmOps5.q95]].
  *
  * Banding lemma (DeletionNeighborhoodProps pins d=1 and d=2): with
  * N_d(s) = all strings reachable from s by deleting AT MOST d
  * characters, lev(a,b) ≤ d implies N_d(a) ∩ N_d(b) ≠ ∅ — align an
  * optimal edit script and delete, on each side, the characters the
  * script substitutes/inserts there; ≤ d deletions per side meet at a
  * common subsequence. The converse is false (shared variants at
  * lev > d exist), so candidates are verified with an exact
  * `levenshtein(a, b, d)` — early-exit DP, returns −1 past the bound —
  * and false candidates cost time, never correctness.
  *
  * Scale shape (the 100 TB design, measured at d=1 in q95):
  *  - variants are derived MAP-SIDE (nested HOFs) and `array_distinct`ed
  *    before the explode — deletions inside equal-character runs
  *    collide, and duplicate variants multiply the join quadratically
  *    per bucket;
  *  - the join is hinted `shuffle_hash`: the variant relation is
  *    key-count × C(|key|, ≤d) rows, too big to broadcast at scale, and
  *    SHJ avoids SMJ's sort on a high-cardinality string key (measured
  *    3× at d=1);
  *  - the exact verify runs BEFORE the pair-level distinct, so the one
  *    wide op downstream of the join shuffles survivors only;
  *  - the explode factor at d=2 is 1 + L + C(L,2) (~172 for L=18).
  *    Real SymSpell deployments cap it with the prefix trick (band on
  *    the first P≈7–10 characters' neighborhoods only, at a small
  *    recall cost for edits beyond the prefix); kept full-key here so
  *    recall stays provably complete.
  */
object FuzzyJoin {

  /** SQL expression: all strings reachable from `keyCol` by deleting at
    * most `d` characters, distinct. Level k is derived from level k−1
    * (delete one more character); the CASE guards the empty string —
    * Spark's `sequence(1, 0)` is the DESCENDING [1, 0], not empty. */
  private[graft] def variantsExpr(keyCol: String, d: Int): String = {
    require(d >= 1, s"fuzzy join distance must be >= 1, got $d")
    def deletions(of: String, idx: String): String =
      s"""CASE WHEN length($of) = 0 THEN CAST(array() AS ARRAY<STRING>)
          ELSE transform(sequence(1, length($of)),
            $idx -> concat(substring($of, 1, $idx - 1), substring($of, $idx + 1)))
          END"""
    var levels = List(s"array($keyCol)")
    (1 to d).foreach { k =>
      levels ::= s"array_distinct(flatten(transform(${levels.head}, " +
        s"v$k -> ${deletions(s"v$k", s"i$k")})))"
    }
    s"array_distinct(concat(${levels.reverse.mkString(", ")}))"
  }

  /** All key pairs of `keys`'s `keyCol` column within Levenshtein
    * distance `maxDist` (1 ≤ dist ≤ maxDist; equal keys are not pairs).
    * Output: (name_a, name_b, dist) with name_a < name_b, distinct. */
  def selfJoin(keys: DataFrame, keyCol: String, maxDist: Int): DataFrame = {
    val s = keys.sparkSession
    import s.implicits._
    // the lambda-bearing variant plan is recomputed on both join sides
    // (NamedLambdaVariable ids defeat ReuseExchange); recomputing the
    // cheap map-side explode beats persist + eager-cut (q95's measured
    // lesson — the cache only pays when the re-derived lineage is
    // itself expensive)
    val variants = keys.select(col(keyCol).as("name"))
      .withColumn("v", explode(expr(variantsExpr("name", maxDist))))
      .hint("shuffle_hash")
    variants.select($"name".as("name_a"), $"v")
      .join(variants.select($"name".as("name_b"), $"v"), "v")
      .filter($"name_a" < $"name_b")
      // bounded DP: levenshtein(a, b, t) early-exits at t (returns −1)
      .withColumn("dist", levenshtein($"name_a", $"name_b", maxDist))
      .filter($"dist" >= 1)
      .select($"name_a", $"name_b", $"dist").distinct()
  }

  /** Column form of the d-deletion neighborhood over a named column
    * (exposed for reuse in dictionary-style one-sided joins: band a
    * query key against a pre-exploded dictionary). */
  def deletionNeighborhood(keyCol: String, d: Int): Column =
    expr(variantsExpr(keyCol, d))

  /** Dictionary lookup (the classic SymSpell shape): for every query
    * key, all dictionary keys within Levenshtein distance `maxDist`
    * (including exact hits at dist 0). Both sides explode their
    * ≤`maxDist`-deletion neighborhoods and equi-join on the variant —
    * recall-complete by the banding lemma — then verify exactly.
    * Output: (query, match, dist), distinct.
    *
    * At scale the dictionary side is the one worth materializing: its
    * exploded neighborhood is reusable across query batches (persist it
    * or write it out keyed by variant), after which each lookup batch
    * is one equi-join — no per-query scan of the dictionary. */
  def lookupJoin(queries: DataFrame, queryCol: String,
      dictionary: DataFrame, dictCol: String, maxDist: Int): DataFrame = {
    val s = queries.sparkSession
    import s.implicits._
    val q = queries.select(col(queryCol).as("query"))
      .withColumn("v", explode(expr(variantsExpr("query", maxDist))))
    val d = dictionary.select(col(dictCol).as("match"))
      .withColumn("v", explode(expr(variantsExpr("match", maxDist))))
      .hint("shuffle_hash")
    q.join(d, "v")
      .withColumn("dist", levenshtein($"query", $"match", maxDist))
      .filter($"dist" >= 0)
      .select($"query", $"match", $"dist").distinct()
  }
}
