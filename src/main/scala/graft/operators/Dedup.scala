package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frame-shaped dedup/retention primitives — the facade's
  * works-on-your-own-tables versions of the fixture-bound q35/q76
  * pipeline queries. */
object Dedup {

  /** Exact dedup: one row per distinct `textCol` value, keeping the row
    * with the minimum `idCol` (q35Hash's digest-first shape: the dedup
    * shuffle carries a 32-byte SHA-256 key, never the documents —
    * at 100 TB the shuffle payload IS the cost of exact dedup).
    * Collision risk is 2^-128 — below hardware error rates. NULL
    * `textCol` rows form one dedup group (GROUP BY semantics) — their
    * digest is an empty-string sentinel, distinct from every real
    * 64-hex-char digest, so the equi-join keeps the min-id null row
    * instead of silently dropping all of them (NULL = NULL never
    * matches in a plain join). */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    require(!df.columns.contains("__digest"), "column name __digest is reserved")
    val withDigest = df.withColumn("__digest",
      coalesce(sha2(col(textCol), 256), lit("")))
    val keep = withDigest.groupBy(col("__digest"))
      .agg(min(col(idCol)).as(idCol))
    withDigest.join(keep, Seq("__digest", idCol)).drop("__digest")
  }

  /** C4-style cross-document LINE dedup: a line survives only at its
    * globally-first occurrence (smallest `idCol`, then smallest
    * position within that row); every other copy is dropped and the
    * row's text is reassembled from its surviving lines in original
    * order. Input is id + an ARRAY of lines (`linesCol`) — the caller
    * decides what a "line" is (split on `\n` for web text; the q108
    * binding chunks the fixture's newline-free text into fixed-width
    * word windows).
    *
    * Scale shape: the wide shuffle never carries line TEXT. The
    * first-occurrence decision runs on a (id, pos, xxhash64(line))
    * relation — ~20 bytes/line — and reassembly joins the per-row
    * surviving-position sets back to the ORIGINAL frame, re-reading
    * the line bodies from `linesCol` by index. At 100 TB the text
    * moves only in the final id-keyed join (its storage layout), not
    * through the line-keyed exchange. Dedup keys on the 64-bit hash
    * (C4 itself dedups on hashes); fixture-scale oracle equality is
    * collision-free, and a birthday-bound caveat applies from ~2^32
    * distinct lines — swap in a 128-bit digest column there.
    *
    * Output: idCol, n_lines, n_kept (longs), new_text (surviving
    * lines joined by `sep`; empty when every line lost). Non-id,
    * non-lines columns pass through. `idCol` values must be unique
    * per row (like [[graft.operators.IncrementalNearDup.newPairs]]) —
    * the survivor sets join back by id. NULL line entries form one
    * dedup group (xxhash64 hashes null to its seed): one survives,
    * counted in n_kept but omitted from new_text (`array_join` skips
    * nulls) — spec-pinned; pre-filter nulls out if they should not
    * consume a survivor slot. */
  def lineDedup(df: DataFrame, idCol: String, linesCol: String,
      sep: String = "\n"): DataFrame = {
    // scratch names AND output names (ADVICE r14): a pass-through
    // column called n_lines/n_kept/new_text would silently duplicate
    // in the result frame
    Seq("__li", "__h", "__rn", "__kept",
        "n_lines", "n_kept", "new_text").foreach { c =>
      require(!df.columns.contains(c), s"column name $c is reserved")
    }
    val hashed = df
      .select(col(idCol), posexplode(col(linesCol)).as(Seq("__li", "__line")))
      .select(col(idCol), col("__li"), xxhash64(col("__line")).as("__h"))
    val winners = hashed
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__h")).orderBy(col(idCol), col("__li"))))
      .filter(col("__rn") === 1)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__li"))).as("__kept"))
    // SHUFFLE_HASH on the winners side: the text side is WIDE (the
    // line arrays), and a sort-merge join would sort it; hash-building
    // on the narrow (id, positions) relation streams the text side
    // through unsorted. Winners per partition are bounded ints — the
    // build fits executor memory at any corpus size. Measured
    // (ScaleBench family 9, 500k docs / 2.6M lines): 6.8 s → 4.2 s.
    df.join(winners.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol) +: df.columns.filterNot(c => c == idCol || c == linesCol)
          .map(col).toSeq :+
        size(col(linesCol)).cast("long").as("n_lines") :+
        coalesce(size(col("__kept")), lit(0)).cast("long").as("n_kept") :+
        array_join(
          transform(coalesce(col("__kept"), array().cast("array<int>")),
            i => element_at(col(linesCol), i + 1)),
          sep).as("new_text"): _*)
  }

  /** Greedy near-dup retention over a precomputed pair set (q76's
    * semantics): drop a row iff ANY earlier row (smaller id) is its
    * near-dup — i.e. drop every id appearing on the `dropCol` side of
    * `pairs` (which must hold id_a < id_b per pair). One anti-join;
    * deliberately NO broadcast hint on the drop side — it is O(corpus)
    * in a high-duplication regime, and AQE broadcasts the small case
    * by itself. Pairs come from [[graft.queries.LlmOps.neardupPairs]]
    * (exact) or q47's LSH path at scale. */
  def greedyRetain(df: DataFrame, pairs: DataFrame, idCol: String,
      dropCol: String = "doc_b"): DataFrame =
    df.join(pairs.select(col(dropCol).as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
