package graft.operators

import org.apache.spark.sql.DataFrame
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
