package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source boilerplate REMOVAL — the acting half of the
  * [[SourceOverlap]] audit (reference scope: the C4-style template
  * cleanup a crawl feed needs before dedup; the audit tells you which
  * feeds ship templates, this strips them). For every (source, word
  * window) family shared by ≥ `minDocs` documents OF THE SAME SOURCE,
  * the window is removed from each member's text; every other document
  * passes through byte-unchanged. The per-source keying is the point:
  * a header that is boilerplate inside one feed may be the actual
  * content of a lone document in another, so families never pool
  * across sources (unlike the overlap MATRIX, whose cross-source
  * counts are exactly the signal for which feeds to audit first).
  *
  * Window semantics follow [[SourceOverlap]] verbatim — [[SourceOverlap.Prefix]]
  * (templated titles/headers), [[SourceOverlap.Suffix]] (attribution
  * footers, cookie banners), [[SourceOverlap.At]] (mid-document
  * templates) — with ONE deviation: null text never joins a family
  * here (there is nothing to strip from it; it passes through null),
  * where the matrix deliberately counts null-null pairs as overlap.
  * Documents shorter than the window take their whole available span
  * (q113's rule), so a stripped whole-span document becomes ''. Under
  * [[SourceOverlap.At]], documents with no word at the offset are
  * ineligible (no same-template claim), exactly as in the matrix.
  *
  * Removal is by token splice, not length arithmetic: the text is
  * split on the single space, the window's token range dropped, and
  * the remainder rejoined with the same separator. Because a word
  * window IS a contiguous token slice (empty tokens from consecutive
  * spaces included — the WordNGrams identity, NOTES_r16), the splice
  * is lossless outside the removed span: interior spacing survives,
  * and a run of spaces abutting the window keeps every space that was
  * not the window's own separator.
  *
  * Scale shape: the corpus is scanned once; the family-detection
  * exchange carries (source, 32-byte window digest), never text. The
  * surviving family keys — distinct templates repeated ≥ `minDocs`
  * within one source, bounded by the corpus's real boilerplate
  * vocabulary (thousands, not billions) — are BROADCAST back, so the
  * corpus side of the rewrite join never shuffles. A corpus whose
  * family set is itself corpus-scale is not doing boilerplate cleanup
  * any more — that is near-duplicate territory (q47/x105), and this
  * operator is the wrong tool for it by construction. */
object Boilerplate {
  import SourceOverlap.{Window, Prefix, Suffix, At}

  /** `docs` with `textCol` rewritten (boilerplate window removed for
    * family members, unchanged otherwise) and a 0/1 `strippedCol`
    * appended. Column set = docs.* + strippedCol; row count, order
    * contract and every non-text column untouched. */
  def strip(docs: DataFrame, textCol: String, sourceCol: String,
      window: Window = Prefix(8), minDocs: Int = 2,
      strippedCol: String = "stripped"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be at least 2: $minDocs")
    require(!docs.columns.contains(strippedCol),
      s"output column '$strippedCol' already exists in the input")
    val w: Column = split(col(textCol), " ")
    val (span: Column, keep: Column, eligible: Column) = window match {
      case Prefix(k) =>
        require(k > 0, s"window must be positive: $k")
        (slice(w, 1, k),
          slice(w, lit(k + 1), greatest(size(w) - k, lit(0))),
          col(textCol).isNotNull)
      case Suffix(k) =>
        require(k > 0, s"window must be positive: $k")
        (slice(w, greatest(size(w) - (k - 1), lit(1)), lit(k)),
          slice(w, lit(1), greatest(size(w) - k, lit(0))),
          col(textCol).isNotNull)
      case At(off, k) =>
        require(off >= 0, s"offset must be non-negative: $off")
        require(k > 0, s"window must be positive: $k")
        // slice's start must be ≥ 1, so the empty head (off == 0) goes
        // through a zero-length slice at start 1, not a start-0 slice
        (slice(w, off + 1, k),
          concat(slice(w, lit(1), lit(off)),
            slice(w, lit(off + k + 1),
              greatest(size(w) - (off + k), lit(0)))),
          col(textCol).isNotNull && size(w) > off)
    }
    // digest is NULL for ineligible rows, so they can neither form nor
    // join a family (equi-join keys never match null)
    val dg = when(eligible, sha2(array_join(span, " "), 256))
    // two reads of the corpus (family detection, rewrite join) — the
    // q114 "honest two reads" shape: a single-read alternative would
    // count families with a window over (source, digest), which
    // shuffles the full corpus TEXT; here text never leaves its
    // partition and the second read's join side is a broadcast.
    val fams = docs
      .select(col(sourceCol).as("__bp_src"), dg.as("__bp_fdg"))
      .filter(col("__bp_fdg").isNotNull)
      .groupBy(col("__bp_src"), col("__bp_fdg"))
      .agg(count(lit(1)).as("__bp_n"))
      .filter(col("__bp_n") >= minDocs)
      .drop("__bp_n")
    docs
      .withColumn("__bp_dg", dg)
      .join(broadcast(fams),
        col(sourceCol) === col("__bp_src") &&
          col("__bp_dg") === col("__bp_fdg"), "left")
      .withColumn(strippedCol,
        col("__bp_src").isNotNull.cast("int"))
      .withColumn(textCol,
        when(col(strippedCol) === 1, array_join(keep, " "))
          .otherwise(col(textCol)))
      .drop("__bp_dg", "__bp_src", "__bp_fdg")
  }
}
