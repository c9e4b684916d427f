package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-source boilerplate overlap matrix, generalized from q113
  * (VERDICT r15 task 6): for every source pair (source_a ≤ source_b),
  * the number of DOCUMENT PAIRS whose texts share an identical word
  * WINDOW — within-source pairs counted n·(n−1)/2, cross-source
  * n_a·n_b. q113's fixed 8-word prefix is one instantiation; real
  * feeds also share FOOTERS (injected attribution lines, cookie
  * banners at the tail) and MID-DOCUMENT templates, which a
  * prefix-only audit never sees — the [[Window]] selector covers all
  * three without changing the matrix semantics.
  *
  * Scale shape (unchanged from q113, adjudicated in its plan audit):
  * the corpus is scanned ONCE; the exchange carries a 32-byte window
  * DIGEST + source, never text; the ≥2-occurrence prune is a window
  * function over the same grouped relation (no aggregate-and-join-back
  * re-scan), and the surviving (digest, source, n) rows — bounded by
  * the duplicated-boilerplate families, tiny next to the corpus — are
  * EAGER-CUT before the pair self-join so neither side recomputes the
  * corpus aggregation.
  *
  * NULL-text handling follows q113: under [[Prefix]] and [[Suffix]]
  * null texts form their own group (digest sentinel ''), distinct from
  * empty-string text (sha2('') is a real digest) — two sources both
  * shipping null rows IS overlap worth seeing. Under [[At]] a document
  * with no window at the requested offset (fewer than `offset + 1`
  * words, or null text) contributes nothing: there is no "same
  * mid-document template" claim to make about it. Documents shorter
  * than the window take their whole available span (a 3-word doc's
  * 8-word prefix is the 3 words — q113's rule, mirrored at the tail
  * for [[Suffix]]). */
object SourceOverlap {

  /** Which word window of each document is the overlap key. */
  sealed trait Window
  /** The first `words` words — q113's shape (head boilerplate:
    * templated titles, injected headers). */
  final case class Prefix(words: Int) extends Window
  /** The last `words` words — shared footers, attribution lines,
    * trailing banners. */
  final case class Suffix(words: Int) extends Window
  /** `words` words starting at the 0-based word `offset` —
    * mid-document templates. Documents without a word at `offset`
    * (including null text) are excluded; the window itself may be
    * shorter than `words` near a document's end. */
  final case class At(offset: Int, words: Int) extends Window

  /** The overlap matrix of `docs` under `window`:
    * (source_a ≤ source_b, dup_pairs > 0), unordered. */
  def overlapMatrix(docs: DataFrame, textCol: String, sourceCol: String,
      window: Window = Prefix(8)): DataFrame = {
    val w: Column = split(col(textCol), " ")
    val span: Column = window match {
      case Prefix(k) =>
        require(k > 0, s"window must be positive: $k")
        slice(w, 1, k)
      case Suffix(k) =>
        require(k > 0, s"window must be positive: $k")
        // greatest() skips the NULL its null-text operand yields, so a
        // null doc still flows to the '' sentinel like Prefix's does
        slice(w, greatest(size(w) - (k - 1), lit(1)), lit(k))
      case At(off, k) =>
        require(off >= 0, s"offset must be non-negative: $off")
        require(k > 0, s"window must be positive: $k")
        slice(w, off + 1, k)
    }
    val keyed = window match {
      case At(off, _) => docs.filter(size(w) > off)
      case _ => docs
    }
    val gd = graft.Hygiene.eagerCut(
      keyed
        .select(col(sourceCol).as("source"),
          coalesce(sha2(array_join(span, " "), 256), lit("")).as("dg"))
        .groupBy(col("dg"), col("source")).agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("dg"))))
        .filter(col("tot") >= 2).drop("tot"))
    gd.as("a").join(gd.as("b"),
        col("a.dg") === col("b.dg") && col("a.source") <= col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        when(col("a.source") === col("b.source"),
          expr("a.n * (a.n - 1) div 2"))
          .otherwise(col("a.n") * col("b.n")).as("pp"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("pp")).cast("long").as("dup_pairs"))
      .filter(col("dup_pairs") > 0)
  }
}
