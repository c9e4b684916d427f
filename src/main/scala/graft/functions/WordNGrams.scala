package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the word n-gram set derivation shared
  * by q44/q105/x105 (`LlmOps2.triSets`): bit-for-bit the HOF chain
  *
  * {{{
  *   sp = split(text, " ")
  *   when(size(sp) < n, array())
  *     .otherwise(array_distinct(transform(sequence(1, size(sp) - n + 1),
  *       i -> concat_ws(' ', sp[i-1], ..., sp[i+n-2]))))
  * }}}
  *
  * Why it exists — the round-16 long-document audit's sharpest finding:
  * that chain is not merely slow, it is LATENTLY QUADRATIC. The lambda
  * references the outer array `sp`, and when a downstream consumer
  * explodes the grams without first persisting (q44/q105/x105 persist
  * precisely to dodge this), the optimizer's projection collapse
  * substitutes `sp := split(text, " ")` INTO the lambda body — and HOF
  * lambdas re-evaluate their body per element, so the full-text split
  * re-runs for every gram index: O(words · len) per document. Measured
  * at 2000×100 KB docs: the persisted/non-inlined derivation is 2.2 s;
  * the inlined explode path was killed after 15+ minutes with every
  * worker pinned inside `ConcatWs.eval → StringSplit.nullSafeEval`
  * (thread-dump evidence, NOTES_r16). This expression is one fused
  * byte pass with no lambda for the optimizer to poison — the hazard
  * class is gone, not dodged.
  *
  * The pass itself exploits the split/join identity: `split` is on the
  * single space and `concat_ws` rejoins with the single space, so every
  * word n-gram is EXACTLY a contiguous byte slice of the original text
  * (empty tokens from consecutive/leading/trailing spaces included —
  * the slice carries the same space run the rejoin would rebuild).
  * One scan finds the space offsets (0x20 never occurs inside a UTF-8
  * multibyte sequence, so raw bytes are safe); each gram is a zero-copy
  * `fromBytes` view over the shared byte array; distinctness keeps
  * first occurrence, exactly `array_distinct`'s order.
  *
  * Deliberate SCHEMA tightening, the [[CharNGrams]] precedent: grams
  * are never null, so `containsNull = false` where the HOF chain
  * declares `true` — values identical, tighter schema is the true one.
  *
  * Reference behavior cited: nightscape/spark-file-mover exercises only
  * the Spark surface (M:14-55); this tier is the engine's declared
  * §2.C.11 extension surface.
  */
case class WordNGrams(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"n must be positive: $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordNGrams.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  /** Column API: the DISTINCT `n`-word grams of a STRING column
    * (space-split, space-joined, first-occurrence order). */
  def wordNGrams(s: Column, n: Int): Column =
    GraftSqlBridge.column(WordNGrams(GraftSqlBridge.expression(s), n))

  /** One byte pass; shared by the interpreted and codegen paths. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val b = s.getBytes
    val len = b.length
    // token k starts at starts(k); token count = spaces + 1 (split on
    // the single space keeps leading/trailing/consecutive empties)
    var nt = 1
    var i = 0
    while (i < len) { if (b(i) == 0x20) nt += 1; i += 1 }
    if (nt < n) // the chain's `when(size(sp) < n, array())`
      return new GenericArrayData(new Array[AnyRef](0))
    val starts = new Array[Int](nt + 1)
    starts(nt) = len + 1 // sentinel: end of token k is starts(k+1) - 1
    var k = 1
    i = 0
    while (i < len) { if (b(i) == 0x20) { starts(k) = i + 1; k += 1 }; i += 1 }
    // distinct grams, first occurrence first — array_distinct's order
    val seen = new java.util.LinkedHashSet[UTF8String]((nt - n + 1) * 2)
    var j = 0
    while (j <= nt - n) {
      val from = starts(j)
      val to = starts(j + n) - 1
      seen.add(UTF8String.fromBytes(b, from, to - from))
      j += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }
}
