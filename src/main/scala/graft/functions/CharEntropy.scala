package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for q109's character-entropy signal
  * (SURVEY §2.C.11 tier): Shannon entropy (bits/char) of a string's
  * CODE-POINT distribution, in ONE pass over the bytes — a hash count
  * per code point, then `log2(t) − (Σ nᵢ·log2 nᵢ)/t`. NULL for the
  * empty string (the distribution is undefined — q109's `when` rule)
  * and for NULL input.
  *
  * Why it exists (VERDICT r14 task 7, measured before built): the HOF
  * chain `transform(array_distinct(chs), c -> size(filter(chs, …)))`
  * is O(|alphabet|·len) per document — one full array pass per
  * DISTINCT character. On the sf0.01 fixture that is invisible
  * (0.1 s); on a 2000-doc × 100 KB long-document corpus it measured
  * 98 s (median of 3) vs 10.3 s for a single-pass sorted-runs HOF
  * (`aggregate(array_sort(chs), …)` walking run boundaries) vs ~1 s
  * for this fused loop — the HOF shapes also materialize the per-doc
  * character ARRAY (~4× the text in pointers) where this reads the
  * UTF8String's bytes in place.
  *
  * Character segmentation matches the HOF/oracle pair exactly:
  * `split(text, '')` (Java regex — zero-width matches never split a
  * surrogate pair, so elements are CODE POINTS) and DuckDB's
  * `string_split(text, '')` (UTF-8 characters) both segment by code
  * point, and this loop iterates `codePointAt` — one count per
  * character for any multibyte/emoji content (CharEntropySpec pins
  * equality on exactly that fixture class). Entropy is order-free, so
  * summation-order float drift vs the HOF is the only divergence —
  * bounded well under the 6-decimal rounding both engines print
  * (asserted ≤1e-9 in the spec).
  */
case class CharEntropy(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even under a non-null child: empty string → NULL
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numBytes() == 0) null
    else java.lang.Double.valueOf(CharEntropy.compute(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // one static call — the loop stays a single JIT-friendly method,
      // invoked from inside the whole-stage-codegen pipeline (the same
      // shape Spark uses for its own non-trivial string kernels)
      s"""
         |if ($v.numBytes() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CharEntropy.compute($v);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** The counting kernel — code-point frequencies in ONE pass over the
    * UTF8String's BYTES, decoded in place (no `toString` transcode, no
    * per-row char array), into an open-addressing int→long count table
    * (no per-code-point boxing; ADVICE r15 closed the doc/impl gap the
    * old HashMap path left). Called from both eval paths (the
    * companion's static forwarder makes it reachable from generated
    * Java). Caller guarantees non-empty input.
    *
    * Decoding note: Spark guarantees valid UTF-8 in UTF8String, so the
    * length-prefix dispatch below is exact; a malformed lead/truncated
    * tail (hostile bytes reaching this far) degrades to counting the
    * lead byte as its own symbol rather than reading past the buffer —
    * garbage-in stays a bounded answer, never an OOB read. */
  def compute(s: UTF8String): Double = {
    val nb = s.numBytes()
    // open addressing, linear probing; -1 = empty (code points are ≥0)
    var cap = 64
    var mask = cap - 1
    var keys = new Array[Int](cap)
    java.util.Arrays.fill(keys, -1)
    var cnts = new Array[Long](cap)
    var used = 0
    var t = 0L
    var i = 0
    while (i < nb) {
      val b0 = s.getByte(i) & 0xff
      var cp = b0
      if (b0 < 0x80) i += 1
      else if ((b0 & 0xe0) == 0xc0 && i + 1 < nb) {
        cp = ((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f); i += 2
      } else if ((b0 & 0xf0) == 0xe0 && i + 2 < nb) {
        cp = ((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) |
          (s.getByte(i + 2) & 0x3f); i += 3
      } else if ((b0 & 0xf8) == 0xf0 && i + 3 < nb) {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
          ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f)
        i += 4
      } else i += 1 // malformed: count the lead byte, advance one
      t += 1
      // Fibonacci-hash the code point into the table
      var j = (cp * 0x9e3779b9) >>> (32 - Integer.numberOfTrailingZeros(cap))
      var k = keys(j)
      while (k != -1 && k != cp) { j = (j + 1) & mask; k = keys(j) }
      if (k == -1) {
        keys(j) = cp; cnts(j) = 1L; used += 1
        if (used * 2 > cap) { // grow at 0.5 load
          val oc = cap; val ok = keys; val on = cnts
          cap <<= 1; mask = cap - 1
          keys = new Array[Int](cap); java.util.Arrays.fill(keys, -1)
          cnts = new Array[Long](cap)
          var x = 0
          while (x < oc) {
            val key = ok(x)
            if (key != -1) {
              var y = (key * 0x9e3779b9) >>>
                (32 - Integer.numberOfTrailingZeros(cap))
              while (keys(y) != -1) y = (y + 1) & mask
              keys(y) = key; cnts(y) = on(x)
            }
            x += 1
          }
        }
      } else cnts(j) += 1
    }
    val log2 = math.log(2.0)
    var nlogn = 0.0
    var x = 0
    while (x < cap) {
      if (keys(x) != -1) {
        val n = cnts(x).toDouble
        nlogn += n * (math.log(n) / log2)
      }
      x += 1
    }
    (math.log(t.toDouble) / log2) - nlogn / t
  }

  /** Column API: Shannon entropy (bits/char) of a STRING column's
    * code-point distribution; NULL on NULL or empty input. */
  def charEntropy(s: Column): Column =
    GraftSqlBridge.column(CharEntropy(GraftSqlBridge.expression(s)))
}
