package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for q66's character n-gram derivation
  * (SURVEY §2.C.11 tier): bit-for-bit the HOF chain
  * `transform(sequence(1, length(t) - n + 1), i -> substring(t, i, n))`
  * — including its two non-obvious corners, matched deliberately:
  *
  *  - each gram is `UTF8String.substringSQL(i, n)` — the exact code
  *    Spark's `Substring` expression runs, so multibyte strings and
  *    out-of-range positions slice identically (code points, SQL
  *    1-based semantics, negative-pos from-the-end);
  *  - for strings SHORTER than n the HOF's `sequence(1, m)` with m < 1
  *    DESCENDS (Spark defaults the step to −1 when start > stop), so
  *    e.g. a 2-char string under n=3 yields ["ab", "ab"] (i = 1, 0) —
  *    replicated here, though q66 filters length ≥ 3 before the call
  *    and never reaches it (the equality spec pins it anyway).
  *
  * Why it exists: the HOF walks interpreted lambda plumbing per
  * CHARACTER POSITION (a boxed index array plus a `substring` call per
  * element through non-codegen lambda evaluation) — measured 2.7 s for
  * 1.5M trigrams at sf0.1, ~60% of q66's whole runtime. This is one
  * fused loop inside whole-stage codegen. Equality proven by
  * CharNGramsSpec on the real corpus, random multibyte strings, and
  * the degenerate lengths, on both the codegen and interpreted paths.
  *
  * Deliberate SCHEMA tightening (ADVICE r8): `dataType` declares
  * `containsNull = false` where the HOF chain declares `true` —
  * `substringSQL` never returns null, so the VALUES are identical, but
  * schema-equality against the old derivation (a `unionByName` with a
  * relation cached under the HOF schema, say) would report a nullable
  * mismatch. That is the correct direction (the tighter schema is the
  * true one) — widen with `ArrayType(StringType, true)` at the caller
  * if such a union ever needs it.
  */
case class CharNGrams(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"n must be positive: $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val m = s.numChars() - n + 1
    // sequence(1, m): ascending for m >= 1, else Spark's descending
    // default (1, 0, ..., m)
    val (cnt, step) = if (m >= 1) (m, 1) else (2 - m, -1)
    val out = new Array[AnyRef](cnt)
    var i = 1
    var k = 0
    while (k < cnt) {
      out(k) = s.substringSQL(i, n)
      i += step
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val step = ctx.freshName("step")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |final int $m = $v.numChars() - $n + 1;
         |final int $cnt = ($m >= 1) ? $m : (2 - $m);
         |final int $step = ($m >= 1) ? 1 : -1;
         |final Object[] $out = new Object[$cnt];
         |int $i = 1;
         |for (int $k = 0; $k < $cnt; $k++) {
         |  $out[$k] = $v.substringSQL($i, $n);
         |  $i += $step;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  /** Column API: all `n`-character grams of a STRING column. */
  def charNGrams(s: Column, n: Int): Column =
    GraftSqlBridge.column(CharNGrams(GraftSqlBridge.expression(s), n))
}
