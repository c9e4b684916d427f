package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for q104's winnowing fingerprints
  * (SURVEY §2.C.14): per token array, hash every word `k`-gram with
  * the PORTABLE base-31 byte fold (q43's `rolling_hash` over the
  * space-joined gram, capped at 64 bytes) and keep the distinct
  * minima of every `w`-window of consecutive gram hashes
  * (Schleimer/Wilkerson/Aiken winnowing), first-occurrence order —
  * bit-for-bit the HOF chain in `LlmOps6.winnowFingerprintsHof`
  * (WinnowFingerprintsSpec proves equality on real and random
  * corpora, both codegen and interpreted paths).
  *
  * The HOF chain walks interpreted lambdas per CHARACTER (substring +
  * ascii + per-element fold allocation) — measured 201 s for 5 000
  * documents at sf0.1; this is one fused byte loop inside whole-stage
  * codegen over token bytes that are materialized once per row.
  *
  * Contract: fewer than `k` tokens → EMPTY array (no gram exists);
  * `1 ≤ grams < w` → the single global-min fingerprint (coverage
  * never silently drops to zero); a NULL token element → NULL.
  * ASCII domain like `rolling_hash` (byte fold ≡ the oracle's
  * per-character `ascii()` fold for single-byte characters).
  */
case class WinnowFingerprints(child: Expression, k: Int = 5, w: Int = 4)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 2 && w >= 2)

  private val P = 1000000007L
  private val MaxBytes = 64

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null token element → NULL
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // null-element check FIRST, exactly like the codegen path — the
    // two paths must agree for every input or constant folding and
    // runtime evaluation diverge
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val tb = new Array[Array[Byte]](n)
    j = 0
    while (j < n) {
      tb(j) = arr.getUTF8String(j).getBytes
      j += 1
    }
    val m = n - k + 1
    val ghs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var cnt = 0
      var t = 0
      while (t < k && cnt < MaxBytes) {
        if (t > 0) { acc = (acc * 31 + 32) % P; cnt += 1 } // ' ' separator
        val bs = tb(i + t)
        var bi = 0
        while (bi < bs.length && cnt < MaxBytes) {
          acc = (acc * 31 + (bs(bi) & 0xff)) % P
          cnt += 1
          bi += 1
        }
        t += 1
      }
      ghs(i) = acc
      i += 1
    }
    val out = new Array[Long](m)
    var outN = 0
    if (m >= w) {
      var s = 0
      while (s <= m - w) {
        var mn = Long.MaxValue
        var x = 0
        while (x < w) { if (ghs(s + x) < mn) mn = ghs(s + x); x += 1 }
        var seen = false
        var c = 0
        while (c < outN && !seen) { if (out(c) == mn) seen = true; c += 1 }
        if (!seen) { out(outN) = mn; outN += 1 }
        s += 1
      }
    } else {
      var mn = Long.MaxValue
      var x = 0
      while (x < m) { if (ghs(x) < mn) mn = ghs(x); x += 1 }
      out(0) = mn
      outN = 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val bi = ctx.freshName("bi")
      val bs = ctx.freshName("bs")
      val tb = ctx.freshName("tb")
      val m = ctx.freshName("m")
      val ghs = ctx.freshName("ghs")
      val acc = ctx.freshName("acc")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val outN = ctx.freshName("outN")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val mn = ctx.freshName("mn")
      val seen = ctx.freshName("seen")
      val c = ctx.freshName("c")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |final int $n = $v.numElements();
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($v.isNullAt($j)) { $anyNull = true; break; }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else if ($n < $k) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  final byte[][] $tb = new byte[$n][];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $tb[$j] = $v.getUTF8String($j).getBytes();
         |  }
         |  final int $m = $n - ${k - 1};
         |  final long[] $ghs = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $acc = 0L;
         |    int $cnt = 0;
         |    for (int $t = 0; $t < $k && $cnt < $MaxBytes; $t++) {
         |      if ($t > 0) { $acc = ($acc * 31L + 32L) % ${P}L; $cnt++; }
         |      final byte[] $bs = $tb[$i + $t];
         |      for (int $bi = 0; $bi < $bs.length && $cnt < $MaxBytes; $bi++) {
         |        $acc = ($acc * 31L + ($bs[$bi] & 0xff)) % ${P}L;
         |        $cnt++;
         |      }
         |    }
         |    $ghs[$i] = $acc;
         |  }
         |  final long[] $out = new long[$m];
         |  int $outN = 0;
         |  if ($m >= $w) {
         |    for (int $s = 0; $s <= $m - $w; $s++) {
         |      long $mn = Long.MAX_VALUE;
         |      for (int $x = 0; $x < $w; $x++) {
         |        if ($ghs[$s + $x] < $mn) $mn = $ghs[$s + $x];
         |      }
         |      boolean $seen = false;
         |      for (int $c = 0; $c < $outN && !$seen; $c++) {
         |        if ($out[$c] == $mn) $seen = true;
         |      }
         |      if (!$seen) { $out[$outN] = $mn; $outN++; }
         |    }
         |  } else {
         |    long $mn = Long.MAX_VALUE;
         |    for (int $x = 0; $x < $m; $x++) {
         |      if ($ghs[$x] < $mn) $mn = $ghs[$x];
         |    }
         |    $out[0] = $mn;
         |    $outN = 1;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $outN));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowFingerprints = copy(child = newChild)
}

/** [[WinnowFingerprints]] with the tokenization ABSORBED: takes the raw
  * text STRING and walks its bytes once, splitting on the space byte
  * (0x20 — never a UTF-8 continuation byte, so multibyte text is safe)
  * into (start, end) offsets instead of materializing a token array.
  * Token semantics are exactly `split(text, ' ')` — empty tokens from
  * consecutive/leading/trailing spaces included — so the output is
  * bit-for-bit `winnow_fingerprints(split(text, ' '))`
  * (WinnowFingerprintsSpec proves it on real and random corpora).
  * Saves the per-row UTF8String array + per-token byte copies the
  * two-step shape pays. */
case class WinnowFingerprintsText(child: Expression, k: Int = 5, w: Int = 4)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 2 && w >= 2)

  private val P = 1000000007L
  private val MaxBytes = 64

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints_text"

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var n = 1
    var p = 0
    while (p < bytes.length) { if (bytes(p) == 32) n += 1; p += 1 }
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var ti = 0
    starts(0) = 0
    p = 0
    while (p < bytes.length) {
      if (bytes(p) == 32) { ends(ti) = p; ti += 1; starts(ti) = p + 1 }
      p += 1
    }
    ends(ti) = bytes.length
    val m = n - k + 1
    val ghs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var cnt = 0
      var t = 0
      while (t < k && cnt < MaxBytes) {
        if (t > 0) { acc = (acc * 31 + 32) % P; cnt += 1 }
        var bi = starts(i + t)
        val e = ends(i + t)
        while (bi < e && cnt < MaxBytes) {
          acc = (acc * 31 + (bytes(bi) & 0xff)) % P
          cnt += 1
          bi += 1
        }
        t += 1
      }
      ghs(i) = acc
      i += 1
    }
    val out = new Array[Long](m)
    var outN = 0
    if (m >= w) {
      var s = 0
      while (s <= m - w) {
        var mn = Long.MaxValue
        var x = 0
        while (x < w) { if (ghs(s + x) < mn) mn = ghs(s + x); x += 1 }
        var seen = false
        var c = 0
        while (c < outN && !seen) { if (out(c) == mn) seen = true; c += 1 }
        if (!seen) { out(outN) = mn; outN += 1 }
        s += 1
      }
    } else {
      var mn = Long.MaxValue
      var x = 0
      while (x < m) { if (ghs(x) < mn) mn = ghs(x); x += 1 }
      out(0) = mn
      outN = 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val starts = ctx.freshName("starts")
      val ends = ctx.freshName("ends")
      val ti = ctx.freshName("ti")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val bi = ctx.freshName("bi")
      val e = ctx.freshName("e")
      val m = ctx.freshName("m")
      val ghs = ctx.freshName("ghs")
      val acc = ctx.freshName("acc")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val outN = ctx.freshName("outN")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val mn = ctx.freshName("mn")
      val seen = ctx.freshName("seen")
      val c = ctx.freshName("c")
      s"""
         |final byte[] $bytes = $v.getBytes();
         |int $n = 1;
         |for (int $p = 0; $p < $bytes.length; $p++) {
         |  if ($bytes[$p] == 32) $n++;
         |}
         |if ($n < $k) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  final int[] $starts = new int[$n];
         |  final int[] $ends = new int[$n];
         |  int $ti = 0;
         |  $starts[0] = 0;
         |  for (int $p = 0; $p < $bytes.length; $p++) {
         |    if ($bytes[$p] == 32) { $ends[$ti] = $p; $ti++; $starts[$ti] = $p + 1; }
         |  }
         |  $ends[$ti] = $bytes.length;
         |  final int $m = $n - ${k - 1};
         |  final long[] $ghs = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $acc = 0L;
         |    int $cnt = 0;
         |    for (int $t = 0; $t < $k && $cnt < $MaxBytes; $t++) {
         |      if ($t > 0) { $acc = ($acc * 31L + 32L) % ${P}L; $cnt++; }
         |      final int $e = $ends[$i + $t];
         |      for (int $bi = $starts[$i + $t]; $bi < $e && $cnt < $MaxBytes; $bi++) {
         |        $acc = ($acc * 31L + ($bytes[$bi] & 0xff)) % ${P}L;
         |        $cnt++;
         |      }
         |    }
         |    $ghs[$i] = $acc;
         |  }
         |  final long[] $out = new long[$m];
         |  int $outN = 0;
         |  if ($m >= $w) {
         |    for (int $s = 0; $s <= $m - $w; $s++) {
         |      long $mn = Long.MAX_VALUE;
         |      for (int $x = 0; $x < $w; $x++) {
         |        if ($ghs[$s + $x] < $mn) $mn = $ghs[$s + $x];
         |      }
         |      boolean $seen = false;
         |      for (int $c = 0; $c < $outN && !$seen; $c++) {
         |        if ($out[$c] == $mn) $seen = true;
         |      }
         |      if (!$seen) { $out[$outN] = $mn; $outN++; }
         |    }
         |  } else {
         |    long $mn = Long.MAX_VALUE;
         |    for (int $x = 0; $x < $m; $x++) {
         |      if ($ghs[$x] < $mn) $mn = $ghs[$x];
         |    }
         |    $out[0] = $mn;
         |    $outN = 1;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $outN));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowFingerprintsText = copy(child = newChild)
}

object WinnowFingerprints {
  /** Column API: distinct winnowed fingerprints of an
    * ARRAY&lt;STRING&gt; token column. */
  def winnowFingerprints(toks: Column, k: Int = 5, w: Int = 4): Column =
    GraftSqlBridge.column(
      WinnowFingerprints(GraftSqlBridge.expression(toks), k, w))

  /** Column API: fingerprints straight from the raw text column —
    * `winnowFingerprints(split(text, " "))` with the split fused into
    * the byte loop. */
  def winnowFingerprintsText(text: Column, k: Int = 5, w: Int = 4): Column =
    GraftSqlBridge.column(
      WinnowFingerprintsText(GraftSqlBridge.expression(text), k, w))
}
