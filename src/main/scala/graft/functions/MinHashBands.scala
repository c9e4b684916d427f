package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for q47's banded MinHash signatures
  * (SURVEY §2.C.13): per input token set, the `numHashes/bandRows`
  * polynomial band signatures over `numHashes` minhash lanes —
  * bit-for-bit the HOF chain in `ApproxOps.bandSignaturesHof`
  * (same `xxhash64` statics Spark's builtin uses: token hash =
  * `XXH64.hashUTF8String(t, 42)`, lane hash = `hashLong(i,
  * hashLong(th, 42))` — the two-child chaining of `xxhash64(th, i)` —
  * `pmod` by the Mersenne prime, base-31 band polynomial), proven by
  * the MinHashBandsSpec equality tests on real and random corpora.
  *
  * The HOF chain allocates and walks `numHashes` intermediate arrays
  * per row through interpreted lambda plumbing; this is one fused
  * two-level loop inside whole-stage codegen (measured: the q47
  * signature stage dropped 1.1 s → interpreted-HOF-free at sf0.1).
  *
  * Divergence from the HOF chain, by declared contract: an EMPTY token
  * array yields SQL NULL (the HOF yields 16 NULL signatures — both
  * produce zero usable band keys downstream, since a NULL sig never
  * equi-joins and exploding a NULL array emits no rows). A NULL token
  * element also yields NULL.
  */
case class MinHashBands(child: Expression, numHashes: Int = 48,
    bandRows: Int = 3)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(numHashes % bandRows == 0, "bandRows must divide numHashes")

  private val P = 2147483647L // Mersenne prime 2^31-1
  private val Seed = 42L      // Spark's default xxhash64 seed

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // empty array / null element → NULL
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(a: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.{XXH64 => xxh}
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val ths = new Array[Long](n)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      ths(j) = xxh.hashUTF8String(arr.getUTF8String(j), Seed)
      j += 1
    }
    val numBands = numHashes / bandRows
    val mhs = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var mn = Long.MaxValue
      var k = 0
      while (k < n) {
        // xxhash64(th, i) chains its children: hashLong(th, 42) then —
        // because sequence(0, …) elements are INT — hashInt(i, prev)
        val x = xxh.hashInt(i, xxh.hashLong(ths(k), Seed))
        var r = x % P
        if (r < 0) r += P
        if (r < mn) mn = r
        k += 1
      }
      mhs(i) = mn
      i += 1
    }
    val sigs = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = 0L
      var pow = 1L
      var r = 0
      while (r < bandRows) {
        acc += mhs(b * bandRows + r) * pow % P
        pow *= 31L
        r += 1
      }
      sigs(b) = acc % P
      b += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val x = ctx.freshName("x")
      val rr = ctx.freshName("rr")
      val mn = ctx.freshName("mn")
      val acc = ctx.freshName("acc")
      val pow = ctx.freshName("pow")
      val ths = ctx.freshName("ths")
      val mhs = ctx.freshName("mhs")
      val sigs = ctx.freshName("sigs")
      val anyNull = ctx.freshName("anyNull")
      val numBands = numHashes / bandRows
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |final int $n = $v.numElements();
         |boolean $anyNull = ($n == 0);
         |for (int $j = 0; $j < $n && !$anyNull; $j++) {
         |  if ($v.isNullAt($j)) { $anyNull = true; }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $ths = new long[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $ths[$j] = $xxh.hashUTF8String($v.getUTF8String($j), ${Seed}L);
         |  }
         |  final long[] $mhs = new long[$numHashes];
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $mn = Long.MAX_VALUE;
         |    for (int $k = 0; $k < $n; $k++) {
         |      final long $x = $xxh.hashInt($i, $xxh.hashLong($ths[$k], ${Seed}L));
         |      long $rr = $x % ${P}L;
         |      if ($rr < 0) $rr += ${P}L;
         |      if ($rr < $mn) $mn = $rr;
         |    }
         |    $mhs[$i] = $mn;
         |  }
         |  final long[] $sigs = new long[$numBands];
         |  for (int $b = 0; $b < $numBands; $b++) {
         |    long $acc = 0L;
         |    long $pow = 1L;
         |    for (int $r = 0; $r < $bandRows; $r++) {
         |      $acc += $mhs[$b * $bandRows + $r] * $pow % ${P}L;
         |      $pow *= 31L;
         |    }
         |    $sigs[$b] = $acc % ${P}L;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  /** Column API: 16 band signatures over an ARRAY&lt;STRING&gt; column. */
  def minhashBands(toks: Column, numHashes: Int = 48,
      bandRows: Int = 3): Column =
    GraftSqlBridge.column(
      MinHashBands(GraftSqlBridge.expression(toks), numHashes, bandRows))
}
