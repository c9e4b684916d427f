package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the q78 sign-random-projection
  * signature (SURVEY §2.C.12): bit h of the result is the sign of the
  * dot product of the input vector with pseudo-random ±1 hyperplane h,
  * whose component j is derived from `xxhash64(h * 1000003 + j)`
  * parity — exactly the seedless scheme of `LlmOps5.srpBands`'s HOF
  * formulation, bit-for-bit (same xxhash64 seed 42, same ascending-j
  * IEEE summation order, same acc*2+bit bit packing), proven by the
  * x78 == q78 equality spec.
  *
  * The HOF chain walks the array 16 times through lambda plumbing
  * (transform → zip_with → aggregate per hyperplane); this is one fused
  * two-level loop per row inside whole-stage codegen, calling the same
  * public `XXH64.hashInt` static Spark's own xxhash64 uses.
  *
  * Null handling mirrors CosineSimilarity: a null ELEMENT yields SQL
  * NULL (the HOF chain nulls out the same way). Two non-obvious corners
  * matched deliberately (both diverge under naive Java semantics):
  * NaN dot products take bit 1 (Spark's double `>=` ranks NaN greatest
  * — SQLOrderingUtil.compareDoubles, not Java's `>=`), and EMPTY arrays
  * yield signature 0 (the HOF's zip_with over sequence(0, -1) null-pads
  * every dot product and IF(null, 1, 0) takes the 0 branch).
  */
case class SrpSignature(child: Expression, sigBits: Int = 16)
  extends UnaryExpression with ImplicitCastInputTypes {

  private val Mult = 1000003
  private val Seed = 42L // Spark's default xxhash64 seed

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_signature"

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elemNullable

  // Sign test via the same comparator Spark's codegen emits for
  // `>= 0D` on doubles (SQLOrderingUtil.compareDoubles): NaN compares
  // GREATER than everything (bit 1) and -0.0 == 0.0 — a plain Java
  // `dot >= 0.0` is false for NaN and would flip every bit of a
  // NaN-containing vector relative to the HOF chain.
  // Empty arrays: the HOF's zip_with over sequence(0, -1) null-pads and
  // nulls every dot product, so IF(null >= 0, 1, 0) takes the 0 branch
  // — signature 0. Matched explicitly here.
  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return 0L
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return null
      j += 1
    }
    var sig = 0L
    var h = 0
    while (h < sigBits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val hash = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashInt(h * Mult + i, Seed)
        dot += v.getDouble(i) * (if ((hash & 1L) == 0L) 1.0 else -1.0)
        i += 1
      }
      val nonNeg = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        .compareDoubles(dot, 0.0) >= 0
      sig = sig * 2 + (if (nonNeg) 1L else 0L)
      h += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val hash = ctx.freshName("hash")
      val sig = ctx.freshName("sig")
      val anyNull = ctx.freshName("anyNull")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val ord = "org.apache.spark.sql.catalyst.util.SQLOrderingUtil"
      val loop =
        s"""
           |long $sig = 0L;
           |for (int $h = 0; $h < $sigBits; $h++) {
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    final long $hash = $xxh.hashInt($h * $Mult + $i, ${Seed}L);
           |    $dot += $v.getDouble($i) * ((($hash & 1L) == 0L) ? 1.0 : -1.0);
           |  }
           |  $sig = $sig * 2 + (($ord.compareDoubles($dot, 0.0) >= 0) ? 1L : 0L);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      if (!elemNullable) {
        // schema proves no null elements: no scan, never touch ev.isNull
        // (it may be a FalseLiteral when the child is non-nullable too)
        s"""
           |final int $n = $v.numElements();
           |if ($n == 0) { ${ev.value} = 0L; } else { $loop }
         """.stripMargin
      } else {
        s"""
           |final int $n = $v.numElements();
           |boolean $anyNull = false;
           |for (int $j = 0; $j < $n; $j++) {
           |  if ($v.isNullAt($j)) { $anyNull = true; break; }
           |}
           |if ($anyNull) {
           |  ${ev.isNull} = true;
           |} else if ($n == 0) {
           |  ${ev.value} = 0L;
           |} else {
           |  $loop
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  /** Column API: `srpSignature($"v")` over an ARRAY<DOUBLE> column. */
  def srpSignature(v: Column, sigBits: Int = 16): Column =
    GraftSqlBridge.column(SrpSignature(GraftSqlBridge.expression(v), sigBits))
}
