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
  * NULL (the HOF chain nulls out the same way).
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

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
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
      sig = sig * 2 + (if (dot >= 0.0) 1L else 0L)
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
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |final int $n = $v.numElements();
         |boolean hasNullElem = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($v.isNullAt($j)) { hasNullElem = true; break; }
         |}
         |if (hasNullElem) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $h = 0; $h < $sigBits; $h++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final long $hash = $xxh.hashInt($h * $Mult + $i, ${Seed}L);
         |      $dot += $v.getDouble($i) * ((($hash & 1L) == 0L) ? 1.0 : -1.0);
         |    }
         |    $sig = $sig * 2 + (($dot >= 0.0) ? 1L : 0L);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  /** Column API: `srpSignature($"v")` over an ARRAY<DOUBLE> column. */
  def srpSignature(v: Column, sigBits: Int = 16): Column =
    GraftSqlBridge.column(SrpSignature(GraftSqlBridge.expression(v), sigBits))
}
