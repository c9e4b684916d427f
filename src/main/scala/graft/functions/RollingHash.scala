package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable polynomial rolling hash as a codegen Catalyst expression:
  * fold `(acc * 31 + byte) % 1000000007` over the first `maxLen` bytes
  * of the string — identical to the portable SQL formulation used by
  * the fingerprint/simhash operators
  * (`aggregate(transform(sequence(...), i -> ascii(substring(s,i,1))), ...)`)
  * for ASCII input (the documented domain of the test corpus), but one
  * fused byte loop instead of three array HOFs and per-char substring
  * allocations.
  */
case class RollingHash(child: Expression, maxLen: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"
  // analysis-time rejection of non-string children (a LONG child would
  // otherwise pass analysis and fail mid-job with ClassCastException /
  // Janino errors) — the same input-type contract the sibling
  // expressions declare
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = math.min(bytes.length, maxLen)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // defineCodeGen wants an expression; emit a helper-block via class
      // function for clarity
      val fn = ctx.freshName("rollingHash")
      val fnDef = ctx.addNewFunction(fn,
        s"""
           |private long $fn(org.apache.spark.unsafe.types.UTF8String s) {
           |  byte[] $bytes = s.getBytes();
           |  int $n = java.lang.Math.min($bytes.length, $maxLen);
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc = ($acc * 31L + ($bytes[$i] & 0xff)) % 1000000007L;
           |  }
           |  return $acc;
           |}
         """.stripMargin)
      s"$fnDef($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def rollingHash(c: Column, maxLen: Int = Int.MaxValue): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c), maxLen))
}
