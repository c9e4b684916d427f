package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable polynomial rolling hash as a codegen Catalyst expression:
  * fold `(acc * 31 + codePoint) % 1000000007` over the first `maxLen`
  * CHARACTERS (Unicode code points) of the string — identical to the
  * portable SQL formulation used by the fingerprint/langid/split
  * operators (`aggregate(transform(sequence(1, least(len(s), maxLen)),
  * i -> ascii(substring(s, i, 1))), ...)`), where both Spark's `ascii`
  * and DuckDB's return the CODE POINT of the character, on ALL input.
  *
  * Code points, not bytes (adversarial-harness finding, r9): a byte
  * fold coincides with the SQL formulation on ASCII (the sf corpus)
  * but diverges on multibyte text — "东京 大阪" hashes its 13 UTF-8
  * bytes while the oracle folds its 5 code points, which silently
  * flipped a CJK document across q66's train/test split. One fused
  * UTF-8 decode loop, shared verbatim by the interpreted and codegen
  * paths ([[RollingHash.hashCodePoints]]).
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

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashCodePoints(input.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one shared implementation: the generated code calls the same
    // static fold the interpreted path runs (JIT inlines it), so the
    // two paths cannot drift
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.hashCodePoints($c, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** The fold itself: UTF-8 decode + `(acc*31 + cp) % 1e9+7` over the
    * first `maxLen` code points. Static (Java-visible) so Janino can
    * call it from generated code. Truncated trail bytes decode as 0 —
    * unreachable from Spark's always-valid UTF8String, present so
    * malformed input degrades to a value instead of an
    * ArrayIndexOutOfBounds. */
  @inline def hashCodePoints(s: UTF8String, maxLen: Int): Long = {
    val b = s.getBytes
    var acc = 0L
    var i = 0
    var count = 0
    while (i < b.length && count < maxLen) {
      val b0 = b(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var k = 1
      while (k < len) {
        cp = (cp << 6) | (if (i + k < b.length) b(i + k) & 0x3F else 0)
        k += 1
      }
      acc = (acc * 31L + cp) % 1000000007L
      i += len
      count += 1
    }
    acc
  }

  def rollingHash(c: Column, maxLen: Int = Int.MaxValue): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c), maxLen))
}
