package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity between two
  * `ARRAY<DOUBLE>` columns (SURVEY.md §2.C.11): the codegen fast path
  * for Q37's HOF formulation. Both the interpreted and generated paths
  * reduce element-order-sequentially, so results are bit-identical to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x) / …`
  * (determinism rule §2.C.0.4) for EQUAL-LENGTH inputs — the declared
  * domain (fixed-dimension embeddings). On unequal lengths this
  * truncates to the common prefix, where the HOF chain would return
  * NULL (zip_with pads with null); don't rely on either behavior.
  *
  * Unlike the HOF chain (three array traversals plus lambda-variable
  * boxing per element), this runs one fused loop per row inside
  * whole-stage codegen.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // Declared input contract: ARRAY<DOUBLE> on both sides. The eval/
  // codegen bodies read 8-byte slots, so without this a pure-SQL caller
  // passing the fixture's ARRAY<FLOAT> column would silently read
  // garbage; ImplicitCastInputTypes instead inserts the float→double
  // cast at analysis time (and rejects non-castable inputs).
  // (return type inferred as Seq[ArrayType] — AbstractDataType itself is
  // private[sql]; the covariant refinement satisfies the trait)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  /** Can this child's schema put a null INSIDE the array? */
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  // A null ELEMENT in either array yields SQL NULL (matching the
  // declared ARRAY<DOUBLE> contract, whose containsNull is permissive):
  // silently reading the slot would produce garbage — the exact failure
  // class the input-type contract exists to close. The result is
  // therefore nullable whenever an element can be null, not only when a
  // whole input can be (without this the planner erases the isNull
  // tracking and the NULL result is lost).
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var j = 0
    while (j < n) {
      if (x.isNullAt(j) || y.isNullAt(j)) return null
      j += 1
    }
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val anyNull = ctx.freshName("anyNull")
      val j = ctx.freshName("j")
      val loop =
        s"""
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = $x.getDouble($i);
           |  double $yv = $y.getDouble($i);
           |  $dot += $xv * $yv;
           |  $nx += $xv * $xv;
           |  $ny += $yv * $yv;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         """.stripMargin
      if (!elemNullable(left) && !elemNullable(right)) {
        // schema proves no null elements: pure branch-free fused loop
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |$loop
         """.stripMargin
      } else {
        // two passes: a bit-test scan for null elements first, so the
        // floating-point reduction loop stays branch-free. The scan
        // costs ~50% on the heaviest all-pairs consumer (q45: 0.94 →
        // 1.45 s at sf0.1) — the price of SQL-correct NULL semantics
        // when the schema can't rule nulls out; at scale the right
        // lever is tightening containsNull upstream (one validation
        // pass per ARRAY, not per PAIR).
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |boolean $anyNull = false;
           |for (int $j = 0; $j < $n; $j++) {
           |  if ($x.isNullAt($j) || $y.isNullAt($j)) { $anyNull = true; break; }
           |}
           |if ($anyNull) {
           |  ${ev.isNull} = true;
           |} else {
           |  $loop
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Register `cosine_sim` for SQL use on this session. Idempotent:
    * re-registering an already-present function would log a
    * `SimpleFunctionRegistry: ... replaced` warning per call, which
    * pollutes every multi-query JVM (each bench/verify query calls
    * through here). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident =
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")
    if (!registry.functionExists(ident)) {
      registry.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    }
  }
}
