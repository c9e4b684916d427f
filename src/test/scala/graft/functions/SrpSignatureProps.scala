package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for SrpSignature's interpreted eval against an
  * independently-written reference: same contract (hyperplane h
  * component j = ±1 from xxhash64(h·1000003 + j) parity; bit h = sign
  * of the dot product under Spark's double ordering; acc·2+bit
  * packing), structured differently (precomputed sign matrix, fold),
  * over random vectors including negatives, zeros, ±0.0, NaN,
  * infinities, and empty arrays. The codegen path is covered by
  * LlmOps5Spec's parquet-backed equality test.
  */
class SrpSignatureProps extends AnyFunSuite {

  private val SigBits = 16
  private val Mult = 1000003

  private def reference(v: Array[Double]): Long = {
    // empty → 0 is part of the contract (the HOF twin's zip_with over
    // sequence(0, -1) null-pads every dot product and IF takes 0)
    if (v.isEmpty) return 0L
    val signs = Array.tabulate(SigBits, v.length)((h, j) =>
      if ((XXH64.hashInt(h * Mult + j, 42L) & 1L) == 0L) 1.0 else -1.0)
    (0 until SigBits).foldLeft(0L) { (acc, h) =>
      val dot = v.indices.foldLeft(0.0)((d, j) => d + v(j) * signs(h)(j))
      acc * 2 + (if (SQLOrderingUtil.compareDoubles(dot, 0.0) >= 0) 1L else 0L)
    }
  }

  private def exprEval(v: Array[Double]): Long = {
    val lit = Literal.create(v, ArrayType(DoubleType, containsNull = false))
    SrpSignature(lit, SigBits).eval(null).asInstanceOf[Long]
  }

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val special = Gen.oneOf(0.0, -0.0, Double.NaN,
    Double.PositiveInfinity, Double.NegativeInfinity, 1e308, -1e308)
  private val component = Gen.frequency(
    9 -> Gen.chooseNum(-1e6, 1e6).map(_.toDouble),
    1 -> special)
  private val vec = for {
    n <- Gen.chooseNum(0, 80)
    xs <- Gen.listOfN(n, component)
  } yield xs.toArray

  test("expression eval matches the independent reference on random vectors") {
    val vs = samples(vec)
    assert(vs.nonEmpty)
    assert(vs.exists(_.isEmpty), "generator should cover empty arrays")
    assert(vs.exists(_.exists(_.isNaN)), "generator should cover NaN")
    vs.foreach { v =>
      assert(exprEval(v) == reference(v), s"mismatch on ${v.mkString(",")}")
    }
  }

  test("null array yields null; 16-bit signatures stay in range") {
    val nullLit = Literal.create(null, ArrayType(DoubleType))
    assert(SrpSignature(nullLit, SigBits).eval(null) == null)
    samples(vec, 100).foreach { v =>
      val sig = exprEval(v)
      assert(sig >= 0L && sig < (1L << SigBits))
    }
  }

}
