package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.C.11): exact decimal
  * sum-of-products `Σ price·(1−discount)`, replicating the engine's
  * decimal-carrier discipline (cast both factors to DECIMAL(18,4) before
  * multiplying) so its result hash-matches Q13's builtin
  * `sum(dec(price) * (1 - dec(discount)))` column.
  *
  * The buffer is a plain java BigDecimal — exact arithmetic, so the
  * merge order across partitions cannot change the result (the same
  * property the builtin decimal sum has).
  */
object SumOfProducts extends Aggregator[(Double, Double), JBigDecimal, JBigDecimal] {
  private val ONE = JBigDecimal.ONE

  // valueOf (= Double.toString semantics) mirrors the engine's
  // double→DECIMAL cast exactly; `new BigDecimal(d)` expands the binary
  // double instead, and the two round differently at scale 4 whenever
  // the shortest decimal form has ≥5 fractional digits (1.00005 → cast
  // 1.0001 vs binary-expansion 1.0000) — breaking the q13 hash match
  // the scaladoc promises
  private def dec4(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP)

  override def zero: JBigDecimal = JBigDecimal.ZERO

  override def reduce(b: JBigDecimal, in: (Double, Double)): JBigDecimal =
    b.add(dec4(in._1).multiply(ONE.subtract(dec4(in._2))))

  override def merge(a: JBigDecimal, b: JBigDecimal): JBigDecimal = a.add(b)

  override def finish(r: JBigDecimal): JBigDecimal = r

  override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
  override def outputEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
}
