package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

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

  private def dec4(d: Double): JBigDecimal =
    new JBigDecimal(d, MathContext.UNLIMITED).setScale(4, RoundingMode.HALF_UP)

  override def zero: JBigDecimal = JBigDecimal.ZERO

  override def reduce(b: JBigDecimal, in: (Double, Double)): JBigDecimal =
    b.add(dec4(in._1).multiply(ONE.subtract(dec4(in._2))))

  override def merge(a: JBigDecimal, b: JBigDecimal): JBigDecimal = a.add(b)

  override def finish(r: JBigDecimal): JBigDecimal = r

  override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
  override def outputEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
}
