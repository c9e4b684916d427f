package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (100 TB posture, SURVEY §7.4.6).
  *
  * A hot grouping/join key makes one shuffle partition arbitrarily large
  * no matter how many partitions exist. Salting splits each hot key into
  * `salts` sub-keys so the shuffle spreads, then recombines:
  *
  *  - aggregation: two-phase — partial aggregate on (key, salt), final
  *    aggregate on key. Works for any commutative re-aggregable metric.
  *  - broadcast-side explosion: replicate the small side once per salt
  *    value so a salted big side still finds its match.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; these
  * helpers are for the cases it doesn't (aggregations, and hash joins
  * you want deterministic control over).
  */
object Salting {

  /** Salted two-phase count+sum aggregation: semantically identical to
    * `df.groupBy(key).agg(count, sum(valueCol))` but shuffles on
    * (key, salt) first. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: Column,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("s"))
  }

  /** Replicate the (small) build side `salts` times so it can be joined
    * against a salted probe side on (key, salt). */
  def explodeForSalt(small: DataFrame, salts: Int = 16): DataFrame =
    small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
}
