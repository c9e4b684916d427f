package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pinned loaders for the driver-provided test tables
  * (FIXTURES.md §B). All tables are plain parquet; `events` stores its
  * `ts` column as parquet TIMESTAMP(NANOS), which Spark 4.1.2 refuses to
  * read directly (PARQUET_TYPE_ILLEGAL). The documented workaround
  * (FIXTURES.md §B.2) reads it as a raw Long via
  * `spark.sql.legacy.parquet.nanosAsLong` and truncates ns→µs with
  * integer arithmetic (never a double division — 2^63 ns loses µs
  * precision in a double). The DuckDB oracle truncates identically.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path(dir, "events"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        spark.read.parquet(path(dir, other))
    }
}
