package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pinned loaders for the driver-provided test tables
  * (FIXTURES.md §B). All tables are plain parquet; `events` has stored
  * its `ts` column as parquet TIMESTAMP(NANOS) in some rounds (which
  * Spark 4.1.2 refuses to read directly — PARQUET_TYPE_ILLEGAL) and as
  * TIMESTAMP(MICROS) in others (round 7 regenerated it as micros), so
  * the loader normalizes BOTH physical layouts to the same
  * `TimestampType` column:
  *  - nanos (read as a raw Long via
  *    `spark.sql.legacy.parquet.nanosAsLong`): truncate ns→µs with
  *    integer arithmetic (never a double division — 2^63 ns loses µs
  *    precision in a double), per FIXTURES.md §B.2;
  *  - micros (reads as TIMESTAMP_NTZ): cast to TimestampType — under
  *    the repo's pinned UTC session timezone this reinterprets the
  *    same wall-clock instant, matching what DuckDB's raw read sees.
  */
object Tables {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Session conf required (true) before any `events` read. */
  val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // The legacy key cannot be scoped to one read: Spark 4.1.2's
        // parquet schema conversion consults SQLConf only (verified —
        // a DataFrameReader option for the key still fails with
        // PARQUET_TYPE_ILLEGAL), so it must be a session conf. It only
        // changes how TIMESTAMP(NANOS) columns are read (micros files
        // are unaffected), and without it a nanos-era events file fails
        // schema inference outright. Sessions built by this repo
        // (Verify/Bench/test fixtures) set it at construction; for
        // foreign sessions we set it here ONCE with a warning, rather
        // than silently.
        if (!spark.conf.getOption(NanosKey).contains("true")) {
          log.warn(s"a nanos-era events table requires session-wide " +
            s"$NanosKey=true; setting it now (prefer setting it at " +
            "session construction)")
          spark.conf.set(NanosKey, "true")
        }
        val raw = spark.read.parquet(path(dir, "events"))
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => // nanos era
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampNTZType => // micros era
            raw.withColumn("ts",
              col("ts").cast(org.apache.spark.sql.types.TimestampType))
          case _ => raw // already TimestampType
        }
      case other =>
        spark.read.parquet(path(dir, other))
    }
}
