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
        // PARQUET_TYPE_ILLEGAL), so it must be a session conf. Sessions
        // built by this repo (Verify/Bench/test fixtures) set it at
        // construction; for foreign sessions we set it here ONCE with a
        // warning, rather than silently — it changes how any other
        // nanos-timestamp parquet in the session is read.
        if (!spark.conf.getOption(NanosKey).contains("true")) {
          log.warn(s"events requires session-wide $NanosKey=true; " +
            "setting it now (prefer setting it at session construction)")
          spark.conf.set(NanosKey, "true")
        }
        spark.read.parquet(path(dir, "events"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        spark.read.parquet(path(dir, other))
    }
}
