package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual queries by name without running the
  * whole Bench protocol. Reuses SparkEntry.queries (no duplicated query
  * constants to drift). Usage:
  *   runMain graft.TimeQuery <sfDir> <name1,name2> [runs=3]
  * Prints per-run and median seconds per query; clears caches before
  * every run like Bench does.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up (codegen + JIT), discarded
      val ts = (1 to runs).map { _ =>
        Hygiene.clearAll(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.size / 2)
      println(f"TIMEQ $name%s median=$med%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
