package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the join/exchange/scan profile of every query's
  * physical plan — the 100 TB smell test (SURVEY §7.4.6). Flags
  * cartesian products and large-side nested-loop joins.
  *
  * Known blind spot: queries that EAGERLY localCheckpoint their result
  * (q44, q47, q105, x105, x68 — the cache-hygiene pattern) audit as an
  * empty profile, because the returned frame's plan is just the
  * post-checkpoint `Scan ExistingRDD`. Their pre-checkpoint plan
  * quality is asserted where it matters — in their ScalaTest specs
  * (zero-exchange band join, PartitionFilters, candidate pins) — so an
  * empty line here means "eager", not "planless". A query moving from
  * a full profile to empty across rounds is a query that GAINED the
  * eager cut (x68 did between the r7 and r8 audits).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val s = plan.toString
        def count(p: String) = p.r.findAllIn(s).size
        val profile = Seq(
          "BroadcastHashJoin" -> count("BroadcastHashJoin"),
          "SortMergeJoin" -> count("SortMergeJoin"),
          "ShuffledHashJoin" -> count("ShuffledHashJoin"),
          "BNLJoin" -> count("BroadcastNestedLoopJoin"),
          "Cartesian" -> count("CartesianProduct"),
          "Exchange" -> count("Exchange(?!Like)"),
          "Scan" -> count("Scan parquet|Scan csv|Scan orc|Scan json"),
        ).filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(f"[audit] $name%-22s $profile")
      } catch {
        case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
