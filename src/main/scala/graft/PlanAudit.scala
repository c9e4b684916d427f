package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the join/exchange/scan profile of every query's
  * physical plan — the 100 TB smell test (SURVEY §7.4.6). Flags
  * cartesian products and large-side nested-loop joins.
  *
  * Runs with [[Hygiene.SkipEagerCutConf]] set, so queries that eagerly
  * `localCheckpoint` their result (q44, q47, q105, x105, x68, q52, q79
  * — the cache-hygiene pattern) audit their REAL pre-checkpoint plan
  * instead of the post-checkpoint `Scan ExistingRDD` that blinded
  * PLANS_r8.txt (VERDICT r8 task 4). The audit FAILS (nonzero exit) if
  * any query's profile comes back empty — a regression to the blind
  * spot — or if any plan contains a CartesianProduct.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Hygiene.SkipEagerCutConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var empty = List.empty[String]
    var cartesians = List.empty[String]
    var errors = List.empty[String]
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
        ).filter(_._2 > 0)
        if (profile.isEmpty) empty ::= name
        if (count("CartesianProduct") > 0) cartesians ::= name
        val line = profile.map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(f"[audit] $name%-22s $line")
      } catch {
        case e: Throwable =>
          errors ::= name
          println(s"[audit] $name ERROR ${e.getMessage}")
      }
    }
    println(s"[audit] TOTAL queries=${SparkEntry.queries.size} " +
      s"empty=${empty.size} cartesians=${cartesians.size} " +
      s"errors=${errors.size}")
    spark.stop()
    if (empty.nonEmpty || cartesians.nonEmpty || errors.nonEmpty) {
      Console.err.println(s"[audit] FAIL empty=$empty " +
        s"cartesians=$cartesians errors=$errors")
      sys.exit(1)
    }
  }
}
