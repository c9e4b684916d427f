package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY (delete before round end): dump `.explain("formatted")`
  * for named queries into plans/r16/<query>_<tag>.txt, with the eager
  * result cut disabled so the REAL plan is visible (the PlanAudit
  * convention). Usage: runMain graft.PlanDumpR16 <sfDir> <tag> <names,>
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(Hygiene.SkipEagerCutConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File("plans/r16").mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"plans/r16/${name}_$tag.txt")
      try w.println(txt) finally w.close()
      println(s"[plandump] wrote plans/r16/${name}_$tag.txt")
    }
    spark.stop()
  }
}
