package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** TEMPORARY profiling main (delete before committing): per-job trace
  * of one query — job id, duration, description/callsite — to find
  * where a sequential-job-bound query's wall clock goes.
  * Usage: runMain graft.ProfR16 <sfDir> <queryName> [runs=1]
  */
object ProfR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, (e.time, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, desc) =>
          done.add((e.jobId, t0, e.time, desc))
        }
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    (1 to runs).foreach { r =>
      Hygiene.clearAll(spark)
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._2)
      val base = rows.headOption.map(_._2).getOrElse(0L)
      println(f"== $name run $r wall=$wall%.2f s, ${rows.size} jobs ==")
      var prevEnd = base
      rows.foreach { case (id, s0, e0, desc) =>
        val gap = s0 - prevEnd
        prevEnd = math.max(prevEnd, e0)
        println(f"job $id%4d @${(s0 - base) / 1000.0}%7.2f dur=${(e0 - s0) / 1000.0}%6.2f gap=${gap / 1000.0}%6.2f  ${desc.take(90)}")
      }
      val busy = rows.map(r2 => r2._3 - r2._2).sum / 1000.0
      println(f"== sum(job dur)=$busy%.2f s over wall $wall%.2f s ==")
    }
    spark.stop()
  }
}
