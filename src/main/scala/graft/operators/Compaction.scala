package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a parquet directory into files near a
  * target size. Long-running pipelines accrete small files (per-batch
  * streaming commits, over-parallel writes); at 100 TB scan cost is
  * dominated by file-open/footer overhead once the average file drops
  * below a few MB, and compaction is the standing maintenance job that
  * fixes it.
  *
  * The rewrite uses `coalesce`, not `repartition`: merging partitions
  * down needs no shuffle (each output task reads a disjoint set of
  * input files whole), so the job moves every byte exactly once. The
  * trade is balance — coalesce packs input partitions greedily, so
  * output files vary around the target instead of matching it; for a
  * maintenance job that halves file counts, shuffle-free wins. Callers
  * that need exact sizing (or size-sorted clustering) should
  * `repartitionByRange` on their sort key instead and pay the shuffle.
  *
  * Compact per leaf directory (one hive partition at a time) — merging
  * across partition boundaries would destroy partition pruning.
  */
object Compaction {
  final case class Stats(inFiles: Int, inBytes: Long, outFiles: Int)

  /** Rewrite `in` (a flat parquet dir) into `out` with ~`targetBytes`
    * files. Returns before/after stats. `out` must differ from `in` —
    * the swap (rename over the original) is the caller's commit step,
    * where the file-mover protocol or a metastore swap provides
    * atomicity.
    */
  def compact(spark: SparkSession, in: String, out: String,
      targetBytes: Long): Stats = {
    require(in != out, "compact target must differ from source")
    val conf = spark.sparkContext.hadoopConfiguration
    val inPath = new Path(in)
    val fs = inPath.getFileSystem(conf)
    val parts = fs.listStatus(inPath)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    // Enforce the per-leaf-dir contract instead of trusting the caller:
    // on a hive-partitioned (or empty) input the top-level listing holds
    // no part- files, totalBytes would be 0 and n 1 — and the read below
    // would still see the nested data, silently coalescing an arbitrarily
    // large partitioned dataset into ONE file and discarding its layout.
    require(parts.nonEmpty,
      s"compact expects a flat parquet dir with part- files at the top " +
        s"level, found none in $in (compact per leaf partition)")
    val totalBytes = parts.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(in).coalesce(n)
      .write.mode("overwrite").parquet(out)
    val outPath = new Path(out)
    val outParts = outPath.getFileSystem(conf).listStatus(outPath)
      .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    Stats(parts.length, totalBytes, outParts)
  }
}
