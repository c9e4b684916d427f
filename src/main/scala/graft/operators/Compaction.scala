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

  /** Test seam (VERDICT r12 task 3): the racing-reader specs must hold
    * a swap INSIDE each of its two windows while a probe runs from a
    * second thread — a sleep cannot pin that interleave. Fires with
    * `"swap-mid"` between the two renames (the no-live-dir window) and
    * `"swap-pre-clean"` after the new tree is live but before the
    * `__old` copy is deleted. None (a no-op) in production — same
    * spirit as [[graft.queries.CorpusPipelineDelta]]'s CrashPointConf. */
  @volatile private[graft] var pauseHook: Option[String => Unit] = None
  private def pause(point: String): Unit = pauseHook.foreach(_(point))

  /** Un-crash a half-finished [[swapDir]]: if `live` is missing but its
    * `…__old` sibling exists, a previous swap died between its two
    * renames — put the original back. Safe to call unconditionally
    * before compacting. */
  def recoverSwap(spark: SparkSession, live: String): Unit = {
    val livP = new Path(live)
    val fs = livP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldP = new Path(s"${live}__old")
    if (!fs.exists(livP) && fs.exists(oldP))
      require(fs.rename(oldP, livP), s"swap recovery: restore $live failed")
    ()
  }

  /** Swap `tmp` over `live` through a rename pair. The crash window
    * between the two renames leaves NO live dir — a LOUD failure on the
    * next read, never silent data loss — and [[recoverSwap]] (or a
    * manual `…__old` rename) restores it. The `…__old` copy is deleted
    * once the swap commits: there is no rollback after a SUCCESSFUL
    * swap, so a caller must validate `tmp`'s contents before swapping
    * (the compaction specs assert content equality pre/post). */
  def swapDir(spark: SparkSession, live: String, tmp: String): Unit = {
    val livP = new Path(live)
    val fs = livP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldP = new Path(s"${live}__old")
    if (fs.exists(oldP)) fs.delete(oldP, true)
    require(fs.rename(livP, oldP), s"swap: rename $live aside failed")
    pause("swap-mid")
    require(fs.rename(new Path(tmp), livP),
      s"swap: rename $tmp into place failed ($live is at $oldP)")
    pause("swap-pre-clean")
    fs.delete(oldP, true)
    ()
  }

  /** Hive-partition-aware IN-PLACE compaction: each `<partPrefix>*`
    * leaf directory of `dir` is compacted (shuffle-free, per
    * [[compact]]) into a parallel tree that preserves the hive layout —
    * and with it partition pruning — then the tree swaps over the
    * original via [[swapDir]]. Crash-recoverable ([[recoverSwap]] runs
    * first), contents untouched, file count drops to
    * ~⌈bytes/targetBytes⌉ per leaf. Root entries that are NOT
    * `<partPrefix>*` leaf dirs (a `_SUCCESS` marker, side metadata
    * files or dirs) are copied into the new tree before the swap, so
    * they survive compaction byte-for-byte. Not concurrency-safe
    * against a simultaneous writer — the maintenance window is the
    * caller's (enforceable via [[MaintenanceLease]]).
    * Returns (filesBefore, filesAfter). */
  def compactPartitioned(spark: SparkSession, dir: String,
      partPrefix: String, targetBytes: Long): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    recoverSwap(spark, dir)
    def leaves(): Array[Path] = fs.listStatus(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partPrefix))
      .map(_.getPath)
    def countParts(): Int = leaves().map(p => fs.listStatus(p)
      .count(f => f.isFile && f.getPath.getName.startsWith("part-"))).sum
    // Zero matching leaves (degenerate-but-valid: empty table, wrong
    // prefix) must be a no-op — entering the swap would rename the live
    // dir aside and then fail on the never-created tmp tree,
    // manufacturing the no-live-dir crash state on a healthy table
    // (ADVICE r9).
    if (leaves().isEmpty) return (0, 0)
    val before = countParts()
    val tmp = s"${dir}__compacting"
    if (fs.exists(new Path(tmp))) fs.delete(new Path(tmp), true)
    leaves().foreach { leaf =>
      compact(spark, leaf.toString, s"$tmp/${leaf.getName}", targetBytes)
    }
    // Carry non-leaf root entries (copy, not move: the original tree
    // stays intact until the swap commits, keeping the crash window
    // recoverable) — without this a root _SUCCESS or any side file a
    // future caller keeps beside the partitions would silently vanish
    // in the swap (ADVICE r9).
    fs.listStatus(new Path(dir))
      .filterNot(s => s.isDirectory && s.getPath.getName.startsWith(partPrefix))
      .foreach { side =>
        org.apache.hadoop.fs.FileUtil.copy(fs, side.getPath,
          fs, new Path(s"$tmp/${side.getPath.getName}"), false, conf)
      }
    swapDir(spark, dir, tmp)
    (before, countParts())
  }

  /** Rewrite `in` (a flat parquet dir) into `out` with ~`targetBytes`
    * files. Returns before/after stats. `out` must differ from `in` —
    * the swap (rename over the original) is the caller's commit step:
    * [[swapDir]] for rename-capable filesystems, or the file-mover
    * protocol / a metastore swap where stronger atomicity exists.
    *
    * `sortCol` (optional) locally sorts each merged output partition —
    * still shuffle-free, same row multiset — so that row-group min/max
    * stats on that column stay tight through the rewrite. Without it,
    * coalesce concatenates the input files' sorted runs and a merged
    * row group can span the column's whole range, defeating any reader
    * that prunes row groups by predicate on it (the signature store's
    * toksets ledger is the motivating caller).
    */
  def compact(spark: SparkSession, in: String, out: String,
      targetBytes: Long, sortCol: Option[String] = None): Stats = {
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
    val merged = spark.read.parquet(in).coalesce(n)
    sortCol.fold(merged)(c => merged.sortWithinPartitions(c))
      .write.mode("overwrite").parquet(out)
    val outPath = new Path(out)
    val outParts = outPath.getFileSystem(conf).listStatus(outPath)
      .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    Stats(parts.length, totalBytes, outParts)
  }
}
