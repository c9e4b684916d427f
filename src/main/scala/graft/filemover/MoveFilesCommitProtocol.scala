package graft.filemover

import java.util.concurrent.{Executors, TimeUnit}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.mapreduce.JobContext
import org.apache.spark.internal.Logging
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol

/** Post-commit file relocation (FM1–FM9 of SURVEY.md §2.A) re-expressed
  * on Spark 4's [[org.apache.spark.internal.io.FileCommitProtocol]].
  *
  * Register session-wide and trigger per write:
  * {{{
  * spark.conf.set("spark.sql.sources.commitProtocolClass",
  *   "graft.filemover.MoveFilesCommitProtocol")
  * df.write.option("spark.writer.movefiles",
  *     "\$outputDirectory/part_\$category.csv")
  *   .partitionBy("category").csv(out)
  * }}}
  * The per-write option travels through
  * `sessionState.newHadoopConfWithOptions` into the job's Hadoop
  * configuration, where `commitJob` (driver-side) reads it back — the
  * same channel the reference uses (`MoveFilesOutputCommitter.scala:16`).
  *
  * Deviations from the reference, each deliberate (SURVEY §4.3):
  *  - the recursive listing is streamed, not `toList`'d, and the plan
  *    holds only (source, target) path pairs — metadata-scale memory;
  *  - renames run on a bounded thread pool (HDFS renames are O(1)
  *    metadata RPCs; latency, not bandwidth, dominates at fan-out);
  *  - every `fs.rename` result is checked and failures are logged
  *    (the reference silently ignores them, `M:52`);
  *  - the debug `println` of the plan (`M:49`) is structured logging.
  * Collision-gate and template semantics are identical (all-or-nothing,
  * same grammar, same `NoSuchElementException` error contract).
  */
class MoveFilesCommitProtocol(jobId: String, path: String,
    dynamicPartitionOverwrite: Boolean)
  extends SQLHadoopMapReduceCommitProtocol(jobId, path,
    dynamicPartitionOverwrite) with Logging {

  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[TaskCommitMessage]): Unit = {
    super.commitJob(jobContext, taskCommits)
    val conf = jobContext.getConfiguration
    val template = conf.get(MoveFilesCommitProtocol.MOVE_FILES_OPTION)
    // mid-migration guard: if the legacy committer shim is ALSO
    // registered, super.commitJob already performed the move — running
    // it again would re-render templates against already-moved files
    val legacyActive = Option(conf.get("spark.sql.sources.outputCommitterClass"))
      .contains(classOf[MoveFilesOutputCommitterCompat].getName)
    if (template != null && dynamicPartitionOverwrite) {
      // Deliberate bypass (SURVEY §4.3, parity with the reference whose
      // OutputCommitter-level hook never engages under dynamic mode).
      // Moving here would ALSO be a trap: dynamic overwrite clears only
      // the touched partitions, so a re-write onto a previously-moved
      // layout would list the earlier renders at the output root, fail
      // partition-value extraction, and abort the job after the data
      // commit (verified experimentally).
      logWarning(s"${MoveFilesCommitProtocol.MOVE_FILES_OPTION} ignored: " +
        "spark.sql.sources.partitionOverwriteMode=dynamic bypasses the " +
        "file mover; use static overwrite mode for template renames")
    } else if (template != null && !legacyActive) {
      MoverCore.moveFiles(new Path(path), conf, template)
    }
  }
}

/** The driver-side move itself, shared by both registration hooks
  * (commit protocol and the legacy outputCommitterClass shim). */
private[filemover] object MoverCore extends Logging {

  def moveFiles(outputPath: Path,
      conf: org.apache.hadoop.conf.Configuration, template: String): Unit =
    moveFiles(outputPath, conf, template, None)

  /** `fsOverride` exists for fault-injection tests (a FileSystem whose
    * rename fails); production paths resolve the FS from the path. */
  private[filemover] def moveFiles(outputPath: Path,
      conf: org.apache.hadoop.conf.Configuration, template: String,
      fsOverride: Option[FileSystem]): Unit = {
    val fs = fsOverride.getOrElse(outputPath.getFileSystem(conf))
    val parsed = PathTemplate.parse(template)
    val root = fs.resolvePath(new Path("/"))

    // FM2/FM3: stream the recursive listing; keep only path metadata.
    val files = ArrayBuffer.empty[Path]
    val it = fs.listFiles(outputPath, true)
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName != "_SUCCESS") files += p
    }

    // Dynamic-partition-overwrite guard for the LEGACY committer hook:
    // the Hadoop-level commitJob runs BEFORE the protocol's staging
    // moves, so under dynamic mode the listing contains
    // `.spark-staging-<jobId>/…` files — renaming them out of staging
    // would strand the protocol's delete-and-rename step (lost data).
    // The modern protocol hook declines via its constructor flag; this
    // detects the same condition from the only evidence the legacy
    // shim has. Static-mode writes never stage, so this never trips.
    if (files.exists(p => Iterator.iterate(p)(_.getParent)
        .takeWhile(_ != null)
        .exists(_.getName.startsWith(".spark-staging")))) {
      logWarning(s"movefiles: dynamic partition overwrite staging " +
        s"detected under $outputPath — the file mover is bypassed " +
        "(use static overwrite mode for template renames)")
      return
    }

    // FM4–FM7: pure plan + all-or-nothing collision gate.
    val planned = RenamePlanner.plan(files.toSeq, parsed, root, outputPath)
    if (planned.isEmpty && files.nonEmpty) {
      logInfo(s"movefiles: collision on target paths — nothing moved " +
        s"(${files.size} files left in place under $outputPath)")
      return
    }
    // No-op moves (target == source, or == the source's own directory —
    // e.g. a bare "$outputDirectory" template over a single file): local
    // FS returns false for these, which the checked renames below would
    // misreport as a job failure. The reference tolerated them only
    // because it ignored rename results (M:52); skipping is the checked
    // equivalent of the same observable behavior (file stays put).
    val renames = planned.filterNot { case (from, to) =>
      to == from || to == from.getParent
    }
    logInfo(s"movefiles: renaming ${renames.size} files per template '$template'")

    // FM8: parallel, checked renames on a bounded pool. On HDFS/object
    // stores rename THROWS rather than returning false, so exceptions
    // must be recorded too — and a pool that fails to drain is a
    // failure, not a success.
    val parallelism = math.min(16, math.max(1, renames.size))
    val pool = Executors.newFixedThreadPool(parallelism)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
    val drained = try {
      renames.foreach { case (from, to) =>
        pool.execute { () =>
          try {
            // deviation from the reference (documented): create the
            // target's parent first — the grammar supports multi-segment
            // templates that introduce NEW directory levels, but rename
            // into a missing parent returns false on local FS and HDFS
            // alike; the reference silently left such files unmoved
            // (M:52 ignores results). mkdirs is idempotent and races
            // benignly across the pool.
            val parent = to.getParent
            if (parent != null) fs.mkdirs(parent)
            if (!fs.rename(from, to)) {
              failures.add(from)
              logWarning(s"movefiles: rename failed: $from -> $to")
            }
          } catch {
            case e: Exception =>
              failures.add(from)
              logWarning(s"movefiles: rename threw for $from -> $to: $e")
          }
        }
      }
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.HOURS)
    } finally {
      pool.shutdownNow()
    }
    if (!drained) {
      throw new java.io.IOException(
        s"movefiles: rename pool did not drain within 1 hour " +
          s"(${renames.size} renames scheduled)")
    }
    if (!failures.isEmpty) {
      throw new java.io.IOException(
        s"movefiles: ${failures.size} of ${renames.size} renames failed " +
          s"(first: ${failures.peek()})")
    }
  }
}

object MoveFilesCommitProtocol {
  /** Per-write DataFrameWriter option holding the target template. */
  val MOVE_FILES_OPTION = "spark.writer.movefiles"
  /** Session conf key to register this protocol. */
  val COMMIT_PROTOCOL_CLASS = "spark.sql.sources.commitProtocolClass"

  /** Convenience: register on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set(COMMIT_PROTOCOL_CLASS, classOf[MoveFilesCommitProtocol].getName)
}
