package graft.filemover

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.output.FileOutputCommitter

/** Compatibility shim for the reference's legacy registration hook
  * (`spark.sql.sources.outputCommitterClass`, reference README.md:18):
  * Spark's `SQLHadoopMapReduceCommitProtocol` still reflectively
  * instantiates this Hadoop committer when that conf is set, so existing
  * reference deployments can switch by changing only the class name.
  * All semantics are delegated to the same [[MoverCore]] the modern
  * [[MoveFilesCommitProtocol]] uses.
  */
class MoveFilesOutputCommitterCompat(outputPath: Path,
    context: TaskAttemptContext)
  extends FileOutputCommitter(outputPath, context) {

  override def commitJob(context: JobContext): Unit = {
    super.commitJob(context)
    val template = context.getConfiguration
      .get(MoveFilesCommitProtocol.MOVE_FILES_OPTION)
    if (template != null) {
      MoverCore.moveFiles(outputPath, context.getConfiguration, template)
    }
  }
}
