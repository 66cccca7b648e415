package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}

/** Direct-write commit protocol: task output files land at their FINAL
  * destination paths — no `_temporary` staging tree, no task-commit
  * rename, no job-commit pass, no `_SUCCESS`.
  *
  * Safe for this engine BY PROTOCOL CONSTRUCTION, where the generic
  * Hadoop committer's ceremony is redundant: every write targets a
  * PRIVATE, exclusively-claimed version directory that becomes visible
  * to readers only when the graft commit MARKER lands afterwards
  * ([[Lakehouse]].writeVersion) — a failed or abandoned job leaves an
  * unmarked dir that no reader ever resolves, which is exactly the
  * atomicity the `_temporary` dance exists to provide on shared
  * directories. (Result dumps — Verify/ReplayDump output — are likewise
  * single-writer, read only after the action returns.)
  *
  * Why it matters: at the metered op bill (tools/MeteredFs) the default
  * committer costs ~9 fs ops per write job in staging mkdirs/renames/
  * listings — on an object store, 9 RPCs and two rename-copies per
  * commit, multiplied by every commit of a 100 TB ingest. This is the
  * same trade the S3A "magic" committer and Iceberg/Delta writers make:
  * let the table format's own commit point, not the filesystem layout,
  * define visibility.
  *
  * Failure semantics: file names derive from (jobId, task split), NOT
  * the attempt — a retried task rewrites the same final names, and
  * [[abortTask]] best-effort deletes the attempt's files (a leftover
  * partial is overwritten by the retry; a file from a task that never
  * retries sits in a version dir whose job failed, i.e. unmarked crash
  * debris vacuum already owns). Speculative execution must stay off
  * (graft sessions never enable it): two live attempts of one task
  * would race the same final file.
  */
class GraftDirectCommitProtocol(jobId: String, path: String,
    dynamicPartitionOverwrite: Boolean)
    extends FileCommitProtocol with Serializable {
  require(!dynamicPartitionOverwrite,
    "GraftDirectCommitProtocol does not support dynamic partition " +
      "overwrite — graft writes always target a fresh version dir")

  // task-local (each executor task deserializes its own copy): the
  // files THIS attempt created, for abortTask cleanup
  @transient private lazy val created =
    scala.collection.mutable.ArrayBuffer.empty[String]

  override def setupJob(jobContext: JobContext): Unit = ()
  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[TaskCommitMessage]): Unit = ()
  override def abortJob(jobContext: JobContext): Unit = ()
  override def setupTask(taskContext: TaskAttemptContext): Unit = ()
  override def commitTask(
      taskContext: TaskAttemptContext): TaskCommitMessage =
    new TaskCommitMessage(Nil)
  override def abortTask(taskContext: TaskAttemptContext): Unit = {
    val conf = taskContext.getConfiguration
    created.foreach { f =>
      try {
        val p = new Path(f)
        p.getFileSystem(conf).delete(p, false)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    created.clear()
  }

  override def newTaskTempFile(taskContext: TaskAttemptContext,
      dir: Option[String], spec: FileNameSpec): String = {
    val split = taskContext.getTaskAttemptID.getTaskID.getId
    val name = f"${spec.prefix}part-$split%05d-$jobId${spec.suffix}"
    val file = dir.map(d => new Path(new Path(path, d), name))
      .getOrElse(new Path(path, name)).toString
    created += file
    file
  }

  override def newTaskTempFileAbsPath(taskContext: TaskAttemptContext,
      absoluteDir: String, spec: FileNameSpec): String =
    throw new UnsupportedOperationException(
      "GraftDirectCommitProtocol: absolute-path task files (custom " +
        "partition locations) are not used by graft writes")
}
