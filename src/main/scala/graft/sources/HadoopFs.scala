package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Filesystem resolution that honors the active session's Hadoop
  * configuration (`spark.hadoop.*`, S3A credentials, defaultFS) and
  * the path's own URI scheme. `FileSystem.get(new Configuration())`
  * resolves the process-default filesystem with NONE of the session's
  * settings — on any non-local deployment that reads/writes the wrong
  * filesystem or fails outright.
  *
  * Driver-side call sites (plan/commit/abort) take [[sessionConf]];
  * executor-side code (reader/writer factories, foreachPartition
  * closures) must capture [[serializable]] on the driver and unwrap
  * `.value` inside the task.
  */
object HadoopFs {

  /** The active session's Hadoop conf (driver side); falls back to a
    * plain `Configuration` when no session exists (bare tool mains). */
  def sessionConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Driver-captured, task-serializable session conf. */
  def serializable(): SerializableConfiguration =
    new SerializableConfiguration(sessionConf())

  /** Resolve `path`'s filesystem through its URI scheme and `conf`. */
  def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)
}
