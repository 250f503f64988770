package graft.core

import java.io.{ObjectInputStream, ObjectOutputStream}
import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for a Hadoop [[Configuration]], so executor
  * closures see the SparkSession's filesystem settings (S3/ABFS
  * credentials, custom schemes) instead of a bare `new Configuration()`.
  * Mirrors what Spark's own (package-private) SerializableConfiguration
  * does: write the config key/values through its Writable interface.
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object SerializableHadoopConf {
  def apply(conf: Configuration): SerializableHadoopConf = new SerializableHadoopConf(conf)

  /** The active session's Hadoop configuration, or a fresh default when no
    * session exists (driver-side convenience for API default arguments).
    */
  def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
}
