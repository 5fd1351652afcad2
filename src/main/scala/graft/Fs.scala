package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem helpers that resolve the filesystem OF the path being
  * asked about, not the configured default. `FileSystem.get(conf)`
  * answers for `fs.defaultFS` only — against an index artifact on a
  * non-default scheme (s3a://bucket/…, hdfs://nn/…) its `exists`
  * returns false and a tombstone/manifest side-table would be
  * SILENTLY ignored: deleted content served as if never opted out.
  * `Path.getFileSystem` routes by the path's own scheme, so the same
  * code is correct on local tmp dirs and on object storage.
  */
object Fs {

  private def resolve(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = resolve(spark, path)
    fs.exists(p)
  }

  def deleteRecursive(spark: SparkSession, path: String): Unit = {
    val (fs, p) = resolve(spark, path)
    fs.delete(p, true)
  }

  /** Names of the immediate subdirectories of `path` (empty when the
    * path doesn't exist). Used by the clustered-optimize commit to
    * enumerate which cluster dirs the partitioned write produced —
    * a clusters-bounded driver fetch. */
  def listDirNames(spark: SparkSession, path: String): Seq[String] = {
    val (fs, p) = resolve(spark, path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }
}
