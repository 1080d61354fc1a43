package graft.state

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** All engine state IO goes through the Hadoop `FileSystem` API, so the
  * state root works unchanged on any Spark-reachable store — local disk in
  * the sandbox, `hdfs://` / `s3a://` / `abfs://` on a real cluster (the
  * 10^10-URL posture: executors and the driver share no local disk).
  * Callers pass plain path strings; the scheme picks the filesystem.
  *
  * Durability note for object stores: directory rename is atomic on HDFS
  * and local filesystems (the two this engine's atomic-swap commit relies
  * on); S3A emulates rename by copy, so production on S3 should point the
  * state root at a consistent store (HDFS, or an Iceberg catalog replacing
  * `SnapshotStore` entirely — the module boundary exists for exactly that).
  */
private[graft] object StateIO {

  /** The active session's Hadoop conf (carries fs.* cluster settings);
    * plain defaults when no session exists (pure-JVM unit tests).
    */
  private def hconf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fs(p: Path): FileSystem = p.getFileSystem(hconf)

  def isDir(path: String): Boolean = {
    val p = new Path(path)
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  /** Child names of `dir`; empty when missing or not a directory. */
  def listNames(dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p) || !f.getFileStatus(p).isDirectory) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    fs(p).mkdirs(p)
  }

  def deleteRec(path: String): Unit = {
    val p = new Path(path)
    val f = fs(p)
    if (f.exists(p)) f.delete(p, true)
  }

  /** Move `src` onto `target`, replacing it — the commit primitive. One
    * rename (atomic on HDFS/local); the target is cleared first, so a crash
    * can only leave "old gone, new present under src", which readers treat
    * as uncommitted (they look for the target name).
    */
  def moveReplace(src: String, target: String): Unit = {
    val s = new Path(src); val t = new Path(target)
    val f = fs(t)
    if (f.exists(t)) f.delete(t, true)
    val parent = t.getParent
    if (parent != null && !f.exists(parent)) f.mkdirs(parent)
    if (!f.rename(s, t))
      throw new java.io.IOException(s"rename $src -> $target failed")
  }

  def writeString(path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fs(p).create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(path: String): String = {
    val p = new Path(path)
    val in = fs(p).open(p)
    try {
      val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
