package graft.state

/** Snapshot-versioned table store — the sandbox's Iceberg emulation.
  *
  * No Iceberg jars exist in this environment, so snapshot semantics are
  * provided by versioned Parquet directories plus a JSON manifest with an
  * atomic-rename commit:
  *
  * {{{
  *   root/v=N/table/part-....parquet   // one dir per state table
  *   root/v=N/_snapshot.json           // manifest: step, per-table counts, metrics
  * }}}
  *
  * A version directory becomes visible only via the final atomic rename of
  * `.staging-N` → `v=N`, so a killed run leaves either vN or vN+1 — never a
  * torn state. Resume = read `latestVersion`. The `state/` module isolates
  * this so a real Iceberg catalog can replace it without touching the engine
  * (same commit/latest/read contract). All IO goes through [[StateIO]]
  * (Hadoop `FileSystem`), so `root` may be a local path in the sandbox or
  * an `hdfs://` URI on a cluster — nothing here assumes a local disk.
  */
final class SnapshotStore(val root: String) {

  def versionDir(v: Int): String = s"$root/v=$v"
  def tablePath(v: Int, table: String): String = s"${versionDir(v)}/$table"

  def latestVersion: Option[Int] = {
    val vs = StateIO.listNames(root)
      .collect { case s if s.startsWith("v=") => s.substring(2).toInt }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Stage version `v`: `write` receives the staging directory; on return the
    * manifest is written and the directory is atomically renamed to `v=N`.
    */
  def commit(v: Int, manifestJson: String)(write: String => Unit): Unit = {
    val staging = s"$root/.staging-$v"
    StateIO.deleteRec(staging)
    StateIO.mkdirs(staging)
    write(staging)
    StateIO.writeString(s"$staging/_snapshot.json", manifestJson)
    StateIO.moveReplace(staging, versionDir(v))
  }

  def manifest(v: Int): String =
    StateIO.readString(s"${versionDir(v)}/_snapshot.json")

  /** Drop all versions below `keepFrom` (checkpoint retention). */
  def expire(keepFrom: Int): Unit =
    StateIO.listNames(root).foreach { n =>
      if (n.startsWith("v=") && n.substring(2).toInt < keepFrom)
        StateIO.deleteRec(s"$root/$n")
    }
}

object SnapshotStore {
  /** Tiny JSON builder for manifests (flat string/long fields only). */
  def manifestJson(fields: (String, Any)*): String =
    fields.map {
      case (k, v: String) => s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
      case (k, v)         => s""""$k":$v"""
    }.mkString("{", ",", "}")
}
