package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

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
  * (same commit/latest/read contract).
  */
final class SnapshotStore(val root: String) {

  private def rootPath: Path = Paths.get(root)

  def versionDir(v: Int): String = s"$root/v=$v"
  def tablePath(v: Int, table: String): String = s"${versionDir(v)}/$table"

  def latestVersion: Option[Int] = {
    if (!Files.isDirectory(rootPath)) return None
    val vs = Files.list(rootPath).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v=") => s.substring(2).toInt }
      .toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Stage version `v`: `write` receives the staging directory; on return the
    * manifest is written and the directory is atomically renamed to `v=N`.
    */
  def commit(v: Int, manifestJson: String)(write: String => Unit): Unit = {
    val staging = rootPath.resolve(s".staging-$v")
    deleteRecursively(staging)
    Files.createDirectories(staging)
    write(staging.toString)
    Files.writeString(staging.resolve("_snapshot.json"), manifestJson)
    val target = rootPath.resolve(s"v=$v")
    deleteRecursively(target)
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
  }

  def manifest(v: Int): String =
    Files.readString(Paths.get(versionDir(v), "_snapshot.json"))

  /** Drop all versions below `keepFrom` (checkpoint retention). */
  def expire(keepFrom: Int): Unit =
    latestVersion.foreach { _ =>
      Files.list(rootPath).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("v=") && n.substring(2).toInt < keepFrom
        }
        .toSeq
        .foreach(deleteRecursively)
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
}

object SnapshotStore {
  /** Tiny JSON builder for manifests (flat string/long fields only). */
  def manifestJson(fields: (String, Any)*): String =
    fields.map {
      case (k, v: String) => s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
      case (k, v)         => s""""$k":$v"""
    }.mkString("{", ",", "}")
}
