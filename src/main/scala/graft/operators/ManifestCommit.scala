package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic EXCLUSIVE manifest publish shared by [[SnapshotTable]] and
  * [[PqIndex]] — the one primitive that turns "write immutable files,
  * then publish a pointer" into snapshot-isolated commits:
  *
  *  - POSIX local filesystems: rename REPLACES the destination (a silent
  *    lost update), so the tmp manifest is published with a hard LINK —
  *    link(2) is atomic and fails with EEXIST when the target exists,
  *    making exactly one racer win;
  *  - HDFS: rename-without-replace is atomic and exclusive at the
  *    namenode (it refuses a rename onto an existing path). A false
  *    return with a NOW-EXISTING target is a lost race; a false return
  *    with no target is an IO failure and surfaces as IOException, never
  *    as a conflict (so callers don't burn rebase retries on a broken
  *    filesystem).
  *
  * Throws [[SnapshotTable.CommitConflict]] when another writer published
  * the target first. (An object store without atomic create-exclusive
  * needs a pointer swap or catalog on top — the caveat every lakehouse
  * format documents.)
  */
private[operators] object ManifestCommit {

  private def nonce(): String = java.util.UUID.randomUUID.toString.take(8)

  def publish(f: FileSystem, target: Path, content: String): Unit = {
    f.mkdirs(target.getParent)
    if (f.exists(target))
      throw new SnapshotTable.CommitConflict(s"$target already committed")
    val tmp = new Path(target.toString + s"__tmp_${nonce()}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
    val local = f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    if (local) {
      val won =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally f.delete(tmp, false)
      if (!won)
        throw new SnapshotTable.CommitConflict(s"$target already committed (lost the race)")
    } else {
      if (!f.rename(tmp, target)) {
        f.delete(tmp, false)
        if (f.exists(target))
          throw new SnapshotTable.CommitConflict(s"$target already committed (lost the race)")
        throw new java.io.IOException(
          s"manifest publish rename failed and the target does not exist — " +
            s"filesystem error, not a commit conflict ($target)")
      }
    }
  }
}
