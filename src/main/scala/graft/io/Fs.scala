package graft.io

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by the warehouse writers. */
object Fs {
  /** Delete a file or directory tree (no-op when absent). */
  def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    if (Files.isDirectory(p)) {
      val ls = Files.list(p)
      try ls.forEach(deleteRecursively(_)) finally ls.close()
    }
    Files.delete(p)
  }

  /** Move every data file under `src` into `dst`, preserving relative
    * partition subdirectories (`col=value/...`) and merging with whatever
    * `dst` already holds. Spark part-file names carry task UUIDs, so moves
    * never collide with existing files, and re-running a half-finished
    * promotion simply moves the remainder — the operation is idempotent.
    * Used to make appends all-or-nothing: the stage writes to a staging
    * dir first and only a fully successful job's files are promoted. */
  def promoteInto(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    val ls = Files.list(src)
    try ls.forEach { entry =>
      val name = entry.getFileName.toString
      if (Files.isDirectory(entry)) promoteInto(entry, dst.resolve(name))
      else if (name.endsWith(".parquet")) // skip _SUCCESS / .crc markers
        Files.move(entry, dst.resolve(name))
    } finally ls.close()
  }

  /** True when `p` holds a Spark `_SUCCESS` job-commit marker. */
  def hasSuccessMarker(p: Path): Boolean = Files.exists(p.resolve("_SUCCESS"))
}
