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
}
