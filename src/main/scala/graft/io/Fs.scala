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

  /** Overwrite-via-staging snapshot write: write to `<path>__staging`,
    * atomically swap directories, and refresh the session's file-status
    * cache. The refresh is load-bearing: the cache keeps the pre-swap
    * listing forever (`metadataCacheTTLSeconds=-1`), so without it a later
    * read of the same path in this session resolves to deleted part-files.
    * Shared by every snapshot table writer (EtlRun dims, CorpusRun). */
  def overwriteViaStaging(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val staging = s"${path}__staging"
    df.write.mode("overwrite").parquet(staging)
    val target = java.nio.file.Paths.get(path)
    deleteRecursively(target)
    Files.move(java.nio.file.Paths.get(staging), target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    df.sparkSession.catalog.refreshByPath(path)
  }
}
