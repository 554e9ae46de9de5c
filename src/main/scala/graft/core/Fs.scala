package graft.core

/** Tiny local-filesystem helpers for the engine's own staging artifacts
  * (checkpoints, symlink stages, sentinel dirs). These paths are always
  * local — Spark-managed table data goes through the warehouse/Hadoop FS
  * APIs, never through here. */
object Fs {

  /** Recursive delete; tolerates a vanishing tree (concurrent sweepers):
    * Files.walk itself throws UncheckedIOException when entries disappear
    * mid-iteration, so the whole pass — not just each deleteIfExists — is
    * fenced, and the walk stream is closed either way. */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p))
      try {
        val walk = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } finally walk.close()
      } catch {
        case _: java.io.UncheckedIOException | _: java.nio.file.NoSuchFileException => ()
      }

  /** Directory listing materialized with the underlying stream CLOSED —
    * a bare `Files.list(...)` holds a directory fd until GC. */
  def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val st = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toSeq
    } finally st.close()
  }

  /** Age of a path in nanoseconds via its mtime (0 if it can't be read). */
  def ageNanos(p: java.nio.file.Path): Long =
    scala.util.Try(
      (System.currentTimeMillis() -
        java.nio.file.Files.getLastModifiedTime(p).toMillis) * 1000000L
    ).getOrElse(0L)
}
