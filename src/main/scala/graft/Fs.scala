package graft

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by the mains and table setup. */
object Fs {
  /** Recursively delete a directory tree; closes the walk stream (a
    * leaked `Files.walk` holds directory descriptors until GC). */
  def deleteRecursively(path: Path): Unit = {
    if (!Files.exists(path)) return
    val stream = Files.walk(path)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    } finally stream.close()
  }
}
