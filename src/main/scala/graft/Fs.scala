package graft

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by the mains and table setup. */
object Fs {
  /** JSON string literal (quotes included): backslash, quote, and ALL
    * control chars (<0x20) escaped — a tab or CR in builder-authored
    * SQL would otherwise make the driver's json.load fail and silently
    * zero a round's correctness. ONE definition shared by Verify's
    * oracle dump and CleanApi's CLI so the two JSON surfaces cannot
    * drift. */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

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
