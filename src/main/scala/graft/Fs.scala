package graft

import java.nio.file.{Files, Path}

/** Tiny shared filesystem helpers (local-FS scope — test fixtures, model
  * exports; production sinks talk to object stores instead). */
object Fs {

  /** Delete a file tree, deepest first; missing paths are a no-op. */
  def deleteRecursively(root: Path): Unit = {
    if (!Files.exists(root)) return
    val walk = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    } finally walk.close()
  }

  /** Cheap content fingerprint of a directory or file: 64-bit FNV over the
    * sorted (relative-name, size, mtime) listing — changes whenever the
    * underlying data files are regenerated, without reading their bytes. */
  def listingFingerprint(root: Path): String = {
    var h = 0xcbf29ce484222325L
    def mix(s: String): Unit = {
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    }
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq
          .filter(Files.isRegularFile(_))
          .map(p => (root.relativize(p).toString, Files.size(p),
            Files.getLastModifiedTime(p).toMillis))
          .sortBy(_._1)
          .foreach { case (n, s, m) => mix(n); mix(s.toString); mix(m.toString) }
      } finally walk.close()
    }
    java.lang.Long.toHexString(h)
  }
}
