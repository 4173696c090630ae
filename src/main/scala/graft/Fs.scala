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

  /** /tmp hygiene for fingerprint-keyed caches: delete sibling directories
    * of `keep` that share `prefix` but carry a STALE fingerprint (the data
    * they were staged from has been regenerated, so nothing will ever read
    * them again). Bounds the tmp footprint of repeated Verify/Bench runs to
    * one live dir per cache. Racing sessions only ever delete dirs no
    * fingerprint-matching reader can reference; a concurrent deletion of
    * the same stale dir is harmless (deleteIfExists). */
  def reapStaleSiblings(keep: Path, prefix: String): Unit = {
    val parent = keep.getParent
    if (parent == null || !Files.exists(parent)) return
    val ls = Files.list(parent)
    try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          // ONLY names of the exact cache shape `<prefix><hex fingerprint>`
          // are reapable: a looser startsWith(prefix) would also delete a
          // concurrent session's live `<prefix><fp>_stage_<pid>` staging
          // dir mid-write (ensureCatalog's rename race support)
          n.startsWith(prefix) && n != keep.getFileName.toString &&
            n.stripPrefix(prefix).matches("[0-9a-f]{1,16}")
        }
        .toSeq // materialize before deleting (stream over a mutating dir)
        .foreach(p => try deleteRecursively(p) catch { case _: java.io.IOException => () })
    } finally ls.close()
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
