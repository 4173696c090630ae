package graft.tools

import graft.table.IcebergLite

/** Metadata write-amplification probe for the two-level manifest layout:
  * `sbt "runMain graft.tools.MetaScale [appends]"`.
  * Stacks N single-file appends on one table and reports the actual
  * metadata bytes written (snapshots + manifests) vs what the inline
  * layout would have written (each commit re-rendering the full list —
  * sum over commits of per-entry bytes). BASELINE.md quotes this. */
object MetaScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 256
    val spark = graft.GraftSession.local(8)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("meta_scale")
    val t = root.resolve("t").toString
    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      IcebergLite.append(spark,
        Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), t, Seq("k"), s"c$i")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val meta = java.nio.file.Paths.get(t, "_graft_meta")
    def bytesOf(prefix: String): Long = {
      val st = java.nio.file.Files.list(meta)
      try st.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix))
        .map(java.nio.file.Files.size(_)).sum
      finally st.close()
    }
    val snapBytes = bytesOf("snapshot-")
    val manBytes = bytesOf("manifest-")
    // inline layout writes the WHOLE list per commit: commit i renders i+1
    // entries, so total entry-bytes = perEntry * n(n+1)/2 (+ fixed headers).
    // perEntry from the smallest manifest (a single-entry delta) — the mean
    // would be inflated by the periodic merge rewrites
    val perEntry = {
      val st = java.nio.file.Files.list(meta)
      try st.iterator().asScala
        .filter(_.getFileName.toString.startsWith("manifest-"))
        .map(java.nio.file.Files.size(_)).min.toDouble
      finally st.close()
    }
    val inlineEquiv = (perEntry * n.toLong * (n + 1) / 2).toLong + snapBytes
    val actual = snapBytes + manBytes
    println(f"""{"probe":"meta_scale","appends":$n,"wall_s":$wall%.1f,""" +
      f""""snapshot_bytes":$snapBytes,"manifest_bytes":$manBytes,""" +
      f""""actual_meta_bytes":$actual,"inline_equiv_bytes":$inlineEquiv,""" +
      f""""amplification_saved":${inlineEquiv.toDouble / actual}%.1f}""")
    graft.Fs.deleteRecursively(root)
    spark.stop()
  }
  private implicit class IterAdapter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
