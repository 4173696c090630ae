package graft.tools

import org.apache.spark.sql.functions._

/**
 * Scale probe for file-targeted copy-on-write MERGE: builds an IcebergLite
 * table of `nFiles` key-disjoint files (`rowsPerFile` rows each, key stats
 * collected), then times (a) a narrow merge whose update keys land in ONE
 * file's range and (b) a wide merge spanning every file. Evidence that
 * upsert cost scales with TOUCHED files, not table size — the property a
 * daily 0.1% upsert of a 100 TB table depends on:
 * `sbt "runMain graft.tools.MergeScale [nFiles] [rowsPerFile]"`.
 */
object MergeScale {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 32
    val rowsPer = if (args.length > 1) args(1).toLong else 200000L
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.table.IcebergLite

    val root = java.nio.file.Files.createTempDirectory("graft_merge_scale")
    val t = root.resolve("t").toString
    val n = nFiles * rowsPer
    val base = spark.range(n).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"), (col("id") % 97).as("w"))
      .repartitionByRange(nFiles, col("k"))
    IcebergLite.append(spark, base, t, Seq("k"), "base")
    val files0 = IcebergLite.readSnapshot(t).get.files.size

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def dirBytes(commitId: String): Long = {
      val d = java.nio.file.Paths.get(t, "data", commitId)
      val st = java.nio.file.Files.walk(d)
      try st.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally st.close()
    }
    // (a) narrow: 1000 update keys inside the first file's range
    val narrowUp = spark.range(1000).select(col("id").as("k"),
      lit("NARROW").as("v"), lit(-1L).as("w"))
    val wNarrow = timed(IcebergLite.merge(spark, t, narrowUp, Seq("k"), Seq("k"), "narrow"))
    val carriedNarrow = IcebergLite.readSnapshot(t).get.files
      .count(f => !f.path.contains("/data/narrow/"))
    // (b) wide: 1000 keys strided across EVERY file's range
    val wideUp = spark.range(1000).select((col("id") * (n / 1000)).as("k"),
      lit("WIDE").as("v"), lit(-2L).as("w"))
    val wWide = timed(IcebergLite.merge(spark, t, wideUp, Seq("k"), Seq("k"), "wide"))
    // (c) merge-on-read of the same wide key set: write cost is O(updates)
    // regardless of spread — no data file rewritten, just updates + deletes
    val morUp = spark.range(1000).select((col("id") * (n / 1000)).as("k"),
      lit("MOR").as("v"), lit(-3L).as("w"))
    val wMor = timed(IcebergLite.mergeOnRead(spark, t, morUp, Seq("k"), Seq("k"), "mor"))
    val rows = IcebergLite.read(spark, t).count()
    val (bBase, bNarrow, bWide) = (dirBytes("base"), dirBytes("narrow"), dirBytes("wide"))
    val bMor = dirBytes("mor")
    graft.Fs.deleteRecursively(root)
    // write amplification = bytes this commit wrote / bytes of the whole
    // table: narrow should be ~1/nFiles, wide ~1 (every file touched)
    println(f"""{"probe":"merge_scale","files":$files0,"rows":$n,""" +
      f""""narrow_merge_s":$wNarrow%.3f,"carried_files_narrow":$carriedNarrow,""" +
      f""""wide_merge_s":$wWide%.3f,"wide_over_narrow":${wWide / wNarrow}%.2f,""" +
      f""""write_amp_narrow":${bNarrow.toDouble / bBase}%.4f,""" +
      f""""write_amp_wide":${bWide.toDouble / bBase}%.4f,""" +
      f""""mor_merge_s":$wMor%.3f,"write_amp_mor":${bMor.toDouble / bBase}%.6f,""" +
      f""""rows_after":$rows}""")
    spark.stop()
  }
}
