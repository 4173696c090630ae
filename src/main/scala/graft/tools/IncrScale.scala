package graft.tools

import org.apache.spark.sql.functions._

/** Scale evidence for the incremental plane: a follower of a many-commit
  * table must pay O(delta), not O(table). Builds a table of `commits`
  * commits × `rowsPer` rows (staged once under /tmp), then times a full
  * snapshot count vs an incremental count of ONLY the last commit, and
  * reports the file counts each scan actually opened.
  * `sbt "runMain graft.tools.IncrScale [commits] [rowsPer]"`. */
object IncrScale {
  def main(args: Array[String]): Unit = {
    val commits = if (args.length > 0) args(0).toInt else 64
    val rowsPer = if (args.length > 1) args(1).toLong else 100000L
    val spark = graft.GraftSession.local(8)
    import graft.table.IcebergLite
    val table = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_incr_scale_${commits}_$rowsPer").resolve("t").toString
    if (IcebergLite.snapshots(table).size < commits) {
      (IcebergLite.snapshots(table).size until commits).foreach { i =>
        val lo = i * rowsPer
        IcebergLite.append(spark,
          spark.range(lo, lo + rowsPer).select(col("id").as("k"),
            (col("id") % 9973).cast("double").as("v")),
          table, Seq("k"), f"c$i%04d")
      }
    }
    val ids = IcebergLite.snapshots(table)
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once (parquet reader/codegen init)
    IcebergLite.read(spark, table).count()
    IcebergLite.readIncremental(spark, table, ids(ids.size - 2), ids.last).count()
    val (nFull, wFull) = timed(IcebergLite.read(spark, table).count())
    val incDf = IcebergLite.readIncremental(spark, table, ids(ids.size - 2), ids.last)
    val (nInc, wInc) = timed(incDf.count())
    val fullFiles = IcebergLite.read(spark, table).inputFiles.length
    val incFiles = incDf.inputFiles.length
    println(f"""{"probe":"incr_scale","commits":$commits,"rows_per_commit":$rowsPer,""" +
      f""""full_rows":$nFull,"full_wall_s":$wFull%.3f,"full_files":$fullFiles,""" +
      f""""incr_rows":$nInc,"incr_wall_s":$wInc%.3f,"incr_files":$incFiles,""" +
      f""""wall_ratio":${wFull / wInc}%.1f,"file_ratio":${fullFiles.toDouble / incFiles}%.1f}""")
    spark.stop()
  }
}
