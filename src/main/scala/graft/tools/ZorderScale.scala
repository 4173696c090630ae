package graft.tools

import org.apache.spark.sql.functions._
import graft.table.IcebergLite

/** Files-opened probe for z-order vs linear clustering:
  * `sbt "runMain graft.tools.ZorderScale [sfDir] [targetFiles]"`.
  * Stages the scene corpus twice — once `compact(zorderBy = xmin, ymin)`,
  * once `compact(sortBy = xmin, ymin)` — at the same file count, then runs
  * the tbl_zorder AOI read against both and reports files opened + wall.
  * The numbers quoted in BASELINE.md come from this. */
object ZorderScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val targetFiles = if (args.length > 1) args(1).toInt else 48
    val spark = graft.GraftSession.local(32)
    val scenes = graft.model.SynthCorpus.scenesFromOrders(spark, sfDir)
      .select(col("doc_id"), col("xmin"), col("ymin"), col("xmax"), col("ymax"))
    val (axmin, aymin, axmax, aymax) = graft.GeoQueries.TblZorderAoi
    val pred = col("xmin") <= axmax && col("xmax") >= axmin &&
      col("ymin") <= aymax && col("ymax") >= aymin
    val stats = Seq("xmin", "ymin", "xmax", "ymax")

    def stage(mode: String): String = {
      val t = java.nio.file.Files.createTempDirectory(s"zorder_scale_$mode")
        .resolve("t").toString
      IcebergLite.append(spark, scenes, t, stats, "c1")
      val bytes = IcebergLite.readSnapshot(t).get.files.map { f =>
        java.nio.file.Files.size(java.nio.file.Paths.get(f.path.stripPrefix("file:")))
      }.sum
      val tfb = bytes / targetFiles + 1
      if (mode == "zorder")
        IcebergLite.compact(spark, t, stats, "z1", targetFileBytes = tfb,
          zorderBy = Seq("xmin", "ymin"))
      else
        IcebergLite.compact(spark, t, stats, "l1", targetFileBytes = tfb,
          sortBy = Seq("xmin", "ymin"))
      t
    }
    val xBand = col("xmin") <= axmax && col("xmax") >= axmin  // 1st sort col helps
    val yBand = col("ymin") <= aymax && col("ymax") >= aymin  // 2nd col: linear is blind
    def probe(t: String, label: String, what: String,
              p: org.apache.spark.sql.Column): Unit = {
      val total = IcebergLite.readSnapshot(t).get.files.size
      val df = IcebergLite.readWhere(spark, t, p)
      val t0 = System.nanoTime()
      val rows = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[zorder-scale] $label%-7s $what%-6s files ${df.inputFiles.length}%3d / $total%3d opened, " +
        f"rows $rows, read $wall%.3f s")
    }
    val tz = stage("zorder"); val tl = stage("linear")
    Seq(("aoi", pred), ("x-band", xBand), ("y-band", yBand)).foreach { case (w, p) =>
      probe(tl, "linear", w, p); probe(tz, "zorder", w, p)
    }
    spark.stop()
  }
}
