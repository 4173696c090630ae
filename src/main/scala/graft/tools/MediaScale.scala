package graft.tools

import org.apache.spark.sql.functions._

/**
 * Media-plane scale probe: distributed tiled-GeoTIFF encode → per-band
 * file sink → binaryFile decode at the FULL reference COG profile
 * (512×512 DEFLATE tiles, predictor 2, zlevel 9, 5 average overviews) on
 * 1024×1024 uint16 bands. Measures raw-pixel MB/s both directions and
 * verifies a per-file structural COG validation plus an encode↔decode
 * pixel checksum round trip. `sbt "runMain graft.tools.MediaScale [nDocs]"`.
 */
object MediaScale {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 128
    val (w, h) = (1024, 1024)
    val rawMb = nDocs.toLong * w * h * 2 / (1024.0 * 1024.0)
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    def t[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      val wl = (System.nanoTime() - t0) / 1e9
      println(f"[mediascale] $label wall=$wl%.2f s"); (a, wl)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_mediascale")
    val out = root.resolve("bands").toString

    val encodeUdf = udf((ref: String) =>
      graft.media.GeoTiff.encode(w, h, graft.media.Media.bandPixels(ref, w, h)))
    val pixelSumUdf = udf((ref: String) => {
      var s = 0L; graft.media.Media.bandPixels(ref, w, h).foreach(s += _); s
    })
    val docs = spark.range(nDocs)
      .select($"id".cast("string").as("doc_id"), lit("B04").as("band"),
        concat($"id", lit("_B04")).as("ref"))
      .repartition(32)
    val expectedSum = docs.select(sum(pixelSumUdf($"ref"))).as[Long].head()

    val (manifest, encWall) = t(s"encode+sink $nDocs 1024x1024 COGs (profile 512/z9/5ovr)") {
      val m = graft.media.Media.writeBandFiles(
        docs.withColumn("payload", encodeUdf($"ref")).drop("ref"), out)
      m.count(); m
    }
    val bytesOnDisk = manifest.agg(sum($"n_bytes")).as[Long].head()

    val (gotSum, decWall) = t(s"binaryFile decode of all $nDocs COGs") {
      val decodeSum = udf((b: Array[Byte]) => {
        val d = graft.media.GeoTiff.decode(b)
        require(graft.media.GeoTiff.validateCog(b).isEmpty, "invalid COG emitted")
        var s = 0L; d.main.pixels.foreach(s += _); s
      })
      spark.read.format("binaryFile").load(s"$out/*")
        .select(decodeSum($"content").as("s")).agg(sum($"s")).as[Long].head()
    }
    require(gotSum == expectedSum, s"pixel checksum mismatch: $gotSum != $expectedSum")
    println(f"[mediascale] n=$nDocs raw=${rawMb}%.0f MB disk=${bytesOnDisk / 1048576.0}%.0f MB " +
      f"encode=${rawMb / encWall}%.1f MB/s decode=${rawMb / decWall}%.1f MB/s " +
      f"(raw-pixel rate, ${32} threads)")
    graft.Fs.deleteRecursively(root)
    spark.stop()
  }
}
