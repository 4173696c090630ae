package graft.tools

/** Driver-side micro-profile of the media_multiband UDF body: per-phase
  * cost (pixel synth / encode / decode / compare / validate) for n docs on
  * one thread — isolates codec cost from Spark plumbing.
  * `sbt "runMain graft.tools.ProbeMultiband [nDocs]"`. */
object ProbeMultiband {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val bands = graft.model.Bands.byPlatform("SENTINEL_2")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    var (wSynth, wEnc, wDec, wCmp, wVal) = (0.0, 0.0, 0.0, 0.0, 0.0)
    var bytesTotal = 0L
    (0 until n).foreach { i =>
      val docRef = s"${i * 30}_multi"
      val (wh, s1) = t(graft.media.Media.bandDims(docRef)); wSynth += s1
      val (w, h) = wh
      val (planes, s2) = t(bands.map(b =>
        graft.media.Media.bandPixels(s"${i * 30}_$b.tif", w, h))); wSynth += s2
      val (bytes, s3) = t(graft.media.GeoTiff.encodeBands(w, h, planes,
        nodata = 0, tileSize = 16, overviewLevels = 2, zlevel = 3)); wEnc += s3
      bytesTotal += bytes.length
      val (d, s4) = t(graft.media.GeoTiff.decodeBands(bytes)); wDec += s4
      val (ok, s5) = t(d.bands.zip(planes).forall { case (img, p) =>
        img.pixels.sameElements(p) }); wCmp += s5
      require(ok)
      val (v, s6) = t(graft.media.GeoTiff.validateCog(bytes)); wVal += s6
      require(v.isEmpty)
    }
    println(f"""{"probe":"multiband","docs":$n,"synth_s":$wSynth%.3f,"encode_s":$wEnc%.3f,""" +
      f""""decode_s":$wDec%.3f,"compare_s":$wCmp%.3f,"validate_s":$wVal%.3f,""" +
      f""""bytes_per_doc":${bytesTotal / n}}""")
  }
}
