package graft.media

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.model.SynthCorpus

class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("payload header roundtrip + deterministic body") {
    val p1 = Media.fakePayload("S2A_x_blue.tif", 20, 10, 3)
    val p2 = Media.fakePayload("S2A_x_blue.tif", 20, 10, 3)
    assert(p1.sameElements(p2))
    val m = Media.decodeMeta(p1)
    assert(m == Media.MediaMeta(20, 10, 3, 5 + 20 * 10 * 3))
  }

  test("band-file sink: per-(doc, band) files + manifest, byte-identical on read-back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_sink").toString
    val rows = Seq(("S2A_1", "blue"), ("S2A_1", "nir"), ("LC08_2", "swir1")).map {
      case (doc, band) => (doc, band, Media.fakePayload(s"${doc}_$band", 8, 6, 3))
    }
    val manifest = Media.writeBandFiles(rows.toDF("doc_id", "band", "payload"), dir)
      .as[(String, String, String, Long)].collect()
    assert(manifest.length == 3)
    manifest.foreach { case (doc, band, path, n) =>
      assert(path.endsWith(s"$doc/$band.tif"), s"layout: $path") // the COG sink layout
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      assert(n == bytes.length)
      assert(bytes.sameElements(Media.fakePayload(s"${doc}_$band", 8, 6, 3)))
    }
    // read-back through the binaryFile source closes the loop
    val back = Media.decodeBinaryFiles(spark, s"$dir/*")
    assert(back.count() == 3)
    assert(back.select($"meta.width").as[Int].collect().forall(_ == 8))
  }

  test("multiband sink: one file per doc, all bands; binaryFile read-back decodes bit-exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_mb").toString
    val rnd = new scala.util.Random(19)
    val (w, h) = (40, 30)
    val docs = Seq("S2A_1", "LC08_2").map { doc =>
      (doc, Seq.fill(4)(Seq.fill(w * h)(rnd.nextInt(0x10000))), w, h)
    }
    val manifest = Media.writeMultibandFiles(
      docs.toDF("doc_id", "bands", "width", "height"), dir,
      tileSize = 16, overviewLevels = 2, zlevel = 3)
      .as[(String, Int, String, Long)].collect().sortBy(_._1)
    assert(manifest.length == 2 && manifest.forall(_._2 == 4))
    manifest.foreach { case (doc, _, path, n) =>
      assert(path.endsWith(s"$doc.tif"), s"layout: $path")
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(path)) == n)
    }
    // read back through binaryFile + the multi-band decoder: every plane
    // bit-exact, COG layout clean
    val back = spark.read.format("binaryFile").load(s"$dir/*.tif")
      .select($"path", $"content").as[(String, Array[Byte])].collect()
    assert(back.length == 2)
    back.foreach { case (path, bytes) =>
      val doc = path.split('/').last.stripSuffix(".tif")
      val want = docs.find(_._1 == doc).get._2
      val d = GeoTiff.decodeBands(bytes)
      assert(d.bands.length == 4)
      d.bands.zip(want).foreach { case (img, plane) =>
        assert(img.width == w && img.height == h)
        assert(img.pixels.toSeq == plane)
      }
      assert(GeoTiff.validateCog(bytes).isEmpty)
    }
  }

  test("binaryFile source: payload files on disk flow through the decode pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_bin")
    val refs = Seq("a_blue.tif", "b_nir.tif", "c_swir1.tif")
    refs.foreach { r =>
      val w = 16 + math.abs(r.hashCode % 17); val h = 16 + math.abs(r.hashCode % 13)
      java.nio.file.Files.write(dir.resolve(r), Media.fakePayload(r, w, h, 3))
    }
    val got = Media.decodeBinaryFiles(spark, dir.toString)
      .select(element_at(split($"path", "/"), -1).as("ref"),
        $"meta.width", $"meta.height", $"meta.channels", $"features")
      .as[(String, Int, Int, Int, Seq[Float])].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == refs.toSet)
    refs.foreach { r =>
      val w = 16 + math.abs(r.hashCode % 17); val h = 16 + math.abs(r.hashCode % 13)
      val (_, gw, gh, gc, feats) = got(r)
      assert((gw, gh, gc) == (w, h, 3), s"header mismatch for $r")
      assert(feats == Media.extractFeatures(Media.fakePayload(r, w, h, 3)).toSeq,
        s"features differ for $r")
    }
  }

  test("real GeoTIFF band sink → binaryFile read-back: decode + COG validation clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tiff_sink").toString
    val rows = Seq(("S2A_9", "blue"), ("S2A_9", "nir"), ("LC08_3", "swir1")).map {
      case (doc, band) =>
        val ref = s"${doc}_$band"
        val (w, h) = Media.bandDims(ref)
        (doc, band, GeoTiff.encode(w, h, Media.bandPixels(ref, w, h),
          nodata = 0, tileSize = 16, overviewLevels = 2))
    }
    val manifest = Media.writeBandFiles(rows.toDF("doc_id", "band", "payload"), dir)
      .as[(String, String, String, Long)].collect()
    assert(manifest.length == 3)
    // every emitted file is a structurally valid COG and round-trips
    manifest.foreach { case (doc, band, path, _) =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      assert(GeoTiff.validateCog(bytes).isEmpty, s"$doc/$band not COG-valid")
      val ref = s"${doc}_$band"
      val (w, h) = Media.bandDims(ref)
      assert(GeoTiff.decode(bytes).main.pixels.sameElements(Media.bandPixels(ref, w, h)))
    }
    // distributed read-back through the binaryFile source
    val back = Media.decodeGeoTiffFiles(spark, s"$dir/*")
      .select($"meta.width", $"meta.channels", size($"features"))
      .as[(Int, Int, Int)].collect()
    assert(back.length == 3 && back.forall { case (w, ch, nf) => w >= 16 && ch == 1 && nf == 1 })
  }

  test("frame sampling returns n row-slices of width*channels bytes") {
    val p = Media.fakePayload("ref", 32, 16, 3)
    val frames = Media.frameSample(p, 4)
    assert(frames.length == 4)
    assert(frames.forall(_.length == 32 * 3))
    // deterministic: same slices again
    assert(Media.frameSample(p, 4).zip(frames).forall { case (a, b) => a.sameElements(b) })
  }

  test("resize: header rewritten, nearest-neighbor pixels preserved") {
    val p = Media.fakePayload("ref2", 32, 16, 3)
    val r = Media.resize(p, 16, 8)
    val m = Media.decodeMeta(r)
    assert(m.width == 16 && m.height == 8 && m.channels == 3)
    assert(r.length == 5 + 16 * 8 * 3)
    // 2× downsample: out(x,y) == in(2x,2y) for all channels
    for (y <- 0 until 8; x <- 0 until 16; c <- 0 until 3)
      assert(r(5 + (y * 16 + x) * 3 + c) == p(5 + (2 * y * 32 + 2 * x) * 3 + c))
    // identity resize == original body
    assert(Media.resize(p, 32, 16).sameElements(p))
  }

  test("decodeBandSpans: schema, per-band rows, features normalized") {
    val docs = SynthCorpus.docs(spark, 50, seed = 42L)
    val out = Media.decodeBandSpans(docs.select($"doc_id", $"spans"))
    val rows = out.select($"doc_id", $"band", $"meta.width", $"meta.channels", $"features")
      .as[(String, String, Int, Int, Seq[Float])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, band, w, ch, feats) =>
      // single-band GeoTIFFs (one COG per band, like the reference)
      assert(w >= 16 && ch == 1 && feats.length == ch)
      assert(feats.forall(f => f >= 0f && f <= 1f))
      assert(band.nonEmpty)
    }
    // band-span count preserved: one output row per band span
    val nBandSpans = docs.select(explode($"spans").as("s")).where($"s.kind" === "band").count()
    assert(out.count() == nBandSpans)
  }
}
