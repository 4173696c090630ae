package graft.media

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/**
 * Minimal REAL PNG codec (S14 — the reference's browse-image export,
 * `utils/dc_utilities.py:299-338` `write_png_from_xr` via
 * `gdal_translate -of PNG`). Pure JVM: zlib from `java.util.zip`, CRC-32
 * chunk checksums per the PNG spec — output files open in any viewer.
 *
 * Subset: 8-bit greyscale (colour type 0) and RGB (colour type 2),
 * non-interlaced, filter type 0 on every scanline. The decoder handles
 * exactly what the encoder emits and VERIFIES signature + chunk CRCs +
 * IDAT inflation — corrupted files fail loudly (PngSpec).
 */
object Png {

  private val Signature =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Encode row-major 8-bit pixels (`channels` = 1 grey / 3 RGB,
    * interleaved) into a complete PNG byte stream. */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels must be 1 or 3, got $channels")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte)                                    // bit depth
      .put((if (channels == 1) 0 else 2).toByte)        // colour type
      .put(0.toByte).put(0.toByte).put(0.toByte)        // compression/filter/interlace

    val stride = width * channels
    val raw = new Array[Byte](height * (stride + 1))    // +1 filter byte per row
    var r = 0
    while (r < height) {
      raw(r * (stride + 1)) = 0
      System.arraycopy(pixels, r * stride, raw, r * (stride + 1) + 1, stride)
      r += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw)
    defl.finish()
    val zOut = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()

    val out = new ByteArrayOutputStream()
    out.write(Signature)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", zOut.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, kind: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val kb = kind.getBytes("US-ASCII")
    out.write(kb)
    out.write(data)
    val crc = new CRC32()
    crc.update(kb)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Decode (the encoder's subset of) a PNG, VERIFYING signature and every
    * chunk CRC. Returns (width, height, channels, row-major pixels). */
  def decode(png: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(png.length > 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(png, 8), Signature), "bad PNG signature")
    val bb = ByteBuffer.wrap(png, 8, png.length - 8)
    var width = 0; var height = 0; var channels = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done) {
      val len = bb.getInt
      val kb = new Array[Byte](4); bb.get(kb)
      val data = new Array[Byte](len); bb.get(data)
      val crcStored = bb.getInt
      val crc = new CRC32(); crc.update(kb); crc.update(data)
      require(crc.getValue.toInt == crcStored,
        s"CRC mismatch in ${new String(kb, "US-ASCII")} chunk")
      new String(kb, "US-ASCII") match {
        case "IHDR" =>
          val h = ByteBuffer.wrap(data)
          width = h.getInt; height = h.getInt
          val depth = h.get(); val colour = h.get()
          require(depth == 8, s"unsupported bit depth $depth")
          channels = colour match {
            case 0 => 1
            case 2 => 3
            case c => throw new IllegalArgumentException(s"unsupported colour type $c")
          }
          require(h.get() == 0 && h.get() == 0 && h.get() == 0, "unsupported compression/filter/interlace")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => // ancillary chunk: ignored
      }
    }
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    val stride = width * channels
    val raw = new Array[Byte](height * (stride + 1))
    var off = 0
    var stalled = false
    while (!infl.finished() && off < raw.length && !stalled) {
      val k = infl.inflate(raw, off, raw.length - off)
      off += k
      // a truncated zlib stream (valid chunk CRCs, missing final block)
      // makes inflate() return 0 forever — fail via the length check below
      // instead of spinning the task
      stalled = k == 0 && infl.needsInput()
    }
    infl.end()
    require(off == raw.length, s"IDAT inflated to $off bytes, expected ${raw.length}")
    val pixels = new Array[Byte](height * stride)
    var r = 0
    while (r < height) {
      require(raw(r * (stride + 1)) == 0, s"unsupported filter type ${raw(r * (stride + 1))} on row $r")
      System.arraycopy(raw, r * (stride + 1) + 1, pixels, r * stride, stride)
      r += 1
    }
    (width, height, channels, pixels)
  }
}
