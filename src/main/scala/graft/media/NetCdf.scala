package graft.media

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/**
 * Minimal NetCDF *classic* (CDF-1) writer/reader — S13, the reference's
 * `export_xarray_to_netcdf` (`utils/dc_import_export.py:12-45`, an xarray
 * Dataset of (y, x)-dimensioned band variables written with `to_netcdf`).
 *
 * Implements the published classic file format directly (magic `CDF\x01`,
 * dim/attr/var header lists, big-endian data, 4-byte padding): fixed-size
 * NC_DOUBLE variables over shared dimensions, no attributes, no record
 * dimension. The reader parses exactly this subset and is used by
 * NetCdfSpec to prove a lossless round trip; the byte layout follows the
 * public spec, so external NetCDF tooling reads the files too.
 */
object NetCdf {

  private val NcDimension = 0x0A
  private val NcVariable = 0x0B
  private val NcDouble = 6

  final case class Var(name: String, dimIds: Seq[Int], values: Array[Double])

  private def pad4(n: Int): Int = (n + 3) & ~3

  private def writeName(out: ByteBuffer, name: String): Unit = {
    val b = name.getBytes("UTF-8")
    out.putInt(b.length)
    out.put(b)
    var i = b.length
    while (i % 4 != 0) { out.put(0.toByte); i += 1 }
  }

  /** Serialize dims + NC_DOUBLE vars as a classic CDF-1 byte stream. */
  def writeClassic(dims: Seq[(String, Int)], vars: Seq[Var]): Array[Byte] = {
    vars.foreach { v =>
      val expect = v.dimIds.map(id => dims(id)._2.max(1)).product
      require(v.values.length == expect,
        s"${v.name}: ${v.values.length} values for dims ${v.dimIds} (expected $expect)")
      // vsize/begin are Int fields in CDF-1; values.length*8 must not wrap
      // (it would emit a corrupt negative vsize before the data write fails)
      require(v.values.length <= (Int.MaxValue - 8) / 8,
        s"${v.name}: ${v.values.length} doubles exceeds the CDF-1 32-bit " +
          "variable size limit (use CDF-2/5 or split the variable)")
    }
    // header size: bounded exactly before allocation (name bytes + padding +
    // fixed per-entry ints) so oversized headers fail with a clear message
    // instead of an unexplained BufferOverflowException
    val headerBound = 8 + // magic + numrecs
      (8 + dims.map { case (n, _) => 4 + pad4(n.getBytes("UTF-8").length) + 4 }.sum) +
      8 + // empty gatt_list
      (8 + vars.map(v => 4 + pad4(v.name.getBytes("UTF-8").length) +
        4 + 4 * v.dimIds.length + 8 + 4 + 4 + 4).sum)
    val header = ByteBuffer.allocate(headerBound)
    header.put("CDF".getBytes("US-ASCII")).put(1.toByte) // magic + version (CDF-1)
    header.putInt(0)                                      // numrecs (no record dim)
    // dim_list
    header.putInt(NcDimension).putInt(dims.length)
    dims.foreach { case (n, len) => writeName(header, n); header.putInt(len) }
    // gatt_list: ABSENT
    header.putInt(0).putInt(0)
    // var_list (begin offsets filled after sizing)
    header.putInt(NcVariable).putInt(vars.length)
    val beginSlots = vars.map { v =>
      writeName(header, v.name)
      header.putInt(v.dimIds.length)
      v.dimIds.foreach(header.putInt)
      header.putInt(0).putInt(0)                          // vatt_list: ABSENT
      header.putInt(NcDouble)
      header.putInt(pad4(v.values.length * 8))            // vsize
      val slot = header.position()
      header.putInt(0)                                    // begin (offset), patched below
      slot
    }
    val headerLen = header.position()
    var offset = headerLen.toLong
    beginSlots.zip(vars).foreach { case (slot, v) =>
      // begin offsets are 32-bit in CDF-1: the TOTAL file size must fit too
      require(offset <= Int.MaxValue,
        s"${v.name}: data offset $offset exceeds the CDF-1 32-bit file limit")
      header.putInt(slot, offset.toInt)
      offset += pad4(v.values.length * 8)
    }
    val out = new ByteArrayOutputStream()
    out.write(header.array(), 0, headerLen)
    vars.foreach { v =>
      val data = ByteBuffer.allocate(pad4(v.values.length * 8))
      v.values.foreach(data.putDouble)
      out.write(data.array())
    }
    out.toByteArray
  }

  /** Parse the writer's subset back: (dims, vars). Validates magic, tags,
    * types, and that each variable's data fits its declared extent. */
  def readClassic(bytes: Array[Byte]): (Seq[(String, Int)], Seq[Var]) = {
    val bb = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](3); bb.get(magic)
    require(new String(magic, "US-ASCII") == "CDF" && bb.get() == 1, "not a CDF-1 file")
    require(bb.getInt == 0, "record dimensions unsupported")
    def readName(): String = {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      var i = len
      while (i % 4 != 0) { bb.get(); i += 1 }
      new String(b, "UTF-8")
    }
    require(bb.getInt == NcDimension, "expected dim_list")
    val dims = Seq.fill(bb.getInt)((readName(), bb.getInt))
    require(bb.getInt == 0 && bb.getInt == 0, "global attributes unsupported")
    require(bb.getInt == NcVariable, "expected var_list")
    val headers = Seq.fill(bb.getInt) {
      val name = readName()
      val dimIds = Seq.fill(bb.getInt)(bb.getInt)
      require(bb.getInt == 0 && bb.getInt == 0, "variable attributes unsupported")
      require(bb.getInt == NcDouble, "only NC_DOUBLE supported")
      val vsize = bb.getInt
      val begin = bb.getInt
      (name, dimIds, vsize, begin)
    }
    val vars = headers.map { case (name, dimIds, _, begin) =>
      val n = dimIds.map(d => dims(d)._2.max(1)).product
      val data = ByteBuffer.wrap(bytes, begin, n * 8)
      Var(name, dimIds, Array.fill(n)(data.getDouble))
    }
    (dims, vars)
  }
}
