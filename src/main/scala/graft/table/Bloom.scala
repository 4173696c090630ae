package graft.table

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/**
 * Per-file Bloom filters for point-lookup pruning — IcebergLite's analogue
 * of Iceberg's puffin blob sidecars / Parquet column bloom filters, one
 * metadata layer below min/max.
 *
 * Why: manifest min/max prunes RANGES, which is useless for
 * `key = X` / `key IN (…)` on a column the layout is NOT clustered by —
 * every hash-distributed file spans the whole key domain, so a point
 * lookup on a 100 TB table opens every file. A per-file Bloom filter
 * answers "can this file contain X?" probabilistically with no false
 * negatives: a miss PROVES absence (safe to skip), a hit opens the file
 * and lets the real predicate decide. Filters live as small sidecar
 * binaries under `table/blooms/<commitId>/` — never inlined into the
 * snapshot JSON, which every later commit re-carries — and manifests store
 * only their paths ([[IcebergLite.FileEntry.bloom]]).
 *
 * Hashing: rows are hashed once with Spark's codegen'd `xxhash64(col)`
 * (seed 42); the driver-side membership probe evaluates the identical
 * Catalyst expression on the literal, so write and read agree bit-for-bit
 * including Spark's type-specific hashing. K index positions derive from
 * the one 64-bit hash by double hashing (Kirsch–Mitzenmacher).
 */
object Bloom {

  /** Optimal k for ~10 bits/key sizing (≈1% false-positive rate). */
  val K = 7

  /** Filter size in BITS for `maxRows` keys: 10 bits/key, power of two,
    * clamped to [2^10, 2^23] (128 B … 1 MiB sidecar). */
  def sizeBits(maxRows: Long): Int = {
    val want = math.max(1L << 10, math.min(1L << 23, maxRows * 10))
    java.lang.Long.highestOneBit(want - 1) match {
      case h if h < want => (h << 1).toInt
      case h => h.toInt
    }
  }

  /** The K bit positions of a 64-bit hash in an m-bit filter (m a power of
    * two). h2 is forced odd so the probe sequence cycles the full space. */
  private def positions(hash: Long, mBits: Int): Array[Int] = {
    val h1 = hash
    val h2 = (hash >>> 33) | 1L
    Array.tabulate(K)(i => (((h1 + i * h2) & Long.MaxValue) % mBits).toInt)
  }

  private def set(bits: Array[Long], pos: Int): Unit =
    bits(pos >>> 6) |= 1L << (pos & 63)

  private def get(bits: Array[Long], pos: Int): Boolean =
    (bits(pos >>> 6) & (1L << (pos & 63))) != 0

  /** Driver-side probe: can a filter built at `mBits` contain `hash`? */
  def mightContain(filter: Array[Byte], hash: Long): Boolean = {
    val bits = toLongs(filter)
    val mBits = filter.length * 8
    positions(hash, mBits).forall(get(bits, _))
  }

  /** Spark's `xxhash64(Literal(v, dt))` evaluated on the driver — the exact
    * hash the write-side Column computed for a row with this value. */
  def hashLiteral(v: Any, dt: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    new XxHash64(Seq(Literal.create(v, dt))).eval(null).asInstanceOf[Long]
  }

  private def toLongs(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](b.length / 8)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  private def toBytes(l: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(l.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    l.foreach(bb.putLong)
    bb.array()
  }

  /** Builds one filter per group from pre-hashed values (`xxhash64(col)`).
    * Buffer is the flat bit array; merge is bitwise OR — associative and
    * commutative, so partial aggregation is safe. Null hashes (null rows
    * hash to the seed, never null — but belt-and-braces) are skipped. */
  class Agg(mBits: Int) extends Aggregator[java.lang.Long, Array[Long], Array[Byte]] {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64, s"mBits must be a power of two >= 64, got $mBits")
    def zero: Array[Long] = new Array[Long](mBits / 64)
    def reduce(b: Array[Long], h: java.lang.Long): Array[Long] = {
      if (h != null) positions(h, mBits).foreach(set(b, _))
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Byte] = toBytes(b)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
