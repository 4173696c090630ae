package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve as pure Column algebra — the multi-dimensional
 * clustering key behind [[IcebergLite.compact]]'s `zorderBy` (Iceberg's
 * `rewrite_data_files` z-order strategy, Delta's `OPTIMIZE ZORDER BY`).
 *
 * Why it matters at 100 TB: manifest min/max pruning is only as good as the
 * correlation between file boundaries and the filtered columns. A linear
 * sort gives ONE column tight per-file ranges and leaves every other column
 * spanning the full domain; interleaving the quantized bits of 2–3 columns
 * gives EVERY participating column ranges ~√ (resp. ∛) of the domain per
 * file, so a conjunctive range predicate — the AOI read's
 * `xmin BETWEEN … AND ymin BETWEEN …` — prunes multiplicatively instead of
 * on one dimension. No partition dirs, no extra metadata: the existing
 * min/max stats simply become tight.
 *
 * Each dimension is normalized to `[0, 2^21)` against its global
 * `[lo, hi]` (computed once per compaction) and the bits are spread with
 * the classic mask-shift sequences — ~12 codegen-friendly integer ops per
 * dimension, no UDF. Quantization only affects LAYOUT quality, never
 * correctness: readers filter on the real column values.
 */
object ZOrder {

  /** Quantization bits per dimension: 3 × 21 = 63 fits a positive Long. */
  val Bits = 21
  private val MaxQ = (1L << Bits) - 1

  /** `v` normalized against `[lo, hi]` and quantized to `[0, 2^21)`. Values
    * outside the bounds clamp (compaction computes exact bounds, so this
    * only guards later appends reusing a stale z-expression). A degenerate
    * `lo == hi` dimension contributes the constant 0. */
  private def quantize(v: Column, lo: Double, hi: Double): Column =
    if (!(hi > lo)) lit(0L)
    else least(lit(MaxQ), greatest(lit(0L),
      floor((v.cast("double") - lo) / (hi - lo) * MaxQ).cast("long")))

  /** Spread a (< 2^32) value's bits to even positions (stride 2). */
  private def spread2(c: Column): Column = {
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    steps.foldLeft(c) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }
  }

  /** Spread a (< 2^21) value's bits to every third position (stride 3). */
  private def spread3(c: Column): Column = {
    val steps = Seq(
      32 -> 0x001F00000000FFFFL, 16 -> 0x001F0000FF0000FFL,
      8 -> 0x100F00F00F00F00FL, 4 -> 0x10C30C30C30C30C3L,
      2 -> 0x1249249249249249L)
    steps.foldLeft(c) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }
  }

  /** The interleaved z-value of 2 or 3 numeric columns, each with its global
    * `[lo, hi]` bounds. Bit i of dimension d lands at position `i*n + d`
    * (dimension 0 owns the LOW bit — ties break on the first column). */
  def zvalue(dims: Seq[(Column, (Double, Double))]): Column = {
    require(dims.size >= 2 && dims.size <= 3,
      s"z-order takes 2 or 3 dimensions, got ${dims.size}")
    val spread: Column => Column = if (dims.size == 2) spread2 else spread3
    dims.zipWithIndex.map { case ((c, (lo, hi)), d) =>
      shiftleft(spread(quantize(c, lo, hi)), d)
    }.reduce(_ bitwiseOR _)
  }

  /** Driver-side reference interleave (specs): bit i of dims(d) → i*n+d. */
  private[table] def zvalueRef(qs: Seq[Long]): Long = {
    val n = qs.size
    qs.zipWithIndex.map { case (q, d) =>
      (0 until Bits).map(i => ((q >> i) & 1L) << (i * n + d)).sum
    }.sum
  }
}
