package graft.ann

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Similarity kernels as native codegen'd expressions. The Column-algebra
 * forms (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) materialize a
 * 64-element intermediate array PER CANDIDATE PAIR before folding — at 5M
 * pairs per brute-force query that allocation dominates the arithmetic.
 * These walk both float arrays directly.
 *
 * Arithmetic order is fold-for-fold the Column forms' (and their DuckDB
 * `cosineSql` twin's): dot accumulates a·b ascending, each norm accumulates
 * its squares ascending, result = dot / (√na · √nb) — bit-identical
 * (AnnSpec parity test). Inputs must be `array<float>` on BOTH sides:
 * an implicit cast would silently change the values being folded.
 */
object SimKernels {
  // Unequal lengths FAIL LOUDLY: UnsafeArrayData.getFloat past numElements
  // reads adjacent row memory silently (the replaced zip_with/Seq forms
  // null-padded or threw) — a malformed embedding must never fabricate a
  // plausible similarity.
  private def sameLength(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"embedding length mismatch: ${a.numElements()} vs ${b.numElements()}")
    n
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = sameLength(a, b)
    // one fused pass; the three accumulators are independent, so each keeps
    // the exact fold order of the Column-algebra form (bit-parity contract)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def quantizedDot(a: ArrayData, b: ArrayData): Double = {
    val n = sameLength(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += math.floor(a.getFloat(i).toDouble * 1024) * math.floor(b.getFloat(i).toDouble * 1024)
      i += 1
    }
    s
  }

  def i8Dot(a: ArrayData, b: ArrayData): Int = {
    val n = sameLength(a, b)
    // pure integer adds: order-free and exact (127²·dim stays far under
    // Int.MaxValue for any real embedding width), so bit-parity with the
    // zip_with/aggregate Column form is unconditional
    var s = 0
    var i = 0
    while (i < n) {
      s += a.getByte(i) * b.getByte(i)
      i += 1
    }
    s
  }
}

sealed abstract class SimBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
}

/** `cosine_sim(a, b)` — exact cosine similarity of two float embeddings. */
case class CosineSim(left: Expression, right: Expression) extends SimBinary {
  override def nullSafeEval(a: Any, b: Any): Any =
    SimKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ann.SimKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** `quantized_dot(a, b)` — Σ ⌊1024·aᵢ⌋·⌊1024·bᵢ⌋ in double. */
case class QuantizedDot(left: Expression, right: Expression) extends SimBinary {
  override def nullSafeEval(a: Any, b: Any): Any =
    SimKernels.quantizedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ann.SimKernels.quantizedDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
  override def prettyName: String = "quantized_dot"
}

/** `i8_dot(a, b)` — exact Σ aᵢ·bᵢ over stored-int8 (`array<tinyint>`)
  * embeddings, the per-pair kernel of [[Ann.i8TopK]]. Same motivation as
  * the float kernels above: the zip_with/aggregate Column form builds a
  * dim-sized intermediate array per candidate pair. */
case class I8Dot(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{ByteType, IntegerType}
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<tinyint> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    SimKernels.i8Dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ann.SimKernels.i8Dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): I8Dot =
    copy(left = l, right = r)
  override def prettyName: String = "i8_dot"
}
