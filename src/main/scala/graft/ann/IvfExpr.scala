package graft.ann

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/**
 * IVF coarse-quantizer cell assignment as a native codegen'd expression —
 * the full-corpus kernel of index build and inline probe (nlist × dim
 * squared-L2 per row), reading columnar floats directly instead of the
 * UDF's boxed `Seq[Float]`. Arithmetic is loop-for-loop
 * [[IvfIndex.assignUdf]]'s (and the ivfOracleSql twin's): `t = e(i) − c(i)`
 * float-widened, `d += t·t` ascending, strict `<` keeps the lower cell on
 * ties — bit-identical assignments (AnnSpec cross-checks).
 */
final class IvfCenters(val centers: Array[Array[Double]]) extends Serializable {
  def assign(e: ArrayData): Int = {
    // fail loudly on short embeddings: getFloat past numElements on
    // UnsafeArrayData silently reads adjacent memory
    require(centers.length == 0 || e.numElements() >= centers(0).length,
      s"embedding length ${e.numElements()} < center dim ${centers(0).length}")
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var d = 0.0
      var i = 0
      while (i < ctr.length) { val t = e.getFloat(i) - ctr(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** `ivf_cell(embedding)` → nearest-center cell id. */
case class IvfCellAssign(centersRef: IvfCenters, child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  // same strict input guard as SimBinary: ArrayData.getFloat on a non-float
  // array silently misreads memory (garbage cell ids, no error)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got $t")
  }
  override protected def nullSafeEval(e: Any): Any =
    centersRef.assign(e.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCenters", centersRef, classOf[IvfCenters].getName)
    defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfCellAssign =
    copy(child = newChild)
  override def prettyName: String = "ivf_cell"
}
