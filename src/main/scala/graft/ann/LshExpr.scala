package graft.ann

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/**
 * Random-hyperplane bucket keys as a native codegen'd expression.
 *
 * The UDF form receives the embedding as a boxed `Seq[Float]` (WrappedArray
 * allocation + per-element boxing on every row); this expression reads the
 * columnar `ArrayData` floats directly behind one reference-object call —
 * the LSH family's only per-row kernel (tables × bits × dim multiplies), so
 * the boxing overhead is the dominant non-arithmetic cost at corpus scale.
 *
 * Arithmetic is loop-for-loop the UDF's (and [[Ann.lshKeySqls]]'s DuckDB
 * twin's): `s += plane(i) * emb(i)` ascending, float widened to double,
 * sign rule `>= 0`, bit weight `1L << b` — results are bit-identical, so
 * the oracle SQL is unchanged.
 */
final class LshPlanes(val planes: Array[Array[Array[Double]]]) extends Serializable {
  def keys(e: ArrayData): GenericArrayData = {
    // fail loudly on short embeddings: getFloat past numElements on
    // UnsafeArrayData silently reads adjacent memory
    require(planes.length == 0 || planes(0).length == 0 ||
      e.numElements() >= planes(0)(0).length,
      s"embedding length ${e.numElements()} < plane dim ${planes(0)(0).length}")
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val pt = planes(t)
      var key = 0L
      var b = 0
      while (b < pt.length) {
        val pl = pt(b)
        var s = 0.0
        var i = 0
        while (i < pl.length) { s += pl(i) * e.getFloat(i); i += 1 }
        if (s >= 0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `lsh_bucket_keys(embedding)` → array of per-table bucket keys. */
case class LshBucketKeys(planesRef: LshPlanes, child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // same strict input guard as SimBinary: ArrayData.getFloat on a non-float
  // array silently misreads memory (garbage keys, no error)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got $t")
  }
  override protected def nullSafeEval(e: Any): Any =
    planesRef.keys(e.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planesRef, classOf[LshPlanes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.keys($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketKeys =
    copy(child = newChild)
  override def prettyName: String = "lsh_bucket_keys"
}
