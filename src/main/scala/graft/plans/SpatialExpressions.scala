package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the geometry predicates (SURVEY §2.8 geo).
 *
 * These are real `Expression`s with `doGenCode` (static-call codegen, no
 * lambda boxing), so filters/joins built on them stay inside whole-stage
 * codegen — the preference order the engine follows over opaque Scala UDFs.
 * Geometry transits as WKT strings (the reference's boundary representation,
 * `utils/query_utils.py:24-27`); parsed/prepared geometries are cached
 * per-thread in [[graft.geom.Geo]].
 */
object GeoCodegen {
  // static forwarders — referenced from generated Java
  def intersects(a: UTF8String, b: UTF8String): Boolean =
    graft.geom.Geo.intersects(a.toString, b.toString)
  def distance(a: UTF8String, b: UTF8String): Double =
    graft.geom.Geo.distance(a.toString, b.toString)
  def cellCover(wkt: UTF8String, res: Int): ArrayData =
    if (wkt.numBytes() == 0) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(graft.geom.Geo.cellCoverWkt(wkt.toString, res))
  // WKB (storage-encoding) variants; empty-geometry guards mirror the UDF
  // forms (dirty rows drop out of joins instead of failing the task)
  def cellCoverWkb(wkb: Array[Byte], res: Int): ArrayData =
    if (wkb.length == 0) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(graft.geom.Geo.cellCoverWkb(wkb, res))
  def intersectsWkb(dimWkt: UTF8String, probeWkb: Array[Byte]): Boolean =
    dimWkt.numBytes() > 0 && probeWkb.length > 0 &&
      graft.geom.Geo.intersectsWkb(dimWkt.toString, probeWkb)
}

/** `st_intersects(aWkt, bWkt)` — exact JTS intersects, prepared-geometry
  * cached on the left argument. The [[SpatialJoinStrategy]] pattern-matches
  * this node in join conditions. */
case class StIntersects(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoCodegen.intersects(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GeoCodegen.intersects($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersects =
    copy(left = l, right = r)
  override def prettyName: String = "st_intersects"
}

/** `st_distance(aWkt, bWkt)` — planar JTS distance in degrees. */
case class StDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoCodegen.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GeoCodegen.distance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StDistance =
    copy(left = l, right = r)
  override def prettyName: String = "st_distance"
}

/** `st_cell_cover(wkt, res)` — AM-safe hierarchical cell cover (the engine's
  * Generator input: `explode(st_cell_cover(...))`). */
case class StCellCover(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoCodegen.cellCover(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GeoCodegen.cellCover($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StCellCover =
    copy(left = l, right = r)
  override def prettyName: String = "st_cell_cover"
}

/** `st_cell_cover_wkb(wkb, res)` — the cover generator over the storage-side
  * WKB encoding: the flagship probe-side kernel as a native expression (no
  * udf wrapper / result-encoder layers on the 10^12-row path). A DISTINCT
  * node from [[StCellCover]]/[[StIntersects]], so [[SpatialJoinStrategy]]'s
  * pattern matching is unaffected. */
case class StCellCoverWkb(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoCodegen.cellCoverWkb(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GeoCodegen.cellCoverWkb($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StCellCoverWkb =
    copy(left = l, right = r)
  override def prettyName: String = "st_cell_cover_wkb"
}

/** `st_intersects_wkb(dimWkt, probeWkb)` — the exact refine over a WKB probe
  * (prepared-geometry LRU on the dim side, WKB parse memo on the probe). */
case class StIntersectsWkb(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoCodegen.intersectsWkb(a.asInstanceOf[UTF8String], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GeoCodegen.intersectsWkb($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersectsWkb =
    copy(left = l, right = r)
  override def prettyName: String = "st_intersects_wkb"
}

/** Column-API sugar over the native expressions. */
object SpatialColumns {
  def stIntersects(a: Column, b: Column): Column =
    GraftShims.column(StIntersects(GraftShims.expression(a), GraftShims.expression(b)))
  def stDistance(a: Column, b: Column): Column =
    GraftShims.column(StDistance(GraftShims.expression(a), GraftShims.expression(b)))
  def stCellCover(a: Column, res: Column): Column =
    GraftShims.column(StCellCover(GraftShims.expression(a), GraftShims.expression(res)))
  def stCellCoverWkb(a: Column, res: Column): Column =
    GraftShims.column(StCellCoverWkb(GraftShims.expression(a), GraftShims.expression(res)))
  def stIntersectsWkb(dimWkt: Column, probeWkb: Column): Column =
    GraftShims.column(StIntersectsWkb(GraftShims.expression(dimWkt), GraftShims.expression(probeWkb)))
}
