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
    new GenericArrayData(graft.geom.Geo.cellCoverWkt(wkt.toString, res))
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

/** Column-API sugar over the native expressions. */
object SpatialColumns {
  def stIntersects(a: Column, b: Column): Column =
    GraftShims.column(StIntersects(GraftShims.expression(a), GraftShims.expression(b)))
  def stDistance(a: Column, b: Column): Column =
    GraftShims.column(StDistance(GraftShims.expression(a), GraftShims.expression(b)))
  def stCellCover(a: Column, res: Column): Column =
    GraftShims.column(StCellCover(GraftShims.expression(a), GraftShims.expression(res)))
}
