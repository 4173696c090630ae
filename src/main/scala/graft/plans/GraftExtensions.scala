package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions wiring the spatial plane into Catalyst:
 *
 *   - SQL functions `st_intersects`, `st_distance`, `st_cell_cover`
 *     (native expressions, codegen'd — SURVEY §2.8 geo)
 *   - [[SpatialJoinStrategy]]: joins on `st_intersects` plan as a broadcast
 *     STRtree join instead of a nested-loop cross product
 *
 * Enable at build time:
 *   `SparkSession.builder().config("spark.sql.extensions", "graft.plans.GraftExtensions")`
 * or retrofit onto a live session with [[GraftExtensions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => SpatialJoinStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans", null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("st_intersects"),
      info("st_intersects", "st_intersects(aWkt, bWkt) - exact geometry intersection test"),
      (c: Seq[Expression]) => StIntersects(c(0), c(1))),
    (FunctionIdentifier("st_distance"),
      info("st_distance", "st_distance(aWkt, bWkt) - planar distance in degrees"),
      (c: Seq[Expression]) => StDistance(c(0), c(1))),
    (FunctionIdentifier("st_cell_cover"),
      info("st_cell_cover", "st_cell_cover(wkt, res) - AM-safe hierarchical cell cover"),
      (c: Seq[Expression]) => StCellCover(c(0), c(1))),
    (FunctionIdentifier("st_cell_cover_wkb"),
      info("st_cell_cover_wkb", "st_cell_cover_wkb(wkb, res) - cell cover over WKB geometry"),
      (c: Seq[Expression]) => StCellCoverWkb(c(0), c(1))),
    (FunctionIdentifier("st_intersects_wkb"),
      info("st_intersects_wkb", "st_intersects_wkb(dimWkt, probeWkb) - exact intersection, WKB probe"),
      (c: Seq[Expression]) => StIntersectsWkb(c(0), c(1))),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - exact cosine similarity of float embeddings"),
      (c: Seq[Expression]) => graft.ann.CosineSim(c(0), c(1))),
    (FunctionIdentifier("quantized_dot"),
      info("quantized_dot", "quantized_dot(a, b) - sum of floor(1024*a_i)*floor(1024*b_i)"),
      (c: Seq[Expression]) => graft.ann.QuantizedDot(c(0), c(1)))
  )

  /** Retrofit the functions + strategy onto an already-built session (the
    * driver owns session construction in Verify/Bench). Idempotent. Also
    * applies the engine's optimizer-rule exclusions (runtime-settable). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    if (!spark.experimental.extraStrategies.contains(SpatialJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SpatialJoinStrategy
    // merge with (never clobber) exclusions the host application already set
    val existing = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val merged = (existing ++ graft.GraftSession.ExcludedRules.split(",")).distinct
    spark.conf.set("spark.sql.optimizer.excludedRules", merged.mkString(","))
  }
}
