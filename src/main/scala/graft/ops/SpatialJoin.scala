package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/**
 * Cell-cover spatial join — the engine's core operator (SURVEY §2.3 J1/J2).
 *
 * The reference computes AOI×tile-grid intersection as an O(N·M) per-row
 * shapely loop, flagged "takes too long"
 * (`master_Search_Discover_example.ipynb` cells 10/63/157). Here both sides
 * are encoded to spatial cells at resolution `res`, equi-joined on the cell
 * id, then refined with an exact JTS intersects.
 *
 * Scale design (100 TB posture):
 *  - The dimension side (tile grid, ≤ ~60k polygons) is `broadcast()` —
 *    the probe (doc) side is touched only by narrow operators: a cell-cover
 *    projection, an explode, a broadcast hash join, a codegen'd filter.
 *    **Zero shuffles** over the big side.
 *  - Candidate-pair dedup (a pair sharing k cells appears k times) is done
 *    *without* a shuffle: a pair is kept only on the smallest shared cell
 *    (`cell == array_min(array_intersect(cells, tcells))`), the classic
 *    reporting-cell trick. `dropDuplicates` (an exchange over the full join
 *    output) is never needed.
 *  - If the dimension side outgrows broadcast, `shuffled = true` switches to
 *    a shuffle hash/SMJ equi-join on the cell id; AQE skew-join splitting
 *    plus optional explicit salting (`saltBuckets > 1`) handle dense
 *    acquisition cells (Fiji hotspot).
 */
object SpatialJoin {

  /**
   * Cell occupancy histogram of a geometry column at `res` — the skew
   * diagnostic the salting decision is made from (SURVEY §4.2; checkpoint it
   * alongside lineage metrics for ops visibility).
   */
  def cellHistogram(df: DataFrame, wktCol: String, res: Int): DataFrame =
    df.select(explode(cellCoverUdf(col(wktCol), lit(res))).as("cell"))
      .groupBy("cell").count()

  /**
   * Data-driven salt sizing: S = hottest-cell count / (rows-per-task
   * target), clamped to [1, 64]. A uniform corpus yields 1 (no salting
   * overhead); a hotspot corpus yields the replication factor that splits
   * its densest cell into ~`targetPerBucket`-row buckets.
   */
  def suggestSaltBuckets(df: DataFrame, wktCol: String, res: Int,
                         targetPerBucket: Long = 500000L): Int = {
    val top = cellHistogram(df, wktCol, res)
      .agg(max("count")).collect()(0).getLong(0)
    math.min(64L, math.max(1L, top / math.max(1L, targetPerBucket))).toInt
  }

  /**
   * @param probe   big side; must carry `probeWkt` column
   * @param dim     small side; must carry `dimWkt` column
   * @param res     cell resolution (2^res × 2^res world grid)
   * @param shuffled force the shuffle path (dimension too big to broadcast)
   * @param saltBuckets >1 adds an explicit salt to the cell key on the probe
   *                side and explodes the dim side ×S — skew insurance beyond
   *                AQE's shuffle-granularity splitting
   */
  def intersectJoin(probe: DataFrame, probeWkt: String,
                    dim: DataFrame, dimWkt: String,
                    res: Int, shuffled: Boolean = false,
                    saltBuckets: Int = 1): DataFrame = {
    // probe geometry may be WKT (string) or WKB (binary, the storage-side
    // encoding — ~5× cheaper to parse); dimension side stays WKT (small,
    // parsed once per task via the prepared-geometry LRU). The WKB (hot)
    // path runs NATIVE expressions (graft.plans.StCellCoverWkb /
    // StIntersectsWkb — no udf wrapper or result-encoder layers per row);
    // they are distinct node types from StIntersects, so the
    // SpatialJoinStrategy planning path is untouched.
    val probeIsWkb = probe.schema(probeWkt).dataType ==
      org.apache.spark.sql.types.BinaryType
    val cover: (Column, Column) => Column =
      if (probeIsWkb) graft.plans.SpatialColumns.stCellCoverWkb
      else graft.plans.SpatialColumns.stCellCover
    // WKT refine stays a UDF on purpose: a native StIntersects pushed into
    // the join condition would be intercepted by SpatialJoinStrategy and
    // replanned away from the cell equi-join; StIntersectsWkb is a distinct
    // node, so the WKB path is native end to end.
    val refine: (Column, Column) => Column =
      if (probeIsWkb) graft.plans.SpatialColumns.stIntersectsWkb
      else (d, p) => stIntersectsUdf(d, p)
    val p = probe.withColumn("__cells", cover(col(probeWkt), lit(res)))
    val d = dim.withColumn("__tcells", cellCoverUdf(col(dimWkt), lit(res)))

    val (pk, dk) =
      if (saltBuckets <= 1)
        (p.withColumn("__cell", explode(col("__cells"))),
         d.withColumn("__cell", explode(col("__tcells"))))
      else {
        // probe rows get one deterministic salt; dim rows replicate ×S
        val salted = p.withColumn("__salt", pmod(xxhash64(col(probeWkt)), lit(saltBuckets)))
          .withColumn("__cell0", explode(col("__cells")))
          .withColumn("__cell", concat_ws(":", col("__cell0"), col("__salt")))
        val dimRep = d.withColumn("__salt", explode(lit((0 until saltBuckets).toArray)))
          .withColumn("__cell0", explode(col("__tcells")))
          .withColumn("__cell", concat_ws(":", col("__cell0"), col("__salt")))
        (salted.drop("__cell0", "__salt"), dimRep.drop("__cell0", "__salt"))
      }

    // shuffle_hash hint: without it AQE converts the join back to broadcast
    // whenever the dim side is small (true at test scale, false at the
    // 60k-polygon+ scale this path exists for) — the hint keeps the
    // measured plan the one that actually runs at scale
    val dimSide = if (shuffled) dk.hint("shuffle_hash") else broadcast(dk)
    pk.join(dimSide, "__cell")
      // shuffle-free dedup: emit the pair only on the min shared cell
      .where(
        (if (saltBuckets <= 1) col("__cell")
         else split(col("__cell"), ":").getItem(0).cast("long"))
          === array_min(array_intersect(col("__cells"), col("__tcells"))))
      // exact geometric refine (reference: shapely intersects, cell 10)
      .where(refine(col(dimWkt), col(probeWkt)))
      .drop("__cell", "__cells", "__tcells")
  }
}
