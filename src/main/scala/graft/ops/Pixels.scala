package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic pixel table (FIXTURES.md F4) derived from
 * `lineitem` with pure integer arithmetic — the same derivation exists as
 * SQL so DuckDB oracles the pixel-plane operators (wofs, composites,
 * summary stats). Stands in for per-band COG contents; the cube dims
 * (time,y,x)+bands (`utils/genprepWater.py:225-233`) map to long form:
 * pixel key (py,px), time = l_shipdate, band columns.
 *
 * All band values ≥ 1 (no zero denominators in the NDI ratios); `red2`
 * carries a −9999 nodata sentinel slice for the summary-stats operator.
 */
object Pixels {

  def pixels(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      col("l_orderkey"), col("l_linenumber"), col("l_shipdate").as("ts"),
      (col("l_orderkey") % 64).as("py"),
      (col("l_partkey") % 64).as("px"),
      ((col("l_orderkey") * 7 + col("l_linenumber") * 13) % 2999 + 1).as("blue"),
      ((col("l_partkey") * 11 + col("l_linenumber")) % 2999 + 1).as("green"),
      ((col("l_suppkey") * 17 + col("l_linenumber")) % 2999 + 1).as("red"),
      ((col("l_orderkey") * 23 + col("l_partkey")) % 2999 + 1).as("nir"),
      ((col("l_partkey") * 29 + col("l_linenumber") * 3) % 2999 + 1).as("swir1"),
      ((col("l_orderkey") * 31 + col("l_partkey")) % 2999 + 1).as("swir2"),
      // LANDSAT_7 pixel_qa domain: clear/water values + fill/cloud values
      // (utils/dc_mosaic.py:464-476)
      element_at(typedLit(Seq(66, 130, 68, 132, 1, 96, 224, 160)),
        ((col("l_orderkey") + col("l_linenumber")) % 8 + 1).cast("int")).as("pixel_qa"),
      // S2 SCL 0..11 (s2_esa_sr_granule.yaml flags)
      ((col("l_orderkey") * 3 + col("l_linenumber")) % 12).cast("int").as("scene_classification"),
      // summary-stats band with nodata −9999 sentinel (~1/37 of rows)
      when((col("l_orderkey") + col("l_partkey")) % 37 === 0, lit(-9999))
        .otherwise((col("l_suppkey") * 13 + col("l_orderkey")) % 5000).as("red2")
    )

  val pixelsSql: String =
    """SELECT l_orderkey, l_linenumber, l_shipdate AS ts,
      |       l_orderkey % 64 AS py, l_partkey % 64 AS px,
      |       (l_orderkey * 7 + l_linenumber * 13) % 2999 + 1 AS blue,
      |       (l_partkey * 11 + l_linenumber) % 2999 + 1 AS green,
      |       (l_suppkey * 17 + l_linenumber) % 2999 + 1 AS red,
      |       (l_orderkey * 23 + l_partkey) % 2999 + 1 AS nir,
      |       (l_partkey * 29 + l_linenumber * 3) % 2999 + 1 AS swir1,
      |       (l_orderkey * 31 + l_partkey) % 2999 + 1 AS swir2,
      |       ([66, 130, 68, 132, 1, 96, 224, 160])[cast((l_orderkey + l_linenumber) % 8 + 1 AS int)] AS pixel_qa,
      |       cast((l_orderkey * 3 + l_linenumber) % 12 AS int) AS scene_classification,
      |       CASE WHEN (l_orderkey + l_partkey) % 37 = 0 THEN -9999
      |            ELSE (l_suppkey * 13 + l_orderkey) % 5000 END AS red2
      |FROM lineitem""".stripMargin
}
