package graft.table

import graft.SparkTestSession
import graft.model.SynthCorpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Spatial partition layout: AOI reads prune at the directory level and
 * return exactly the brute-force footprint∩AOI doc set (each doc once).
 */
class SpatialLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val docs = SynthCorpus.docs(spark, 1500, seed = 9L).cache()
  private val aoi = graft.geom.Geo.rectWkt(170.0, -25.0, 179.0, -10.0)

  private lazy val path = {
    val d = java.nio.file.Files.createTempDirectory("graft_layout").toString
    SpatialLayout.writeByCell(docs, d, res = 3)
    d
  }

  test("readAoi == brute-force AOI filter, one row per doc") {
    val got = SpatialLayout.readAoi(spark, path, aoi, res = 3)
      .select("doc_id").collect().map(_.getString(0)).toSeq
    assert(got.distinct.size == got.size, "duplicated docs across partitions")
    val expect = docs.collect().filter { r =>
      graft.geom.Geo.intersects(aoi, r.getAs[String]("wkt"))
    }.map(_.getAs[String]("doc_id")).toSet
    assert(got.toSet == expect)
    assert(expect.nonEmpty)
  }

  test("directory pruning: the scan only touches partitions in the AOI cover") {
    val aoiCells = graft.geom.Geo.cellCoverWkt(aoi, 3).toSet
    val allParts = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(s"${SpatialLayout.PartCol}="))
      .map(_.getName.stripPrefix(s"${SpatialLayout.PartCol}=").toLong).toSet
    assert(aoiCells.size < allParts.size / 4,
      s"test corpus too concentrated: ${aoiCells.size} vs ${allParts.size}")

    val scanned = SpatialLayout.readAoi(spark, path, aoi, res = 3)
      .queryExecution.executedPlan.toString
    // the pushed partition filter must appear in the scan
    assert(scanned.contains(SpatialLayout.PartCol),
      s"partition column not in scan:\n$scanned")
    // physical proof: rows read from non-AOI partitions would surface as
    // extra distinct cell_p values in a projection without the refine
    val touched = spark.read.parquet(path)
      .where(col(SpatialLayout.PartCol).isin(aoiCells.toSeq: _*))
      .select(SpatialLayout.PartCol).distinct().collect().map(_.getLong(0)).toSet
    assert(touched.subsetOf(aoiCells))
  }

  test("span-sequence invariant survives layout roundtrip") {
    val back = SpatialLayout.readAoi(spark, path, aoi, res = 3)
      .select(col("doc_id"), to_json(col("spans")).as("s_out"))
    val orig = docs.select(col("doc_id"), to_json(col("spans")).as("s_in"))
    val j = back.join(orig, "doc_id")
    assert(j.where(col("s_out") =!= col("s_in")).count() == 0)
  }
}
