package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The Catalyst plane: native spatial expressions + the SparkStrategy that
 * plans `st_intersects` joins as a broadcast STRtree join.
 *
 * Oracle: the DataFrame-API cell-cover join (itself oracle-checked against
 * brute force in SpatialJoinSpec) and direct JTS brute force.
 */
class SpatialPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withExtensions[T](f: => T): T = {
    GraftExtensions.register(spark)
    f
  }

  private def scenes = graft.model.SynthCorpus.docs(spark, 2000, seed = 7L)
    .select(col("doc_id"), col("wkt"))

  private def tiles = graft.model.SynthCorpus.tileGrid(spark)
    .select(col("tile_id"), col("wkt").as("tile_wkt"))

  test("st_intersects expression: eval == codegen == JTS") {
    withExtensions {
      val df = scenes.limit(200).crossJoin(tiles.limit(20))
        .select(col("doc_id"), col("tile_id"),
          SpatialColumns.stIntersects(col("tile_wkt"), col("wkt")).as("hit"),
          col("wkt"), col("tile_wkt"))
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val expect = graft.geom.Geo.intersects(r.getAs[String]("tile_wkt"), r.getAs[String]("wkt"))
        assert(r.getAs[Boolean]("hit") == expect, s"${r.getAs[String]("doc_id")}")
      }
    }
  }

  test("SQL cosine_sim / quantized_dot registered via extensions") {
    withExtensions {
      graft.SparkTestSession.spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
        .createOrReplaceTempView("sp_embs")
      val r = graft.SparkTestSession.spark.sql(
        """SELECT cosine_sim(embedding, embedding) AS self_sim,
          |       quantized_dot(embedding, embedding) AS qd
          |FROM sp_embs LIMIT 20""".stripMargin).collect()
      assert(r.length == 20)
      r.foreach { row =>
        assert(math.abs(row.getDouble(0) - 1.0) < 1e-12) // self-cosine ≈ 1
        assert(row.getDouble(1) > 0.0)
      }
    }
  }

  test("SQL st_intersects function registered via extensions") {
    withExtensions {
      scenes.createOrReplaceTempView("sp_scenes")
      tiles.createOrReplaceTempView("sp_tiles")
      val n = spark.sql(
        """SELECT count(*) AS n FROM sp_scenes s JOIN sp_tiles t
          |ON st_intersects(t.tile_wkt, s.wkt)""".stripMargin)
        .collect()(0).getLong(0)
      assert(n > 2000) // every scene hits ≥1 tile (grid tiles the world)
    }
  }

  test("strategy plans BroadcastSpatialJoinExec and matches the cell-cover join") {
    withExtensions {
      val joined = scenes.join(tiles,
        SpatialColumns.stIntersects(col("tile_wkt"), col("wkt")))
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastSpatialJoinExec"),
        s"expected spatial exec in plan:\n$physical")

      val viaStrategy = joined.select("doc_id", "tile_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val viaCoverJoin = graft.ops.TileAssign.assign(scenes, tiles.withColumnRenamed("tile_wkt", "wkt"))
        .select("doc_id", "tile_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(viaStrategy == viaCoverJoin)
      assert(viaStrategy.size > 2000)
    }
  }

  test("extra join conjuncts are preserved (filter after spatial match)") {
    withExtensions {
      val joined = scenes.join(tiles,
        SpatialColumns.stIntersects(col("tile_wkt"), col("wkt")) &&
          col("tile_id") > "T11")
      val all = scenes.join(tiles, SpatialColumns.stIntersects(col("tile_wkt"), col("wkt")))
        .where(col("tile_id") > "T11")
      assert(joined.count() == all.count())
      assert(joined.queryExecution.executedPlan.toString.contains("BroadcastSpatialJoinExec"))
    }
  }

  test("pure-SQL Search & Discover: spatial join + anti-join in one statement") {
    withExtensions {
      scenes.createOrReplaceTempView("sd_docs")
      tiles.createOrReplaceTempView("sd_tiles")
      val inv = graft.ops.TileAssign.assign(scenes, tiles.withColumnRenamed("tile_wkt", "wkt"))
        .select(col("doc_id"), col("tile_id")).limit(50)
      inv.createOrReplaceTempView("sd_inventory")
      val remaining = spark.sql(
        """WITH assigned AS (
          |  SELECT d.doc_id, t.tile_id
          |  FROM sd_docs d JOIN sd_tiles t ON st_intersects(t.tile_wkt, d.wkt))
          |SELECT a.doc_id, a.tile_id FROM assigned a
          |ANTI JOIN sd_inventory i
          |  ON a.doc_id = i.doc_id AND a.tile_id = i.tile_id""".stripMargin)
      assert(remaining.queryExecution.executedPlan.toString.contains("BroadcastSpatialJoinExec"))
      val total = graft.ops.TileAssign.assign(scenes, tiles.withColumnRenamed("tile_wkt", "wkt")).count()
      assert(remaining.count() == total - inv.count())
    }
  }

  test("st_cell_cover expression == Geo.cellCoverWkt") {
    withExtensions {
      val rows = scenes.limit(100)
        .select(col("wkt"), SpatialColumns.stCellCover(col("wkt"), lit(5)).as("cells"))
        .collect()
      rows.foreach { r =>
        val expect = graft.geom.Geo.cellCoverWkt(r.getAs[String]("wkt"), 5).toSeq
        assert(r.getSeq[Long](1).toSeq == expect)
      }
    }
  }

  test("st_distance expression == JTS distance") {
    withExtensions {
      val rows = scenes.limit(50).crossJoin(tiles.limit(5))
        .select(col("wkt"), col("tile_wkt"),
          SpatialColumns.stDistance(col("wkt"), col("tile_wkt")).as("d"))
        .collect()
      rows.foreach { r =>
        val expect = graft.geom.Geo.distance(r.getAs[String]("wkt"), r.getAs[String]("tile_wkt"))
        assert(r.getAs[Double]("d") == expect)
      }
    }
  }
}
