package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Decompose geo_tile_assign cost: scan+wkt / cover / explode / join / refine. */
object ProbeParts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master(sys.env.getOrElse("PROBE_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32").config("spark.sql.optimizer.excludedRules", graft.GraftSession.ExcludedRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[parts] $label run$i n=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    // multithreaded kernel calibration: same work split over 32 threads
    (1 to 2).foreach { run =>
      val t0 = System.nanoTime()
      val threads = (0 until 32).map { t =>
        new Thread(() => {
          var i = t.toLong * 4687; val end = math.min(150000L, (t + 1).toLong * 4687)
          var acc = 0L
          while (i < end) {
            val xmin = -180.0 + (i * 37 % 5728) / 16.0
            val ymin = -90.0 + (i * 53 % 2816) / 16.0
            val wkt = graft.geom.Geo.rectWkt(xmin, ymin, xmin + 1.5, ymin + 1.0)
            acc += graft.geom.Geo.cellCoverWkt(wkt, 5).length
            i += 1
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      println(f"[parts] kernel-32threads run$run wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // driver-side kernel calibration: rectWkt + cellCover for 150k lattice rows
    (1 to 2).foreach { run =>
      val t0 = System.nanoTime()
      var i = 0L; var acc = 0L
      while (i < 150000) {
        val xmin = -180.0 + (i * 37 % 5728) / 16.0
        val ymin = -90.0 + (i * 53 % 2816) / 16.0
        val wkt = graft.geom.Geo.rectWkt(xmin, ymin, xmin + 1.5, ymin + 1.0)
        acc += graft.geom.Geo.cellCoverWkt(wkt, 5).length
        i += 1
      }
      println(f"[parts] driver-kernel run$run cells=$acc wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val scenes = graft.model.SynthCorpus.scenesFromOrders(spark, sfDir)
    val tiles = graft.model.SynthCorpus.tileGrid(spark).drop("path", "row")
    println(s"[parts] scenes partitions=${scenes.rdd.getNumPartitions}")
    println(s"[parts] exploded partitions=${scenes.withColumn("__cells", cellCoverUdf(col("wkt"), lit(5)))
      .withColumn("__cell", explode(col("__cells"))).rdd.getNumPartitions}")
    val trivialUdf = udf((x: Double, y: Double) => Array(x.toLong, y.toLong))
    val wktOnlyUdf = udf((x: Double, y: Double) => graft.geom.Geo.rectWkt(x, y, x + 1.5, y + 1.0))
    val coverOnlyUdf = udf((x: Double, y: Double) =>
      graft.geom.Geo.cellCover(graft.geom.Geo.rect(x, y, x + 1.5, y + 1.0), 5))
    t("trivial-udf+explode")(scenes.withColumn("__cells", trivialUdf(col("xmin"), col("ymin")))
      .withColumn("__cell", explode(col("__cells"))).count())
    t("wkt-only-udf")(scenes.withColumn("w2", wktOnlyUdf(col("xmin"), col("ymin")))
      .where(length(col("w2")) > 0).count())
    t("cover-only-udf+explode")(scenes.withColumn("__cells", coverOnlyUdf(col("xmin"), col("ymin")))
      .withColumn("__cell", explode(col("__cells"))).count())
    t("scan+wkt")(scenes.count())
    t("cover")(scenes.withColumn("__cells", cellCoverUdf(col("wkt"), lit(5))).count())
    t("cover+explode")(scenes.withColumn("__cells", cellCoverUdf(col("wkt"), lit(5)))
      .withColumn("__cell", explode(col("__cells"))).count())
    val d = tiles.withColumnRenamed("wkt", "tile_wkt")
      .withColumn("__tcells", cellCoverUdf(col("tile_wkt"), lit(5)))
      .withColumn("__cell", explode(col("__tcells")))
    val p = scenes.withColumn("__cells", cellCoverUdf(col("wkt"), lit(5)))
      .withColumn("__cell", explode(col("__cells")))
    t("join-no-refine")(p.join(broadcast(d), "__cell").count())
    t("join+dedup")(p.join(broadcast(d), "__cell")
      .where(col("__cell") === array_min(array_intersect(col("__cells"), col("__tcells")))).count())
    t("full")(graft.ops.TileAssign.assign(scenes, tiles).count())
    spark.stop()
  }
}
