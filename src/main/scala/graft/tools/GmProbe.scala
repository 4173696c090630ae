package graft.tools

import org.apache.spark.sql.functions._

/**
 * Decompose the px_geomedian wall at a given SF: scan+shuffle skeleton,
 * native collect_list baseline, the native [[graft.ops.GeomedianVec]]
 * TypedImperativeAggregate, and the legacy `udaf(Aggregator)` bridge.
 * Round-6 finding (sf0.1, warm): skeleton 0.23 s · collect_list ~1.0 s ·
 * GeomedianVec(32) ~1.5 s · udaf(32) ~1.9 s · udaf(0 iters) ~1.8 s — i.e.
 * the Weiszfeld math is <0.2 s and the wall is the object-aggregation
 * per-row machinery shared with collect_list, not buffer serialization.
 * The native expression removes the udaf bridge's per-row Seq[Double]
 * deserialization (~0.3-0.4 s) and is the hot-path form.
 */
object GmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    val px = graft.ops.Pixels.pixels(spark, sfDir)
    def timed(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        f
        println(f"[gmprobe] $tag rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    timed("skeleton groupBy count") {
      px.groupBy("py", "px").agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    timed("skeleton same-columns sum(blue*nir*red)") {
      px.groupBy("py", "px")
        .agg(sum(col("blue").cast("double") * col("nir").cast("double") * col("red").cast("double")))
        .write.format("noop").mode("overwrite").save()
    }
    timed("native collect_list(array)") {
      px.groupBy("py", "px")
        .agg(collect_list(array(col("blue").cast("double"), col("nir").cast("double"),
          col("red").cast("double"))))
        .write.format("noop").mode("overwrite").save()
    }
    timed("native GeomedianVec 32 iters") {
      px.groupBy("py", "px")
        .agg(graft.ops.GeomedianVec(32, 0.0)(col("blue").cast("double"),
          col("nir").cast("double"), col("red").cast("double")))
        .write.format("noop").mode("overwrite").save()
    }
    timed("native GeomedianVec 0 iters (input path only)") {
      px.groupBy("py", "px")
        .agg(graft.ops.GeomedianVec(0, 0.0)(col("blue").cast("double"),
          col("nir").cast("double"), col("red").cast("double")))
        .write.format("noop").mode("overwrite").save()
    }
    val agg = udaf(new graft.ops.GeomedianAggP(maxIter = 32, tol = 0.0))
    timed("udaf bridge 32 iters") {
      px.groupBy("py", "px")
        .agg(agg(array(col("blue").cast("double"), col("nir").cast("double"),
          col("red").cast("double"))))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
