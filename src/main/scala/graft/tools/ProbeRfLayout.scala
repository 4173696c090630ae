package graft.tools

import org.apache.spark.sql.functions._

/** Measure RF fit wall vs training-set partition width (ml_water's
  * dominant cost). `sbt "runMain graft.tools.ProbeRfLayout [sfDir]"`. */
object ProbeRfLayout {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[rflayout] $label wall=${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val bands = Seq("green", "nir", "swir1")
    val px = graft.ops.Pixels.pixels(spark, sfDir)
      .withColumn("pc", when(col("nir") < col("swir1"), 80.0).otherwise(10.0))
      .withColumn("valid_img", col("pixel_qa") =!= 1)
      .withColumn("valid_lab", col("scene_classification") =!= 0)
    px.count()
    val sel = px.where(col("valid_img") && col("valid_lab"))
      .withColumn("label", graft.ml.MLWater.waterLabel(col("pc")))
      .select(col("label") +: bands.map(b => col(b).cast("double")): _*)
    println(s"[rflayout] training rows = ${sel.count()}")
    Seq(32, 16, 8, 32).foreach { parts =>
      val labeled = sel.repartition(parts).persist()
      t(s"parts=$parts materialize")(labeled.count())
      val assembled = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(bands.toArray).setOutputCol("features").setHandleInvalid("keep")
        .transform(labeled)
      (1 to 2).foreach { i =>
        t(s"parts=$parts RF fit run$i") {
          new org.apache.spark.ml.classification.RandomForestClassifier()
            .setNumTrees(4).setMaxDepth(5).setFeatureSubsetStrategy("sqrt").setSeed(42L)
            .fit(assembled)
        }
      }
      labeled.unpersist()
    }
    spark.stop()
  }
}
