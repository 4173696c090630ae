package graft.tools

import org.apache.spark.sql.functions._

/** Decompose ml_water cost: labeled-build / guard / RF fit / tree extract /
  * predict. `sbt "runMain graft.tools.ProbeMLWater [sfDir]"`. */
object ProbeMLWater {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[mlwater] $label wall=${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val bands = Seq("green", "nir", "swir1")
    val px = graft.ops.Pixels.pixels(spark, sfDir)
      .withColumn("pc", when(col("nir") < col("swir1"), 80.0).otherwise(10.0))
      .withColumn("valid_img", col("pixel_qa") =!= 1)
      .withColumn("valid_lab", col("scene_classification") =!= 0)
    t("warm scan")(px.count())
    val labeled = px.where(col("valid_img") && col("valid_lab"))
      .withColumn("label", graft.ml.MLWater.waterLabel(col("pc")))
      .select(col("label") +: bands.map(b => col(b).cast("double")): _*)
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    t("labeled count (persist)")(labeled.count())
    println(s"[mlwater] labeled partitions = ${labeled.rdd.getNumPartitions}")
    t("class-count guard")(graft.ml.MLWater.assertClassCounts(labeled, "label", 200L))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(bands.toArray).setOutputCol("features").setHandleInvalid("keep")
      .transform(labeled)
    val model = t("RF fit") {
      new org.apache.spark.ml.classification.RandomForestClassifier()
        .setNumTrees(4).setMaxDepth(5).setFeatureSubsetStrategy("sqrt").setSeed(42L)
        .fit(assembled)
    }
    labeled.unpersist()
    val trees = t("extractTrees (save+read)")(graft.ml.MLWater.extractTrees(spark, model))
    (1 to 3).foreach { i =>
      t(s"predict noop run$i") {
        graft.ml.MLWater.predictFromTrees(trees, px, bands, col("valid_img"),
          keys = Seq("l_orderkey", "l_linenumber"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
