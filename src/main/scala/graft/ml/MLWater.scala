package graft.ml

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-scene random-forest water classifier (SURVEY §2.9; reference
 * `utils/genprepMLWater.py:255-358`), re-expressed on spark.ml over the
 * long-form pixel table instead of scikit-learn over stacked numpy arrays.
 *
 * Reference semantics preserved:
 *  - label: WOfS-summary persistence `pc >= 50` → water(1), else 0
 *    (`:286-289`, water_thresh = 50)
 *  - training rows: inner valid mask (img ∧ lab) (`:281-283`)
 *  - class-count guard: ≥ `minPerClass` (2000) samples per class (`:299-302`)
 *  - model: 4 trees, depth 5, sqrt feature subset, bootstrap (`:317-323`)
 *  - outputs: water_mask ∈ {0, 1}, water_prob = P(water)·100 as int,
 *    −9999 outside the image valid mask (`:329-358`)
 *
 * Scale posture: training samples for one scene fit comfortably per task;
 * spark.ml's RF trains distributed over the pixel table, and prediction is a
 * narrow map — no driver-side collect of pixels.
 */
object MLWater {

  final case class Params(
      waterThresh: Double = 50.0,
      minPerClass: Long = 2000L,
      numTrees: Int = 4,
      maxDepth: Int = 5,
      seed: Long = 42L)

  val Nodata: Int = -9999

  /** Reference `:286-289`: persistence ≥ thresh → 1.0 else 0.0 (NULL-safe). */
  def waterLabel(pc: Column, thresh: Double = 50.0): Column =
    when(pc >= thresh, 1.0).otherwise(0.0)

  /** Guard `:299-302`: every class must clear `minPerClass`, and both
    * classes must be present. Throws like the reference (log-and-raise). */
  def assertClassCounts(labeled: DataFrame, labelCol: String, minPerClass: Long): Unit = {
    val counts = labeled.groupBy(labelCol).count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    require(counts.size == 2 && counts.values.forall(_ >= minPerClass),
      s"class counts below training minimum $minPerClass: $counts")
  }

  /** Train on the inner-valid-mask rows of `px`. */
  def train(px: DataFrame, bands: Seq[String], pcCol: String,
            validImg: Column, validLab: Column,
            p: Params = Params()): RandomForestClassificationModel = {
    val labeled = px.where(validImg && validLab)
      .withColumn("label", waterLabel(col(pcCol), p.waterThresh))
      .select(col("label") +: bands.map(b => col(b).cast("double")): _*)
      .persist() // guard pass + RF's tree-depth passes reuse it, then release
    try {
      assertClassCounts(labeled, "label", p.minPerClass)
      val assembled = new VectorAssembler()
        .setInputCols(bands.toArray).setOutputCol("features")
        .setHandleInvalid("keep")
        .transform(labeled)
      new RandomForestClassifier()
        .setNumTrees(p.numTrees)
        .setMaxDepth(p.maxDepth)
        .setFeatureSubsetStrategy("sqrt")
        .setSeed(p.seed)
        .fit(assembled)
    } finally labeled.unpersist()
  }

  /** Predict over the image-valid rows; invalid rows → −9999 on both
    * outputs (reference `:329-358`). Keeps `keys` passthrough columns. */
  def predict(model: RandomForestClassificationModel, px: DataFrame,
              bands: Seq[String], validImg: Column, keys: Seq[String]): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(bands.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
      .transform(px.withColumn("__valid", validImg))
    val scored = model.transform(assembled)
    val probOf1 = udf((v: Vector) => (v(1) * 100).toInt)
    scored.select(
      keys.map(col) :+
        when(col("__valid"), col("prediction").cast("int")).otherwise(Nodata).as("water_mask") :+
        when(col("__valid"), probOf1(col("probability"))).otherwise(Nodata).as("water_prob"): _*)
  }
}
