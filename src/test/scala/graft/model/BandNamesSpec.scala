package graft.model

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden band-name normalization vs the reference's tables + file surgery
  * (`prepS2.py:84-134`, `prepLS.py:28-100`, `prepS1.py:223-240`,
  * `prepMOD.py:57-83`); Column form must agree with the scalar form. */
class BandNamesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val golden = Seq(
    ("S2A_MSIL1C_20180820T223011_N0206_R072_T60KWE_20180821T013410_B02.jp2", "blue"),
    ("S2A_MSIL1C_20180820T223011_N0206_R072_T60KWE_20180821T013410_B8A.jp2", "vegetation_red_edge_4"),
    ("S2A_MSIL1C_20180820T223011_N0206_R072_T60KWE_20180821T013410_TCI.jp2", "true_colour"),
    ("T60KWE_20190124T221941_B08_10m.tif", "nir"),
    ("T60KWE_20190124T221941_SCL_20m.tif", "scene_classification"),
    ("T60KWE_20190124T221941_AOT_10m.tif", "aerosol_optical_thickness"),
    ("LE07_L1TP_074072_20190101_20190127_01_T1_sr_band4.tif", "nir"),
    ("LT05_L1TP_074072_19900101_19900127_01_T1_bt_band6.tif", "brightness_temperature_1"),
    ("LE07_L1TP_074072_20190101_20190127_01_T1_pixel_qa.tif", "pixel_qa"),
    ("LC08_L1TP_074072_20190101_20190127_01_T1_sr_band6.tif", "swir1"),
    ("LC08_L1TP_074072_20190101_20190127_01_T1_sr_aerosol.tif", "sr_aerosol"),
    ("S1A_IW_GRDH_1SDV_20190101_Gamma0_VV.img", "vv"),
    ("S1A_IW_GRDH_1SDV_20190101_Gamma0_VH.img", "vh"),
    ("S1A_IW_GRDH_1SDV_20190101_LayoverShadow_MASK.img", "layovershadow_mask"),
    ("MCD43A4.A2019010.h31v10.Nadir_Reflectance_Band3.tif", "blue"),
    ("MCD43A4.A2019010.h31v10.BRDF_Albedo_Band_Mandatory_Quality_Band5.tif", "qa_swir1")
  )

  test("scalar normalizer matches the reference tables (golden)") {
    golden.foreach { case (path, want) =>
      assert(BandNames.normalize(path).contains(want), path)
      assert(BandNames.normalize(s"/some/dir/$path").contains(want), s"with dirs: $path")
    }
    assert(BandNames.normalize("LE07_x_y_unknown_thing.tif").isEmpty)
  }

  test("Column form ≡ scalar form on golden + fuzz names") {
    val fuzz = (0 until 50).map(i => s"T60KWE_${i}_B04_10m.tif")
    val paths = (golden.map(_._1) ++ fuzz).toDF("path")
    val got = paths.select(col("path"), BandNames.normalizeColumn(col("path")).as("band"))
      .as[(String, Option[String])].collect().toMap
    (golden.map(_._1) ++ fuzz).foreach { p =>
      assert(got(p) == BandNames.normalize(p), p)
    }
  }
}
