package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Per-sensor band-name normalization (SURVEY §2.2 P2): canonical band from a
 * product file name. Mapping tables and file-name surgery transcribed from
 * the reference (`utils/prepS2.py:84-134`, `utils/prepLS.py:28-100`,
 * `utils/prepS1.py:223-240`, `utils/prepMOD.py:57-83`) — these drive
 * `spans.text` for band spans, so they must match exactly.
 *
 * Two forms: a scalar (oracle/tests) and a pure Column expression
 * (codegen'd `element_at(map, key)` over literal maps — no UDF).
 */
object BandNames {

  val s2L1C: Map[String, String] = Map(
    "B01" -> "coastal_aerosol", "B02" -> "blue", "B03" -> "green",
    "B04" -> "red", "B05" -> "vegetation_red_edge_1",
    "B06" -> "vegetation_red_edge_2", "B07" -> "vegetation_red_edge_3",
    "B08" -> "nir", "B8A" -> "vegetation_red_edge_4",
    "B09" -> "water_vapour", "B10" -> "swir_cirrus",
    "B11" -> "swir1", "B12" -> "swir2", "TCI" -> "true_colour")

  val s2L2A: Map[String, String] = Map(
    "AOT_10m" -> "aerosol_optical_thickness", "B01_60m" -> "coastal_aerosol",
    "B02_10m" -> "blue", "B03_10m" -> "green", "B04_10m" -> "red",
    "B05_20m" -> "vegetation_red_edge_1", "B06_20m" -> "vegetation_red_edge_2",
    "B07_20m" -> "vegetation_red_edge_3", "B08_10m" -> "nir",
    "B8A_20m" -> "vegetation_red_edge_4", "B09_60m" -> "water_vapour",
    "B11_20m" -> "swir1", "B12_20m" -> "swir2",
    "SCL_20m" -> "scene_classification", "WVP_10m" -> "wvp")

  /** Landsat 4/5/7 share one table (prepLS.py:44). */
  val l7: Map[String, String] = Map(
    "bt_band6" -> "brightness_temperature_1", "pixel_qa" -> "pixel_qa",
    "cloud_qa" -> "sr_cloud_qa", "radsat_qa" -> "radsat_qa",
    "atmos_opacity" -> "sr_atmos_opacity", "sr_band1" -> "blue",
    "sr_band2" -> "green", "sr_band3" -> "red", "sr_band4" -> "nir",
    "sr_band5" -> "swir1", "sr_band7" -> "swir2")

  val l8: Map[String, String] = Map(
    "bt_band10" -> "brightness_temperature_1", "bt_band11" -> "brightness_temperature_2",
    "pixel_qa" -> "pixel_qa", "radsat_qa" -> "radsat_qa", "sr_aerosol" -> "sr_aerosol",
    "sr_band1" -> "coastal_aerosol", "sr_band2" -> "blue", "sr_band3" -> "green",
    "sr_band4" -> "red", "sr_band5" -> "nir", "sr_band6" -> "swir1",
    "sr_band7" -> "swir2")

  val mcd43a4: Map[String, String] = Map(
    "Nadir_Reflectance_Band1" -> "red", "Nadir_Reflectance_Band2" -> "nir",
    "Nadir_Reflectance_Band3" -> "blue", "Nadir_Reflectance_Band4" -> "green",
    "Nadir_Reflectance_Band5" -> "swir1", "Nadir_Reflectance_Band6" -> "swir2",
    "Nadir_Reflectance_Band7" -> "mwir",
    "BRDF_Albedo_Band_Mandatory_Quality_Band1" -> "qa_red",
    "BRDF_Albedo_Band_Mandatory_Quality_Band2" -> "qa_nir",
    "BRDF_Albedo_Band_Mandatory_Quality_Band3" -> "qa_blue",
    "BRDF_Albedo_Band_Mandatory_Quality_Band4" -> "qa_green",
    "BRDF_Albedo_Band_Mandatory_Quality_Band5" -> "qa_swir1",
    "BRDF_Albedo_Band_Mandatory_Quality_Band6" -> "qa_swir2",
    "BRDF_Albedo_Band_Mandatory_Quality_Band7" -> "qa_mwir")

  private def basename(p: String) = p.substring(p.lastIndexOf('/') + 1)
  private def dropExt(s: String) = s.substring(0, s.length - 4)

  /** Scalar normalizer — the reference's exact file-name surgery. */
  def normalize(path: String): Option[String] = {
    val name = basename(path)
    if (name.contains("Gamma0_VH")) Some("vh")
    else if (name.contains("Gamma0_VV")) Some("vv")
    else if (name.contains("LayoverShadow_MASK")) Some("layovershadow_mask")
    else if (name.startsWith("MCD43A4")) mcd43a4.get(dropExt(name).substring(24))
    else if (name.startsWith("LE07_") || name.startsWith("LT04_") || name.startsWith("LT05_")) {
      val parts = name.split('_'); l7.get(s"${parts(parts.length - 2)}_${dropExt(parts.last)}")
    } else if (name.startsWith("LC08_")) {
      val parts = name.split('_'); l8.get(s"${parts(parts.length - 2)}_${dropExt(parts.last)}")
    } else if (name.split('_').lift(1).contains("MSIL1C"))
      s2L1C.get(dropExt(name.split('_').last))
    else if (name.length >= 11) s2L2A.get(dropExt(name.takeRight(11)))
    else None
  }

  /** Column form: codegen'd map lookups — no UDF. */
  def normalizeColumn(path: Column): Column = {
    val name = element_at(split(path, "/"), -1)
    val lastTok = element_at(split(name, "_"), -1)
    val lastTokNoExt = lastTok.substr(lit(1), length(lastTok) - 4)
    val partsKey = concat( // parts[-2] + "_" + parts[-1][:-4]
      element_at(split(name, "_"), -2), lit("_"), lastTokNoExt)
    when(name.contains("Gamma0_VH"), "vh")
      .when(name.contains("Gamma0_VV"), "vv")
      .when(name.contains("LayoverShadow_MASK"), "layovershadow_mask")
      .when(name.startsWith("MCD43A4"),
        element_at(typedLit(mcd43a4), name.substr(lit(25), length(name) - 28)))
      .when(name.startsWith("LE07_") || name.startsWith("LT04_") || name.startsWith("LT05_"),
        element_at(typedLit(l7), partsKey))
      .when(name.startsWith("LC08_"), element_at(typedLit(l8), partsKey))
      .when(element_at(split(name, "_"), 2) === "MSIL1C",
        element_at(typedLit(s2L1C), lastTokNoExt))
      .otherwise(element_at(typedLit(s2L2A),
        name.substr(length(name) - 10, lit(7))))
  }

  /** DuckDB CASE expression generated from the SAME maps (single source of
    * truth for the oracle). `c` must be a bare file name (no dirs). */
  def normalizeSql(c: String): String = {
    def cases(m: Map[String, String], keyExpr: String) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"WHEN $keyExpr = '$k' THEN '$v'" }.mkString(" ")
    val lastNoExt = s"substring(string_split($c, '_')[-1], 1, length(string_split($c, '_')[-1]) - 4)"
    val partsKey = s"concat(string_split($c, '_')[-2], '_', $lastNoExt)"
    s"""CASE
       | WHEN contains($c, 'Gamma0_VH') THEN 'vh'
       | WHEN contains($c, 'Gamma0_VV') THEN 'vv'
       | WHEN contains($c, 'LayoverShadow_MASK') THEN 'layovershadow_mask'
       | WHEN starts_with($c, 'MCD43A4') THEN (CASE ${cases(mcd43a4, s"substring($c, 25, length($c) - 28)")} END)
       | WHEN starts_with($c, 'LE07_') OR starts_with($c, 'LT04_') OR starts_with($c, 'LT05_')
       |   THEN (CASE ${cases(l7, partsKey)} END)
       | WHEN starts_with($c, 'LC08_') THEN (CASE ${cases(l8, partsKey)} END)
       | WHEN string_split($c, '_')[2] = 'MSIL1C' THEN (CASE ${cases(s2L1C, lastNoExt)} END)
       | ELSE (CASE ${cases(s2L2A, s"substring($c, length($c) - 10, 7)")} END)
       |END""".stripMargin
  }
}
