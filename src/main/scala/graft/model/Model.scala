package graft.model

/**
 * The mandated interleaved text+media document model (BASELINE.json
 * input_hint). A document is a scene: 'meta' spans carry textual metadata
 * (platform, center_dt, footprint WKT — the fields of the reference's scene
 * YAML, `utils/prepS2.py:326-394`), 'band' spans carry a canonical band name
 * in `text` and the COG media path in `media_ref`
 * (yaml `image.bands.<band>.path`, `utils/prepS2.py:352-356`).
 *
 * Span order is load-bearing (band lists are positional,
 * `utils/genprepWater.py:28-30, 185-191`), hence `offset` and the engine-wide
 * span-sequence-equality invariant.
 */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

case class SceneDoc(doc_id: String, spans: Seq[Span])

/** Output tile grid row (reference: `sentinel2_tiles_world.geojson` col
  * `Name`; `WRS2_descending.geojson` PATH/ROW — SURVEY §1.1). */
case class Tile(tile_id: String, wkt: String, path: Int, row: Int)

object Docs {
  import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

  implicit val sceneDocEncoder: Encoder[SceneDoc] = Encoders.product[SceneDoc]
  implicit val spanEncoder: Encoder[Span] = Encoders.product[Span]

  /** Typed view of a doc table (the input_hint API boundary): downstream
    * code can use `Dataset[SceneDoc]` combinators while the engine keeps
    * Column expressions underneath for Catalyst. */
  def typed(df: DataFrame): Dataset[SceneDoc] =
    df.select("doc_id", "spans").as[SceneDoc]
}

object Bands {
  /** Per-sensor ordered band lists, copied from `utils/genprepWater.py:185-191`
    * and `utils/genprepMLWater.py:222-230`. Order is significant. */
  val byPlatform: Map[String, Seq[String]] = Map(
    "LANDSAT_4" -> Seq("blue", "green", "red", "nir", "swir1", "swir2", "pixel_qa"),
    "LANDSAT_5" -> Seq("blue", "green", "red", "nir", "swir1", "swir2", "pixel_qa"),
    "LANDSAT_7" -> Seq("blue", "green", "red", "nir", "swir1", "swir2", "pixel_qa"),
    "LANDSAT_8" -> Seq("blue", "green", "red", "nir", "swir1", "swir2", "pixel_qa"),
    "SENTINEL_2" -> Seq("blue", "green", "red", "nir", "swir1", "swir2", "scene_classification"),
    "SENTINEL_1" -> Seq("vv", "vh", "layovershadow_mask"),
    "WOFS_SUMMARY" -> Seq("pc")
  )
}
