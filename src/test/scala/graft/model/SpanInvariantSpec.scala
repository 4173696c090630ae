package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.ops.TileAssign

/**
 * The BASELINE.json per-row invariant: every doc surviving a pipeline stage
 * carries its span sequence (kind, text, media_ref, order) unchanged —
 * the engine transports interleaved documents losslessly while
 * joining/assigning (SURVEY §5.2 item 3).
 */
class SpanInvariantSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Generic invariant assertion: spans of `out` == spans of `in` per doc_id. */
  def assertSpanInvariant(in: DataFrame, out: DataFrame): Unit = {
    val inSpans = in.select($"doc_id", $"spans").as[SceneDoc].collect()
      .map(d => d.doc_id -> d.spans).toMap
    val outDocs = out.select($"doc_id", $"spans").dropDuplicates("doc_id").as[SceneDoc].collect()
    assert(outDocs.nonEmpty)
    outDocs.foreach { d =>
      assert(inSpans(d.doc_id) == d.spans,
        s"span sequence mutated for ${d.doc_id}:\n in=${inSpans(d.doc_id)}\nout=${d.spans}")
    }
  }

  test("docs generator produces well-formed interleaved spans") {
    val docs = SynthCorpus.docs(spark, 300, seed = 42L)
    val rows = docs.as[SceneDoc].collect() // typed Dataset API boundary
    assert(rows.length == 300)
    rows.foreach { d =>
      val offs = d.spans.map(_.offset)
      assert(offs == offs.sorted, s"${d.doc_id} spans out of order")
      assert(offs.distinct.size == offs.size)
      assert(d.spans.take(2).forall(_.kind == "meta"))
      val bands = d.spans.filter(_.kind == "band")
      assert(bands.nonEmpty && bands.forall(s => s.media_ref.nonEmpty))
      // band order matches the per-platform list (utils/genprepWater.py:185-191)
      val platform = d.spans.head.text.stripPrefix("platform=")
      assert(bands.map(_.text) == Bands.byPlatform(platform))
    }
  }

  test("span sequence survives the spatial-join tile assignment unchanged") {
    val docs = SynthCorpus.docs(spark, 500, seed = 7L)
    val tiles = SynthCorpus.tileGrid(spark).drop("path", "row")
    val assigned = TileAssign.assign(docs.select($"doc_id", $"wkt", $"spans"), tiles, res = 5)
    assertSpanInvariant(docs, assigned)
  }

  test("span sequence survives filter + repartition + sort") {
    val docs = SynthCorpus.docs(spark, 400, seed = 8L)
    val out = docs.where($"platform" =!= "LANDSAT_5").repartition(7)
      .sortWithinPartitions($"doc_id")
    assertSpanInvariant(docs, out)
  }
}
