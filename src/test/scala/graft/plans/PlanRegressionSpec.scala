package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Locks in the scale-critical plan properties so optimizer/operator changes
 * that silently regress them fail CI:
 *
 *  1. the flagship count's parquet scan reads ONLY the geometry column
 *     (column pruning through the cover-UDF projection);
 *  2. no inferred filter re-evaluates the cover UDF below the Generate
 *     (the InferFiltersFromGenerate/Constraints exclusion, see GraftSession);
 *  3. the broadcast cover join has zero shuffle exchanges over the probe;
 *  4. the shuffled path really shuffles (no silent AQE broadcast demotion).
 */
class PlanRegressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus = {
    val dir = java.nio.file.Files.createTempDirectory("graft_planreg").toString
    graft.model.SynthCorpus.docs(spark, 300, seed = 3L).write.mode("overwrite").parquet(dir)
    dir
  }
  private lazy val tiles = graft.model.SynthCorpus.tileGrid(spark).drop("path", "row")

  private def countPlan(geomCol: String, shuffled: Boolean = false): String = {
    val docs = spark.read.parquet(corpus)
    val job = graft.ops.TileAssign.assign(docs, tiles, geomCol = geomCol, shuffled = shuffled)
      .groupBy().count()
    job.collect()
    job.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("flagship count scan is pruned to the geometry column only") {
    val plan = countPlan("wkb")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { rs =>
      assert(rs.contains("wkb") && !rs.contains("spans") && !rs.contains("doc_id"),
        s"scan not pruned: $rs")
    }
  }

  test("no optimizer-inferred filter duplicates the cover UDF") {
    val plan = countPlan("wkt")
    val filterConds = plan.linesIterator.filter(_.startsWith("Condition")).toSeq
    filterConds.foreach { c =>
      assert(!c.contains("UDF"), s"inferred filter re-evaluates a UDF: $c")
    }
  }

  test("WKB hot path runs the native kernel expressions, not udf wrappers") {
    val plan = countPlan("wkb")
    assert(plan.contains("st_cell_cover_wkb"),
      "probe cover is not the native st_cell_cover_wkb expression")
    assert(plan.contains("st_intersects_wkb"),
      "refine is not the native st_intersects_wkb expression")
  }

  test("broadcast path: no shuffle over the probe side; shuffled path: real exchange") {
    // AQE formatted output repeats nodes in the "Initial Plan" section —
    // audit only the final executed tree
    def nodes(plan0: String, name: String) = {
      val plan = plan0.split("== Initial Plan ==")(0)
      // tree form "Name (N)"; (?<![A-Za-z]) keeps "Exchange" from matching
      // inside "BroadcastExchange"
      s"""(?<![A-Za-z])$name \\(\\d+\\)""".r.findAllIn(plan).size
    }
    // AQE prints materialized stages as *QueryStage nodes in the final tree
    def broadcasts(p: String) = nodes(p, "BroadcastExchange") + nodes(p, "BroadcastQueryStage")
    def shuffles(p: String) =
      nodes(p, "Exchange") + nodes(p, "ShuffleQueryStage") + nodes(p, "AQEShuffleRead")
    val b = countPlan("wkb")
    assert(broadcasts(b) >= 1, s"no broadcast in:\n$b")
    // only the final single-partition count aggregation may exchange
    assert(nodes(b, "Exchange") <= 1, s"unexpected shuffles:\n$b")
    val s = countPlan("wkb", shuffled = true)
    assert(shuffles(s) >= 3, s"shuffled path was demoted to broadcast:\n$s")
    assert(broadcasts(s) == 0)
  }
}
