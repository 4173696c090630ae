package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe of the flagship count job under optimizer-fence variants.
  * Uses the exact Bench session confs so walls are comparable. */
object ProbeFlagship {
  def main(args: Array[String]): Unit = {
    val corpus = if (args.nonEmpty) args(0) else "/tmp/graft_bench_corpus_v2_10000000"
    val excluded = sys.env.getOrElse("GRAFT_EXCLUDE",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.optimizer.excludedRules", excluded)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val geomCol = if (args.length > 1) args(1) else "wkt"
    val tiles = graft.model.SynthCorpus.tileGrid(spark).drop("path", "row")
    def job = graft.ops.TileAssign.assign(
      spark.read.parquet(corpus), tiles, geomCol = geomCol).groupBy().count()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n = job.collect()(0).getLong(0)
      println(f"[flag] run$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val plan = job.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println(plan.linesIterator.filter(l =>
      l.contains("ReadSchema") || l.contains("Condition") || l.contains("Filter ("))
      .mkString("[flag-scan] ", "\n[flag-scan] ", ""))
    spark.stop()
  }
}
