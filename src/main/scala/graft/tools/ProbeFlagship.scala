package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe of the flagship count job under optimizer-fence variants.
  * Uses the exact Bench session confs so walls are comparable. */
object ProbeFlagship {
  def main(args: Array[String]): Unit = {
    val corpus = if (args.nonEmpty) args(0) else "/tmp/graft_bench_corpus_v2_10000000"
    val excluded = sys.env.getOrElse("GRAFT_EXCLUDE",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    val master = sys.env.getOrElse("PROBE_MASTER", "local[16]")
    val cores = master.replaceAll("[^0-9]", "") match { case "" => "16"; case n => n }
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.optimizer.excludedRules", excluded)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val geomCol = if (args.length > 1) args(1) else "wkt"
    // corpus path convention: ..._<nDocs>; generate once if missing
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpus, "_SUCCESS"))) {
      val n = corpus.split('_').last.toLong
      println(s"[flag] generating $n-doc corpus at $corpus")
      // narrow generation — NO repartition: a 100M-row single-JVM exchange
      // spills itself to death; the read side re-splits the big files via
      // maxPartitionBytes anyway
      graft.model.SynthCorpus.docs(spark, n)
        .write.mode("overwrite").parquet(corpus)
    }
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
