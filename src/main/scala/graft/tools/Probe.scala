package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing probe: runs one named SparkEntry query repeatedly. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.sql.optimizer.excludedRules", graft.GraftSession.ExcludedRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name run$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (args.length > 3 && args(3) == "explain")
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
