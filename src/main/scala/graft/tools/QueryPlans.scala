package graft.tools

import java.nio.file.{Files, Paths}

/**
 * Per-query plan dump for the optimization round: writes
 * `plans/<tag>/<query>_<suffix>.txt` with the `explain("formatted")` output
 * of each named `SparkEntry.queries` entry (executed first so AQE finalizes
 * and codegen ids are assigned — the same plan the bench runs).
 *
 * Usage: sbt "runMain graft.tools.QueryPlans <suffix> <query> [query ...]"
 * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 *      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PLAN_TAG (default r07).
 */
object QueryPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryPlans <suffix> <query> [query ...]")
    val suffix = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r07")
    val spark = graft.GraftSession.local(cpus)
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(s"plan:$name")
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      System.err.println(s"[plans] wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
