package graft.tools

import org.apache.spark.sql.functions._

/**
 * Scale probe for the stored-IVF ANN path: synthesizes n unit-ish
 * embeddings distributively, builds the posting-list layout once
 * ([[graft.ann.IvfIndex.write]]: sampled quantizer + partitionBy(cell)),
 * then times a 100-probe top-k against the stored index — the partition-
 * pruned read that makes a probe touch nprobe/nlist of the corpus:
 * `sbt "runMain graft.tools.AnnScale [nVecs]"`.
 */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val dim = 64
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // deterministic pseudo-gaussian-ish embeddings: per-element hash in [-1, 1)
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        j => (pmod(xxhash64(col("id"), j), lit(2000000)).cast("double") / 1000000.0 - 1.0)
          .cast("float")).as("embedding"))
      .localCheckpoint(true) // materialize; probe timings measure the index, not gen
    val rows = corpus.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val path = java.nio.file.Files.createTempDirectory("graft_ann_scale").toString
    val (_, wBuild) = timed {
      graft.ann.IvfIndex.write(corpus, path, nlist = 64, seed = 42L, maxTrain = 100000)
    }
    val probes = corpus.where(col("vec_id") < 100)
    val (got, wProbe) = timed {
      graft.ann.IvfIndex.probe(spark, path, probes, k = 10, nprobe = 8).count()
    }
    println(f"""{"probe":"ann_scale","vecs":$rows,"dim":$dim,"nlist":64,"nprobe":8,""" +
      f""""build_wall_s":$wBuild%.2f,"vecs_per_sec_build":${rows / wBuild}%.1f,""" +
      f""""probe100_topk_wall_s":$wProbe%.2f,"result_rows":$got}""")
    spark.stop()
  }
}
