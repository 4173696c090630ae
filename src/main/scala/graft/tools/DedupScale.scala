package graft.tools

import org.apache.spark.sql.functions._

/**
 * Scale probe for the dedup pipeline: synthesizes an n-doc near-duplicate
 * corpus distributively (no driver materialization), runs MinHash-LSH
 * near-dup detection and connected-components canonicalization end to end,
 * and prints wall + throughput. Evidence that the text-free candidate
 * exchange and the ids-only clustering hold far beyond the driver tables:
 * `sbt "runMain graft.tools.DedupScale [nDocs]"`.
 */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // ~40-word documents from a 5000-word hashed vocabulary, seeded by id
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(40)),
        j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(5000))))).as("text"))
    // every third doc gets a lightly mutated twin (the near-dup planted set)
    val twins = base.where(col("doc_id") % 3 === 0)
      .select((col("doc_id") + n).as("doc_id"),
        concat(lit("zzz "), substring(col("text"), 5, 1000000)).as("text"))
    val corpus = base.unionByName(twins).cache()
    val rows = corpus.count() // materialize before timing

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (pairs, wPairs) = timed {
      graft.dedup.Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.5)
        .select("id_a", "id_b").localCheckpoint(true)
    }
    val nPairs = pairs.count()
    val (comps, wComps) = timed {
      graft.dedup.Dedup.connectedComponents(pairs).count()
    }
    println(f"""{"probe":"dedup_scale","docs":$rows,"near_dup_pairs":$nPairs,""" +
      f""""minhash_wall_s":$wPairs%.2f,"docs_per_sec":${rows / wPairs}%.1f,""" +
      f""""cluster_wall_s":$wComps%.2f,"components_rows":$comps}""")
    spark.stop()
  }
}
