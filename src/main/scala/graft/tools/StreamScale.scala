package graft.tools

import org.apache.spark.sql.functions._

/**
 * Durable-streaming-ingest scale probe: N synthetic events drain through
 * `Streams.appendToTable` (foreachBatch → checkpointed IcebergLite commits,
 * B micro-batches) and the wall is compared to a plain batch parquet write
 * of the same data — the full exactly-once machinery's overhead (per-batch
 * anti-join against committed keys, commit-log append, snapshot swap)
 * measured at millions of rows. A second drain must be a metadata-only
 * no-op. `sbt "runMain graft.tools.StreamScale [nEvents]"`.
 */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    def t[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[streamscale] $label wall=$w%.2f s"); (a, w)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_streamscale")
    val src = root.resolve("src").toString
    // synthetic event table, 16 files → 4 micro-batches at 4 files/trigger
    spark.range(n).select(
        $"id".as("event_id"),
        expr("timestampadd(SECOND, cast(id % 86400 AS int), timestamp'2026-01-01 00:00:00')").as("ts"),
        (concat(lit("t"), ($"id" % 7))).as("event_type"),
        ($"id" % 1000).cast("double").as("value"))
      .repartition(16).write.parquet(src)
    val schema = spark.read.parquet(src).schema

    // batch baseline: same data, plain parquet sink
    val batchOut = root.resolve("batch_out").toString
    val (_, batchWall) = t("batch parquet write")(
      spark.read.parquet(src).write.mode("overwrite").parquet(batchOut))

    val stream = graft.streaming.Streams.parquetStream(spark, src, schema,
      Map("maxFilesPerTrigger" -> "4"))
    Seq(("anti-join dedupe (SAC_DONE parity)", true),
        ("batchId-idempotent (stream-checkpoint trusted)", false)).foreach {
      case (label, dedupe) =>
        val sub = root.resolve(s"mode_$dedupe")
        val base = sub.resolve("tbl").toString
        val ckpt = sub.resolve("ckpt").toString
        val (_, wall) = t(s"durable ingest [$label], 4 micro-batch commits")(
          graft.streaming.Streams.appendToTable(stream, base, "ingest", "event_id",
            ckpt, dedupeKeys = dedupe))
        val count = graft.run.Checkpoint.committed(spark, base, "ingest").count()
        require(count == n, s"exactly-once violated: $count != $n")
        val logRows = graft.run.Checkpoint.log(spark, base, "ingest")
          .agg(sum($"rows_out")).as[Long].head()
        require(logRows == n, s"lineage log accounts $logRows of $n")
        val (_, noopWall) = t("re-drain (no new data, metadata-only)")(
          graft.streaming.Streams.appendToTable(stream, base, "ingest", "event_id",
            ckpt, dedupeKeys = dedupe))
        println(f"[streamscale] dedupe=$dedupe n=$n events=${n / wall}%.1f/s " +
          f"batch=${n / batchWall}%.1f/s overhead=${wall / batchWall}%.2fx noop=$noopWall%.2f s")
    }
    graft.Fs.deleteRecursively(root)
    spark.stop()
  }
}
