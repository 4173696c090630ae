package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.table.IcebergLite

/**
 * Per-partition lineage + metrics checkpointing with anti-join resume —
 * the engine form of the reference's SAC_DONE semantics
 * (`master_Search_Discover_example.ipynb` cells 29/38: rebuild the done-set
 * from S3, recompute only the gap) and the Redis two-queue lease protocol's
 * *effect* (`rediswq.py:24-114`): at-least-once execution made exactly-once
 * by deduplicating re-scan.
 *
 * A stage writes (a) its output rows and (b) a commit-log of
 * (stage, partition_id, key_lo, key_hi, rows_in, rows_out, checksum,
 * wall_ms, status) — FIXTURES.md F5 — in one atomic IcebergLite commit
 * (data first, pointer swap last). Re-running the stage anti-joins the
 * input against committed keys: crashed/partial runs leave no pointer, so
 * their work is invisible and simply redone; committed keys are never
 * recomputed.
 */
object Checkpoint {

  def outputTable(base: String, stage: String): String = s"$base/$stage/output"
  def logTable(base: String, stage: String): String = s"$base/$stage/commitlog"

  /** Committed keys of a stage (empty frame if never committed). */
  def committedKeys(spark: SparkSession, base: String, stage: String, keyCol: String): DataFrame =
    if (IcebergLite.currentSnapshotId(outputTable(base, stage)).isDefined)
      IcebergLite.read(spark, outputTable(base, stage)).select(col(keyCol)).distinct()
    else spark.emptyDataFrame

  /**
   * Run `compute` over only the not-yet-committed slice of `input`
   * (left_anti on `keyCol`), appending output + lineage metrics atomically.
   * Returns (newly computed rows, number of input keys actually processed).
   *
   * `commitId` must be caller-supplied and deterministic per attempt
   * (no wall-clock in the engine — SURVEY §7.4).
   */
  def runStage(spark: SparkSession, base: String, stage: String,
               input: DataFrame, keyCol: String, commitId: String)
              (compute: DataFrame => DataFrame): (DataFrame, Long) = {
    val t0 = System.nanoTime()
    val done = committedKeys(spark, base, stage, keyCol)
    val todo =
      if (done.isEmpty) input
      else input.join(done.withColumnRenamed(keyCol, "__done_key"),
        col(keyCol) === col("__done_key"), "left_anti")
    val todoCount = todo.count()
    if (todoCount == 0) return (spark.emptyDataFrame, 0L)

    val out = compute(todo)
    IcebergLite.append(spark, out, outputTable(base, stage), Seq(keyCol), commitId)
    val wallMs = (System.nanoTime() - t0) / 1000000L

    // lineage + metrics from the files just written (no plan re-execution:
    // `out` must not be computed twice at 100 TB)
    val written = spark.read.parquet(s"${outputTable(base, stage)}/data/$commitId")
    val metrics = written
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("__pid").as("partition_id"))
      .agg(
        min(col(keyCol)).cast("string").as("key_lo"),
        max(col(keyCol)).cast("string").as("key_hi"),
        count(lit(1)).as("rows_out"),
        // order-independent, overflow-free (ANSI-safe) content checksum
        expr(s"bit_xor(xxhash64($keyCol))").as("checksum"))
      .withColumn("stage", lit(stage))
      .withColumn("rows_in", lit(todoCount))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("status", lit("committed"))
      .withColumn("commit_id", lit(commitId))
    IcebergLite.append(spark, metrics, logTable(base, stage), Seq("partition_id"), commitId)
    (out, todoCount)
  }

  /** All committed output rows of a stage. */
  def committed(spark: SparkSession, base: String, stage: String): DataFrame =
    IcebergLite.read(spark, outputTable(base, stage))

  /** The commit log as a DataFrame (ops/monitoring surface). */
  def log(spark: SparkSession, base: String, stage: String): DataFrame =
    IcebergLite.read(spark, logTable(base, stage))
}
