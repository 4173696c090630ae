package graft.run

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.table.IcebergLite
import java.nio.file.Files

/** Kill-after-stage resume semantics (SURVEY §5.2 item 5): re-running a
  * pipeline recomputes ONLY uncommitted keys and reproduces identical final
  * output. */
class CheckpointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stageCompute(df: DataFrame): DataFrame =
    df.withColumn("out", $"k" * 2)

  test("resume recomputes only uncommitted keys; output identical to one-shot run") {
    val base = Files.createTempDirectory("graft_ckpt").toString
    val input = (0L until 100L).map(k => Tuple1(k)).toDF("k")

    // full run in one shot (reference result)
    val oneShotBase = Files.createTempDirectory("graft_ckpt_ref").toString
    Checkpoint.runStage(spark, oneShotBase, "s1", input, "k", "c0")(stageCompute)
    val expected = IcebergLite.read(spark, Checkpoint.outputTable(oneShotBase, "s1"))
      .select($"k", $"out").as[(Long, Long)].collect().toSet

    // crashed run: only half the input was "reached" before the crash
    Checkpoint.runStage(spark, base, "s1", input.where($"k" < 50), "k", "c1")(stageCompute)
    assert(IcebergLite.read(spark, Checkpoint.outputTable(base, "s1")).count() == 50)

    // resume with the FULL input: processed count must be exactly the gap
    val acc = spark.sparkContext.longAccumulator("recomputed")
    val (_, n2) = Checkpoint.runStage(spark, base, "s1", input, "k", "c2") { df =>
      df.map { r => acc.add(1); r.getLong(0) }.toDF("k").withColumn("out", $"k" * 2)
    }
    assert(n2 == 50, s"resume must process exactly the 50 uncommitted keys, got $n2")
    assert(acc.value == 50, s"recompute touched ${acc.value} rows")

    val got = IcebergLite.read(spark, Checkpoint.outputTable(base, "s1"))
      .select($"k", $"out").as[(Long, Long)].collect().toSet
    assert(got == expected)

    // third run: nothing to do
    val (_, n3) = Checkpoint.runStage(spark, base, "s1", input, "k", "c3")(stageCompute)
    assert(n3 == 0)

    // lineage log: per-partition ranges + checksums present, status committed
    val log = Checkpoint.log(spark, base, "s1")
    val rows = log.select($"stage", $"status", $"rows_out").as[(String, String, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (s, st, _) => s == "s1" && st == "committed" })
    assert(log.agg(sum($"rows_out")).as[Long].head() == 100)
  }

  test("re-running a fully committed commitId never rewrites referenced data") {
    val base = Files.createTempDirectory("graft_ckpt_retry").toString
    val input = (0L until 30L).map(k => Tuple1(k)).toDF("k")
    Checkpoint.runStage(spark, base, "s", input, "k", "cA")(stageCompute)
    val before = IcebergLite.read(spark, Checkpoint.outputTable(base, "s"))
      .select($"k", $"out").as[(Long, Long)].collect().toSet
    assert(before.size == 30)
    // a crash-retry re-issues the SAME deterministic commitId with the same
    // input: the anti-join leaves zero todo, and the already-referenced
    // data/cA dir must be left byte-identical (not overwritten by an empty
    // write while the snapshot still points at it)
    val (_, n) = Checkpoint.runStage(spark, base, "s", input, "k", "cA")(stageCompute)
    assert(n == 0)
    val after = IcebergLite.read(spark, Checkpoint.outputTable(base, "s"))
      .select($"k", $"out").as[(Long, Long)].collect().toSet
    assert(after == before)

    // and AFTER compaction (current snapshot no longer references data/cA,
    // but the pre-compaction snapshot still does for time travel): a cA
    // retry must STILL refuse, or readAt(historical) loses its files
    val preCompact = IcebergLite.currentSnapshotId(Checkpoint.outputTable(base, "s")).get
    IcebergLite.compact(spark, Checkpoint.outputTable(base, "s"), Seq("k"), "compactX")
    val (_, n2) = Checkpoint.runStage(spark, base, "s", input, "k", "cA")(stageCompute)
    assert(n2 == 0)
    assert(IcebergLite.readAt(spark, Checkpoint.outputTable(base, "s"), preCompact)
      .select($"k", $"out").as[(Long, Long)].collect().toSet == before)
  }

  test("crash between output commit and log append: retry backfills the missing lineage entry") {
    val base = Files.createTempDirectory("graft_ckpt_gap").toString
    val input = (0L until 25L).map(k => Tuple1(k)).toDF("k")
    // simulate the torn state: output fully committed under cG, but the
    // process died before the commitlog append ran
    IcebergLite.append(spark, stageCompute(input), Checkpoint.outputTable(base, "sg"),
      Seq("k"), "cG")
    assert(IcebergLite.currentSnapshotId(Checkpoint.logTable(base, "sg")).isEmpty)

    // the retry must refuse to rewrite the data AND reconcile the log
    val (_, n) = Checkpoint.runStage(spark, base, "sg", input, "k", "cG")(stageCompute)
    assert(n == 0)
    val log = Checkpoint.log(spark, base, "sg")
    val entries = log.select($"commit_id", $"status", $"rows_out", $"rows_in")
      .as[(String, String, Long, Long)].collect()
    assert(entries.nonEmpty && entries.forall { case (c, st, _, ri) =>
      c == "cG" && st == "backfilled" && ri == -1L })
    assert(log.agg(sum($"rows_out")).as[Long].head() == 25)
    // checksum must match a clean run of the same stage (backfill derives it
    // from the committed files, so content divergence is still detectable)
    val cleanBase = Files.createTempDirectory("graft_ckpt_gap_ref").toString
    Checkpoint.runStage(spark, cleanBase, "sg", input, "k", "cG")(stageCompute)
    val xGap = log.agg(expr("bit_xor(checksum)")).as[Long].head()
    val xClean = Checkpoint.log(spark, cleanBase, "sg")
      .agg(expr("bit_xor(checksum)")).as[Long].head()
    assert(xGap == xClean)

    // idempotent: a second retry must not duplicate the backfilled entry
    Checkpoint.runStage(spark, base, "sg", input, "k", "cG")(stageCompute)
    assert(Checkpoint.log(spark, base, "sg").agg(sum($"rows_out")).as[Long].head() == 25)
  }

  test("checksum in lineage log detects key-set drift across equivalent runs") {
    val base = Files.createTempDirectory("graft_ckpt2").toString
    val input = (0L until 40L).map(k => Tuple1(k)).toDF("k").repartition(1)
    Checkpoint.runStage(spark, base, "s", input, "k", "c1")(stageCompute)
    val x1 = Checkpoint.log(spark, base, "s").agg(expr("bit_xor(checksum)")).as[Long].head()
    val base2 = Files.createTempDirectory("graft_ckpt3").toString
    Checkpoint.runStage(spark, base2, "s", input.repartition(8), "k", "c1")(stageCompute)
    val x2 = Checkpoint.log(spark, base2, "s").agg(expr("bit_xor(checksum)")).as[Long].head()
    assert(x1 == x2) // xor-of-xors is partition-layout independent
  }
}
