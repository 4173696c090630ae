package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import java.nio.file.Files

class IcebergLiteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_iceberg").resolve("t").toString

  test("append/read roundtrip with snapshot lineage") {
    val t = tmpTable()
    val df1 = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(4)
    IcebergLite.append(spark, df1, t, Seq("k"), "c1")
    assert(IcebergLite.read(spark, t).count() == 100)
    val df2 = (100 until 150).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val snap2 = IcebergLite.append(spark, df2, t, Seq("k"), "c2")
    assert(snap2.id == 1 && snap2.parent == 0)
    assert(IcebergLite.read(spark, t).count() == 150)
    assert(IcebergLite.read(spark, t).select(sum($"k")).as[Long].head() == (0 until 150).sum)
  }

  test("time travel: readAt sees the table exactly as of each snapshot") {
    val t = tmpTable()
    IcebergLite.append(spark, (0 until 40).map(i => (i.toLong, s"v$i")).toDF("k", "v"), t, Seq("k"), "c1")
    IcebergLite.append(spark, (40 until 90).map(i => (i.toLong, s"v$i")).toDF("k", "v"), t, Seq("k"), "c2")
    IcebergLite.append(spark, (90 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"), t, Seq("k"), "c3")
    assert(IcebergLite.snapshots(t) == Seq(0L, 1L, 2L))
    assert(IcebergLite.readAt(spark, t, 0).count() == 40)
    assert(IcebergLite.readAt(spark, t, 1).count() == 90)
    assert(IcebergLite.readAt(spark, t, 2).count() == 100)
    assert(IcebergLite.read(spark, t).count() == 100)
    intercept[IllegalArgumentException](IcebergLite.readAt(spark, t, 7))
  }

  test("manifest min/max pruning skips files that provably miss the range") {
    val t = tmpTable()
    // 4 files with disjoint key ranges (repartitionByRange keeps them sorted)
    val df = (0 until 400).map(i => (i.toLong, i.toString)).toDF("k", "v")
      .repartitionByRange(4, $"k")
    IcebergLite.append(spark, df, t, Seq("k"), "c1")
    val all = IcebergLite.selectedFiles(t, Map.empty)
    assert(all.size == 4)
    val some = IcebergLite.selectedFiles(t, Map("k" -> (0.0, 50.0)))
    assert(some.size < all.size, s"pruning selected ${some.size}/${all.size}")
    // pruned read is still correct
    val rows = IcebergLite.read(spark, t, Map("k" -> (0.0, 50.0)))
      .where($"k" <= 50).count()
    assert(rows == 51)
  }

  test("compact: live snapshot references only rewritten files; history time-travels") {
    val t = tmpTable()
    (0 until 6).foreach { c =>
      IcebergLite.append(spark,
        (c * 10 until (c + 1) * 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
          .repartition(3), t, Seq("k"), s"c$c")
    }
    val before = IcebergLite.readSnapshot(t).get
    assert(before.files.size == 18, s"expected 6 commits x 3 files, got ${before.files.size}")

    val compacted = IcebergLite.compact(spark, t, Seq("k"), "compact1")
    assert(compacted.files.size < before.files.size,
      s"compaction must shrink the file list: ${compacted.files.size}")
    assert(compacted.files.forall(_.path.contains("compact1")),
      "live snapshot must reference only the rewritten files")
    // content identical
    assert(IcebergLite.read(spark, t).select(sum($"k")).as[Long].head() == (0 until 60).sum)
    assert(IcebergLite.read(spark, t).count() == 60)
    // pre-compaction snapshots still readable (old files untouched)
    assert(IcebergLite.readAt(spark, t, before.id).count() == 60)
    assert(IcebergLite.readAt(spark, t, 0).count() == 10)
    // min/max stats recomputed for the compacted files: pruning still works
    val pruned = IcebergLite.selectedFiles(t, Map("k" -> (0.0, 1.0)))
    assert(pruned.size <= compacted.files.size)
  }

  test("addColumn: metadata-only evolution, null backfill, time travel across schemas") {
    val t = tmpTable()
    IcebergLite.append(spark, (0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      t, Seq("k"), "c1")
    val preEvo = IcebergLite.currentSnapshotId(t).get
    val filesBefore = IcebergLite.readSnapshot(t).get.files

    val evolved = IcebergLite.addColumn(t, "score", "double")
    // metadata-only: identical file list, no rewrite
    assert(evolved.files == filesBefore)
    // old rows read back with the new column null-backfilled
    val backfilled = IcebergLite.read(spark, t)
    assert(backfilled.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(backfilled.where($"score".isNull).count() == 20)

    // new writes carry the column; mixed-era reads see both
    IcebergLite.append(spark,
      (20 until 30).map(i => (i.toLong, s"v$i", i * 0.5)).toDF("k", "v", "score"),
      t, Seq("k"), "c2")
    val all = IcebergLite.read(spark, t)
    assert(all.count() == 30)
    assert(all.where($"score".isNotNull).count() == 10)
    assert(all.where($"k" === 25).select($"score").as[Double].head() == 12.5)

    // time travel to the pre-evolution snapshot: old schema, no column
    val old = IcebergLite.readAt(spark, t, preEvo)
    assert(old.schema.fieldNames.toSeq == Seq("k", "v") && old.count() == 20)

    intercept[IllegalArgumentException](IcebergLite.addColumn(t, "score", "double"))
  }

  test("uncommitted data (no pointer swap) is invisible — crash atomicity") {
    val t = tmpTable()
    IcebergLite.append(spark, Seq((1L, "a")).toDF("k", "v"), t, Seq("k"), "c1")
    // simulate a crash: data written but snapshot never pointed to
    Seq((99L, "zz")).toDF("k", "v").write.parquet(s"$t/data/crashed")
    assert(IcebergLite.read(spark, t).count() == 1)
  }

  test("snapshot JSON roundtrip") {
    val s = IcebergLite.Snapshot(3, 2, """{"type":"struct"}""",
      Seq(IcebergLite.FileEntry("/a/b \"q\".parquet", 10,
        Map("k" -> "-5"), Map("k" -> "42"))))
    val js = {
      // render via append path is file-bound; test parse on a hand render
      val m = classOf[IcebergLite.type].getDeclaredMethods
        .find(_.getName == "renderSnapshot").get
      m.setAccessible(true)
      m.invoke(IcebergLite, s).asInstanceOf[String]
    }
    assert(IcebergLite.parseSnapshot(js) == s)
  }
}
