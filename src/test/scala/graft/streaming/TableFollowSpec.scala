package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.table.IcebergLite
import java.nio.file.Files

/** drainTableIncrement + appendIdempotent = the exactly-once table-follow
  * contract: each source commit is delivered to the consumer exactly once,
  * across catch-up ticks, idle ticks, and a crash between the consumer's
  * table commit and its checkpoint advance. */
class TableFollowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_follow")

  test("follow delivers each commit once; idle drain is a no-op; multi-commit gap is one increment") {
    val root = tmp()
    val src = root.resolve("src").toString
    val tgt = root.resolve("tgt").toString
    val cp = root.resolve("c.cp").toString
    def drain() = Streams.drainTableIncrement(spark, src, cp) { (df, from, to) =>
      IcebergLite.appendIdempotent(spark, df, tgt, Seq("k"), s"inc_${from}_$to")
    }
    // nothing to follow yet
    assert(drain().isEmpty)
    IcebergLite.append(spark, (0L until 30L).map(i => (i, s"a$i")).toDF("k", "v"), src, Seq("k"), "c1")
    assert(drain().contains((-1L, 0L)))
    assert(IcebergLite.read(spark, tgt).count() == 30)
    // caught up: no increment, no target commit
    assert(drain().isEmpty)
    assert(IcebergLite.snapshots(tgt).size == 1)
    // two source commits while the consumer slept -> ONE increment
    IcebergLite.append(spark, (100L until 120L).map(i => (i, s"b$i")).toDF("k", "v"), src, Seq("k"), "c2")
    IcebergLite.append(spark, (200L until 210L).map(i => (i, s"c$i")).toDF("k", "v"), src, Seq("k"), "c3")
    assert(drain().contains((0L, 2L)))
    assert(IcebergLite.read(spark, tgt).count() == 60)
    assert(IcebergLite.read(spark, tgt).agg(sum($"k")).as[Long].head()
      == (0L until 30L).sum + (100L until 120L).sum + (200L until 210L).sum)
  }

  test("crash between consumer commit and checkpoint advance replays exactly-once") {
    val root = tmp()
    val src = root.resolve("src").toString
    val tgt = root.resolve("tgt").toString
    val cp = root.resolve("c.cp")
    IcebergLite.append(spark, (0L until 25L).map(i => (i, s"a$i")).toDF("k", "v"), src, Seq("k"), "c1")
    // first attempt: the consumer commits, then "crashes" before the
    // checkpoint write (simulated by throwing after the commit)
    intercept[RuntimeException] {
      Streams.drainTableIncrement(spark, src, cp.toString) { (df, from, to) =>
        IcebergLite.appendIdempotent(spark, df, tgt, Seq("k"), s"inc_${from}_$to")
        throw new RuntimeException("crash before checkpoint")
      }
    }
    assert(!Files.exists(cp), "checkpoint must not advance past a failed process")
    assert(IcebergLite.read(spark, tgt).count() == 25, "the commit itself landed")
    // resume: the SAME increment replays; the keyed commit is a no-op
    val r = Streams.drainTableIncrement(spark, src, cp.toString) { (df, from, to) =>
      IcebergLite.appendIdempotent(spark, df, tgt, Seq("k"), s"inc_${from}_$to")
    }
    assert(r.contains((-1L, 0L)))
    assert(IcebergLite.read(spark, tgt).count() == 25, "replayed increment must not duplicate")
    assert(IcebergLite.snapshots(tgt).size == 1, "no second target snapshot")
    // and the follow continues normally afterwards
    IcebergLite.append(spark, (50L until 60L).map(i => (i, s"b$i")).toDF("k", "v"), src, Seq("k"), "c2")
    Streams.drainTableIncrement(spark, src, cp.toString) { (df, from, to) =>
      IcebergLite.appendIdempotent(spark, df, tgt, Seq("k"), s"inc_${from}_$to")
    }
    assert(IcebergLite.read(spark, tgt).count() == 35)
  }

  test("two consumers follow the same source at independent paces") {
    val root = tmp()
    val src = root.resolve("src").toString
    val (t1, t2) = (root.resolve("t1").toString, root.resolve("t2").toString)
    val (c1, c2) = (root.resolve("c1.cp").toString, root.resolve("c2.cp").toString)
    def drain(tgt: String, cp: String) = Streams.drainTableIncrement(spark, src, cp) {
      (df, from, to) => IcebergLite.appendIdempotent(spark, df, tgt, Seq("k"), s"inc_${from}_$to")
    }
    IcebergLite.append(spark, (0L until 10L).map(i => (i, "a")).toDF("k", "v"), src, Seq("k"), "c1")
    drain(t1, c1) // consumer 1 keeps up
    IcebergLite.append(spark, (10L until 30L).map(i => (i, "b")).toDF("k", "v"), src, Seq("k"), "c2")
    drain(t1, c1)
    drain(t2, c2) // consumer 2 catches up in one increment
    assert(IcebergLite.read(spark, t1).count() == 30)
    assert(IcebergLite.read(spark, t2).count() == 30)
    assert(IcebergLite.snapshots(t1).size == 2 && IcebergLite.snapshots(t2).size == 1)
  }
}
