package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** As-of join ≡ brute-force latest-prior scan, including the edge rules:
  * inclusive equal-ts match, no-prior-build → null, per-key isolation. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("as-of ≡ brute force on seeded event streams") {
    val rnd = new scala.util.Random(31L)
    val probes = (0 until 300).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val builds = (0 until 200).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, 1000L + i))
    val got = AsOf.join(
      probes.toDF("k", "t", "pid"), builds.toDF("k", "t", "bid"),
      key = "k", ts = "t", probeCols = Seq("pid"), buildCols = Seq("bid"))
      .select($"pid", $"asof_bid").as[(Long, Option[Long])].collect().toMap

    probes.foreach { case (k, t, pid) =>
      val expected = builds.filter(b => b._1 == k && b._2 <= t) // inclusive
        .sortBy(b => (b._2, b._3)).lastOption.map(_._3)
      assert(got(pid) == expected, s"probe $pid (k=$k, t=$t)")
    }
    // sanity: both null and non-null outcomes actually occur
    assert(got.values.exists(_.isEmpty) && got.values.exists(_.nonEmpty))
  }

  test("null build attributes come from the matched row — no cross-row mixing") {
    // latest build (t=9) has bid=8 but a NULL v; an older build (t=5) has a
    // non-null v. ASOF semantics: the probe takes BOTH attributes from the
    // t=9 row — asof_v must be null, never the resurrected older 42.
    val probes = Seq((1L, 10L, 100L)).toDF("k", "t", "pid")
    val builds = Seq((1L, 5L, 7L, Some(42L)), (1L, 9L, 8L, None: Option[Long]))
      .toDF("k", "t", "bid", "v")
    val r = AsOf.join(probes, builds, "k", "t", Seq("pid"), Seq("bid", "v"))
      .select($"asof_bid", $"asof_v").as[(Option[Long], Option[Long])].collect()
    assert(r.toSeq == Seq((Some(8L), None)))
    // and a probe before any build still gets all-null attributes
    val early = Seq((1L, 1L, 200L)).toDF("k", "t", "pid")
    val r2 = AsOf.join(early, builds, "k", "t", Seq("pid"), Seq("bid", "v"))
      .select($"asof_bid", $"asof_v").as[(Option[Long], Option[Long])].collect()
    assert(r2.toSeq == Seq((None, None)))
  }

  test("equal-timestamp build matches; later build does not") {
    val probes = Seq((1L, 10L, 100L)).toDF("k", "t", "pid")
    val builds = Seq((1L, 10L, 7L), (1L, 11L, 8L)).toDF("k", "t", "bid")
    val r = AsOf.join(probes, builds, "k", "t", Seq("pid"), Seq("bid"))
      .select($"asof_bid").as[Long].collect()
    assert(r.toSeq == Seq(7L))
  }
}
