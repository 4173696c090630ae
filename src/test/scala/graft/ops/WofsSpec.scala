package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** WOfS expression tree vs the scalar transcription; all 21 leaves exercised
  * (FIXTURES.md F4: "seeded so the tree exercises every leaf"). */
class WofsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randBands(n: Int, seed: Long): Seq[(Int, Int, Int, Int, Int, Int)] = {
    val rnd = new scala.util.Random(seed)
    // mixed magnitudes so ratio thresholds (±0.01..0.61) and band thresholds
    // (129.5..2083.5) all flip
    def v() = rnd.nextInt(6) match {
      case 0 => 1 + rnd.nextInt(128)
      case 1 => 1 + rnd.nextInt(400)
      case 2 => 1 + rnd.nextInt(3000)
      case _ => 1 + rnd.nextInt(2999)
    }
    (0 until n).map(_ => (v(), v(), v(), v(), v(), v()))
  }

  test("engine Column tree == scalar transcription on 20k random band rows") {
    val rows = randBands(20000, 1234L)
    val df = rows.toDF("blue", "green", "red", "nir", "swir1", "swir2")
    val got = df.withColumn("wofs", Wofs.classifyColumn)
      .select($"blue", $"green", $"red", $"nir", $"swir1", $"swir2", $"wofs")
      .as[(Int, Int, Int, Int, Int, Int, Int)].collect()
    got.foreach { case (b, g, r, n, s1, s2, w) =>
      assert(w == Wofs.classifyScalar(b, g, r, n, s1, s2), s"bands=($b,$g,$r,$n,$s1,$s2)")
    }
  }

  test("all 23 leaves of the tree are reachable and reached") {
    assert(Wofs.leaves().size == 23)
    // leaf identity = path of split decisions
    def path(blue: Int, green: Int, red: Int, nir: Int, swir1: Int, swir2: Int): String = {
      def feat(f: String): Double = f match {
        case "ndi_52" => (swir1 - green).toDouble / (swir1 + green)
        case "ndi_43" => (nir - red).toDouble / (nir + red)
        case "ndi_72" => (swir2 - green).toDouble / (swir2 + green)
        case "blue" => blue.toDouble
        case "green" => green.toDouble
        case "red" => red.toDouble
        case "nir" => nir.toDouble
        case "swir1" => swir1.toDouble
        case "swir2" => swir2.toDouble
      }
      def go(n: Wofs.Node, acc: String): String = n match {
        case Wofs.Leaf(_) => acc
        case Wofs.Split(f, thr, le, gt) =>
          if (feat(f) <= thr) go(le, acc + "L") else go(gt, acc + "R")
      }
      go(Wofs.tree, "")
    }
    // crafted probe rows, one per leaf path (found by seeded search)
    val probes = Seq(
      (1635, 1636, 1697, 2189, 47, 96), (2025, 121, 66, 2478, 85, 8),
      (392, 2762, 1023, 1214, 329, 1725), (333, 2589, 37, 2529, 98, 557),
      (578, 2528, 103, 2737, 629, 869), (286, 1201, 1314, 2185, 132, 1192),
      (481, 762, 297, 1179, 13, 887), (1560, 307, 118, 69, 65, 1570),
      (1708, 2296, 2565, 2588, 1178, 379), (2439, 258, 721, 29, 44, 2802),
      (131, 2360, 2197, 342, 2772, 728), (10, 17, 140, 61, 23, 9),
      (225, 107, 97, 125, 140, 2691), (45, 1818, 440, 250, 2459, 2656),
      (311, 65, 631, 71, 103, 928), (273, 1591, 72, 919, 1569, 2697),
      (2803, 2207, 126, 216, 2512, 888), (37, 714, 210, 107, 1308, 959),
      (167, 785, 250, 122, 1415, 2438), (21, 1630, 2874, 60, 2966, 18),
      (43, 369, 42, 349, 615, 258), (507, 1752, 11, 672, 2800, 1371),
      (1661, 29, 867, 1056, 1656, 182))
    val seen = probes.map { case (b, g, r, n, s1, s2) => path(b, g, r, n, s1, s2) }.toSet
    assert(seen.size == 23, s"only ${seen.size} leaves reached")
    // and the engine agrees with the scalar oracle on every probe
    val df = probes.toDF("blue", "green", "red", "nir", "swir1", "swir2")
    val engine = df.withColumn("w", Wofs.classifyColumn)
      .select($"blue", $"green", $"red", $"nir", $"swir1", $"swir2", $"w")
      .as[(Int, Int, Int, Int, Int, Int, Int)].collect()
    engine.foreach { case (b, g, r, n, s1, s2, w) =>
      assert(w == Wofs.classifyScalar(b, g, r, n, s1, s2))
    }
  }

  test("clean-mask gating yields -9999 exactly on masked rows") {
    val df = Seq(
      (100, 200, 300, 400, 500, 600, 66),   // clear → classified
      (100, 200, 300, 400, 500, 600, 224)   // cloud → nodata
    ).toDF("blue", "green", "red", "nir", "swir1", "swir2", "pixel_qa")
    val out = df.select(Wofs.classify(CleanMask.landsatColumn("LANDSAT_7", $"pixel_qa")).as("w"))
      .as[Int].collect().toSeq
    assert(out(1) == -9999 && out(0) != -9999)
  }

  test("wofs output domain is {-9999, 0, 1}") {
    val rows = randBands(5000, 77L)
    val df = rows.toDF("blue", "green", "red", "nir", "swir1", "swir2")
      .withColumn("pixel_qa", lit(66))
    val vals = df.select(Wofs.classify(lit(true)).as("w")).distinct().as[Int].collect().toSet
    assert(vals.subsetOf(Set(-9999, 0, 1)))
  }
}
