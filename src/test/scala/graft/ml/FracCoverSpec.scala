package graft.ml

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FracCoverSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pure endmember pixels unmix to ~100% of their own class") {
    // feed the three signature reflectances (uint16 scale) straight back in
    val sigs = Seq(
      ("pv", 300, 500, 400, 4500, 2000, 1000),
      ("npv", 800, 1000, 1200, 2500, 3000, 2500),
      ("bs", 1200, 1600, 2000, 2800, 3800, 3500))
    val df = sigs.toDF("cls", "blue", "green", "red", "nir", "swir1", "swir2")
    val out = FracCover.classify(df, lit(true)).collect()
    out.foreach { r =>
      val (pv, npv, bs) = (r.getAs[Int]("pv"), r.getAs[Int]("npv"), r.getAs[Int]("bs"))
      val m = Map("pv" -> pv, "npv" -> npv, "bs" -> bs)
      val cls = r.getAs[String]("cls")
      assert(m(cls) >= 80, s"$cls: $m") // dominant class wins decisively
      (m - cls).values.foreach(v => assert(v <= m(cls), s"$cls: $m"))
    }
  }

  test("unclean pixels are -9999 on all three outputs") {
    val df = Seq((100, 100, 100, 100, 100, 100, false),
                 (100, 100, 100, 100, 100, 100, true))
      .toDF("blue", "green", "red", "nir", "swir1", "swir2", "ok")
    val out = FracCover.classify(df, col("ok")).collect()
    val bad = out.find(!_.getAs[Boolean]("ok")).get
    assert(bad.getAs[Int]("pv") == -9999 && bad.getAs[Int]("npv") == -9999 && bad.getAs[Int]("bs") == -9999)
    val good = out.find(_.getAs[Boolean]("ok")).get
    assert(good.getAs[Int]("pv") >= 0)
  }

  test("outputs clipped to [0, 254]; deterministic across runs") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { i =>
      (i, 100 + rnd.nextInt(4000), 100 + rnd.nextInt(4000), 100 + rnd.nextInt(4000),
        100 + rnd.nextInt(4000), 100 + rnd.nextInt(4000), 100 + rnd.nextInt(4000))
    }
    val df = rows.toDF("id", "blue", "green", "red", "nir", "swir1", "swir2")
    val a = FracCover.classify(df, lit(true)).orderBy("id").collect()
    val b = FracCover.classify(df, lit(true)).orderBy("id").collect()
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    a.foreach { r =>
      Seq("pv", "npv", "bs").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 0 && v <= 254, s"$c=$v")
      }
    }
  }
}
