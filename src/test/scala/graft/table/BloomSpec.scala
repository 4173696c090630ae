package graft.table

import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {

  test("no false negatives; bounded false positives at the sizing rate") {
    val mBits = Bloom.sizeBits(1000)
    assert(mBits >= 10000 && Integer.bitCount(mBits) == 1)
    val agg = new Bloom.Agg(mBits)
    val inserted = (0L until 1000L).map(i => i * 2654435761L + 17)
    val filter = agg.finish(
      inserted.foldLeft(agg.zero)((b, h) => agg.reduce(b, h)))
    // every inserted hash MUST hit — a false negative is a correctness bug
    assert(inserted.forall(Bloom.mightContain(filter, _)))
    // absent hashes mostly miss (sized for ~1%; assert a loose 5%)
    val absent = (0L until 2000L).map(i => i * 972663749L + 1)
      .filterNot(inserted.toSet)
    val fp = absent.count(Bloom.mightContain(filter, _))
    assert(fp < absent.size / 20, s"false-positive rate too high: $fp/${absent.size}")
  }

  test("merge is bitwise OR: split-build equals whole-build") {
    val agg = new Bloom.Agg(1 << 12)
    val hs = (0L until 200L).map(_ * 31 + 7)
    def build(xs: Seq[Long]) = xs.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    val whole = agg.finish(build(hs))
    val (l, r) = hs.splitAt(97)
    val merged = agg.finish(agg.merge(build(l), build(r)))
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("hashLiteral is type-sensitive (the reason probes must downcast)") {
    import org.apache.spark.sql.types._
    assert(Bloom.hashLiteral(5L, LongType) != Bloom.hashLiteral(5, IntegerType))
    assert(Bloom.hashLiteral("x", StringType) == Bloom.hashLiteral("x", StringType))
  }

  test("sizeBits clamps and rounds to powers of two") {
    assert(Bloom.sizeBits(1) == 1 << 10)
    assert(Bloom.sizeBits(1000000000L) == 1 << 23)
    val m = Bloom.sizeBits(5000)
    assert(m >= 50000 && Integer.bitCount(m) == 1)
  }
}
