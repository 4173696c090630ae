package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vocab = "spark scan join filter group sort window table row key value hash merge".split(' ')

  /** Seeded corpus: base docs + near-duplicate mutants (1-2 token edits). */
  private def corpus(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map { i =>
      (i.toLong, Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val mutants = base.collect { case (id, t) if id % 3 == 0 =>
      val toks = t.split(' ')
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length))
      (id + 100000, toks.mkString(" "))
    }
    base ++ mutants
  }

  test("minhash-LSH near-dups: precision 1.0 (verified) and high recall vs brute force") {
    val df = corpus(120, 3L).toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(df, "doc_id", "text", q = 5, bands = 8, rowsPerBand = 4,
      threshold = 0.6).select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val truth = Dedup.bruteForceNearDups(df, "doc_id", "text", q = 5, threshold = 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // verification stage ⇒ every reported pair is a true near-dup
    assert(got.subsetOf(truth), s"false positives: ${got diff truth}")
    // banding (8×4) catches ≥90% of jaccard≥0.6 pairs on this corpus
    val recall = if (truth.isEmpty) 1.0 else got.intersect(truth).size.toDouble / truth.size
    assert(truth.nonEmpty && recall >= 0.9, s"recall=$recall truth=${truth.size}")
  }

  test("minhash band join shuffles no text: every band-keyed exchange is text-free") {
    val df = corpus(60, 7L).toDF("doc_id", "text")
    val plan = Dedup.minhashNearDups(df, "doc_id", "text").queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        (e.outputPartitioning.toString, e.output.map(_.name))
    }
    // candidate-generation exchanges (keyed by band/bslice or by the pair ids)
    // must never carry a text column; text may cross only keyed by its own id
    exchanges.foreach { case (part, out) =>
      if (part.contains("band") || part.contains("bslice") ||
          (part.contains("id_a") && part.contains("id_b")))
        assert(!out.exists(_.startsWith("text")),
          s"text column rides a candidate exchange: $part -> $out")
    }
  }

  test("shingle-less docs (null / shorter than q) never form candidate cliques") {
    // 30 empty/short docs would form a 435-pair clique (all share the
    // all-MaxValue signature and empty-vs-empty jaccard = 1.0) — the
    // declared semantic drops them, matching the SQL oracle which never
    // emits a shingle row for them
    val shortIds = (0 until 30).map(i => 900000L + i).toSet
    val shorts = shortIds.toSeq.sorted.map(id => (id, if (id % 3 == 0) null else "ab"))
    val real = corpus(20, 13L)
    val df = (real ++ shorts).toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(df, "doc_id", "text", q = 5, threshold = 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(!got.exists { case (a, b) => shortIds(a) || shortIds(b) },
      s"shingle-less docs paired: ${got.filter(p => shortIds(p._1) || shortIds(p._2))}")
    // and the brute-force oracle agrees on the exclusion
    val truth = Dedup.bruteForceNearDups(df, "doc_id", "text", q = 5, threshold = 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth))
    assert(!truth.exists { case (a, b) => shortIds(a) || shortIds(b) })
  }

  test("exact jaccard identities") {
    assert(Dedup.jaccard("abcdef", "abcdef", 3) == 1.0)
    assert(Dedup.jaccard("abcdef", "uvwxyz", 3) == 0.0)
    val j = Dedup.jaccard("the quick brown fox", "the quick brown cat", 4)
    assert(j > 0.3 && j < 1.0)
  }

  test("simhash near-dups find single-token mutants; hamming bound respected") {
    val df = corpus(100, 5L).toDF("doc_id", "text")
    val got = Dedup.simhashNearDups(df, "doc_id", "text", chunks = 4, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, h) =>
      assert(h <= 3 && a < b)
      // re-verify hamming from first principles
      val texts = df.as[(Long, String)].collect().toMap
      val hh = java.lang.Long.bitCount(
        graft.text.TextOps.simhash64(texts(a)) ^ graft.text.TextOps.simhash64(texts(b)))
      assert(hh == h)
    }
    // every identical-text pair must be found (hamming 0)
    val withTwin = (df.as[(Long, String)].collect() :+ ((999999L, df.as[(Long, String)].collect().head._2))).toSeq
    val twins = Dedup.simhashNearDups(withTwin.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Int)].collect()
    assert(twins.exists { case (a, b, h) => h == 0 && (b == 999999L || a == 999999L) })
  }

  test("connectedComponents ≡ union-find on seeded random pair sets") {
    val rnd = new scala.util.Random(11L)
    val pairs = Seq.fill(60)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // scalar oracle: union-find with min-id canonical labels
    val parent = scala.collection.mutable.Map((0L until 50L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val vertices = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val expected = vertices.map(v => (v, find(v))).toSet

    val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
    // determinism under partitioning: the iterative min-label propagation
    // must land on the same fixpoint for any physical layout
    val got2 = Dedup.connectedComponents(pairs.toDF("id_a", "id_b").repartition(7))
      .as[(Long, Long)].collect().toSet
    assert(got2 == expected)
  }

  test("exact + normalized dedup semantics") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val ex = Dedup.exact(df, "doc_id", "text")
      .select($"keeper_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(ex == Set((1L, 2L), (3L, 1L), (4L, 1L)))
    val nm = Dedup.normalized(df, "doc_id", "text")
      .select($"keeper_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(nm == Set((1L, 3L), (4L, 1L))) // word order collapsed
  }
}
