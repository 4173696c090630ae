package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for the training-data pipeline, each designed for
 * the 10^12-doc posture:
 *
 *  - exact / normalized dedup: ONE shuffle on a fixed-width md5 key (never
 *    on the raw text — shuffle volume is 16 bytes/doc + ids)
 *  - MinHash + LSH banding: signatures map-side; candidate generation is a
 *    self-equi-join on (band_id, band_hash) buckets; exact Jaccard verify
 *    only on candidates — the classic shingle→minhash→band→bucket-join
 *  - SimHash: 64-bit signature, near-dup = hamming distance ≤ r via
 *    probe-table of bit-chunk keys
 *  - embedding cosine near-dup via random-hyperplane LSH (see graft.ann.Ann)
 */
object Dedup {

  /** Exact dedup: canonical doc per identical text. Returns
    * (key, keeper_id, n_copies). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Word-order-insensitive (normalized token multiset) dedup key. */
  def normalizedKey(text: Column): Column =
    md5(concat_ws(",", array_sort(split(text, " "))).cast("binary"))

  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(normalizedKey(col(textCol)).as("key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  // ---------------- MinHash + LSH ----------------

  /** Character shingles of length q as 64-bit FNV hashes. */
  def shingles(text: String, q: Int): Array[Long] = {
    if (text == null || text.length < q) return Array.empty
    val out = new Array[Long](text.length - q + 1)
    var i = 0
    while (i + q <= text.length) {
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + q) { h ^= text.charAt(j); h *= 0x100000001b3L; j += 1 }
      out(i) = h
      i += 1
    }
    out.distinct
  }

  /** MinHash signature with k universal-hash permutations h_i(x)=a_i*x+b_i
    * (seeded, fixed across the job — deterministic). */
  def minhash(text: String, q: Int, k: Int, seed: Long): Array[Long] = {
    val sh = shingles(text, q)
    val sig = Array.fill(k)(Long.MaxValue)
    if (sh.isEmpty) return sig
    val rnd = new java.util.Random(seed)
    var i = 0
    while (i < k) {
      val a = rnd.nextLong() | 1L
      val b = rnd.nextLong()
      var m = Long.MaxValue
      var j = 0
      while (j < sh.length) {
        val v = a * sh(j) + b
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    sig
  }

  def minhashUdf(q: Int, k: Int, seed: Long) =
    udf((text: String) => minhash(text, q, k, seed))

  /** Exact q-gram Jaccard (verify stage; also a standalone near-dup op). */
  def jaccard(a: String, b: String, q: Int): Double = {
    val sa = shingles(a, q).toSet
    val sb = shingles(b, q).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }
  def jaccardUdf(q: Int) = udf((a: String, b: String) => jaccard(a, b, q))

  /**
   * MinHash-LSH near-duplicate pairs with exact-Jaccard verification.
   * bands×rowsPerBand = signature length. Emits (id_a, id_b, jaccard) with
   * id_a < id_b, jaccard ≥ threshold, deduped across bands shuffle-free
   * (pair reported only on its smallest matching band).
   */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      q: Int = 5, bands: Int = 8, rowsPerBand: Int = 4,
                      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    val k = bands * rowsPerBand
    val sig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashUdf(q, k, seed)(col("text")))
    val banded = sig.select(col("id"), col("text"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bkey", xxhash64(col("band"),
        slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
    val l = banded.select(col("band").as("band_l"), col("bkey"), col("id").as("id_a"),
      col("text").as("text_a"), col("sig").as("sig_l"))
    val r = banded.select(col("band").as("band_r"), col("bkey"), col("id").as("id_b"),
      col("text").as("text_b"), col("sig").as("sig_r"))
    l.join(r, Seq("bkey"))
      .where(col("id_a") < col("id_b") && col("band_l") === col("band_r"))
      // report a pair only on the first band where its bucket keys collide
      .withColumn("first_band", min(col("band_l"))
        .over(Window.partitionBy(col("id_a"), col("id_b"))))
      .where(col("band_l") === col("first_band"))
      .withColumn("jaccard", jaccardUdf(q)(col("text_a"), col("text_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Word-set Jaccard as pure Column algebra (codegen'd, SQL-oracle-exact):
    * returns (|A∩B|, |A∪B|) over distinct whitespace tokens — integer
    * outputs so cross-engine comparison is exact. */
  def wordJaccardParts(a: Column, b: Column): (Column, Column) = {
    val wa = array_distinct(split(a, " "))
    val wb = array_distinct(split(b, " "))
    (size(array_intersect(wa, wb)), size(array_union(wa, wb)))
  }

  /** Brute-force q-gram Jaccard near-dups — O(N²) oracle for tests. */
  def bruteForceNearDups(df: DataFrame, idCol: String, textCol: String,
                         q: Int = 5, threshold: Double = 0.5): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(textCol).as("text_a"))
    val b = df.select(col(idCol).as("id_b"), col(textCol).as("text_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardUdf(q)(col("text_a"), col("text_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------- SimHash ----------------

  /** SimHash near-dup candidates: split the 64-bit signature into `chunks`
    * pieces; hamming distance ≤ chunks−1 guarantees ≥1 identical chunk
    * (pigeonhole) ⇒ equi-join on (chunk_idx, chunk_value). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      chunks: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val bits = 64 / chunks
    val sh = df.select(col(idCol).as("id"),
      graft.text.TextOps.simhashUdf(col(textCol)).as("sh"))
    val chunked = sh.select(col("id"), col("sh"),
      explode(sequence(lit(0), lit(chunks - 1))).as("ci"))
      .withColumn("cv", expr(s"shiftrightunsigned(sh, ci * $bits)")
        .bitwiseAND(lit((1L << bits) - 1)))
    val l = chunked.select(col("ci"), col("cv"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = chunked.select(col("ci"), col("cv"), col("id").as("id_b"), col("sh").as("sh_b"))
    val ham = bit_count(col("sh_a").bitwiseXOR(col("sh_b")))
    l.join(r, Seq("ci", "cv"))
      .where(col("id_a") < col("id_b") && ham <= maxHamming)
      .withColumn("first_ci", min(col("ci")).over(Window.partitionBy(col("id_a"), col("id_b"))))
      .where(col("ci") === col("first_ci"))
      .select(col("id_a"), col("id_b"), ham.as("hamming"))
  }
}
