package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`).
 *
 *  - [[bruteForceTopK]]: exact top-k, probes broadcast against the corpus —
 *    the baseline. Dot/cosine is pure `zip_with`/`aggregate` Column algebra
 *    (codegen, no UDF).
 *  - [[quantizedDotTopK]]: rank by ⌊1024·e⌋ integer dot product — exact
 *    integer arithmetic, order-independent, hence DuckDB-oracle-checkable.
 *  - [[lshTopK]]: random-hyperplane LSH — sign-bit bucket key, candidates
 *    from same bucket (multi-probe over `tables` independent hash tables),
 *    exact re-rank among candidates. The 100 TB scale path: candidate
 *    generation is an equi-join on (table, bucket), no cross join.
 */
object Ann {

  /** Σ aᵢ·bᵢ in double (codegen'd fold — no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Quantized integer dot: Σ ⌊1024·aᵢ⌋·⌊1024·bᵢ⌋ (exact in Long). */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
      (x, y) => floor(x.cast("double") * 1024) * floor(y.cast("double") * 1024)),
      lit(0L), (acc, v) => acc + v)

  /** Exact cosine top-k of each probe against the corpus. Probes must be
    * small (broadcast); corpus side stays narrow until the per-probe top-k
    * window (the single shuffle, |corpus|·|probes| candidate rows). */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = broadcast(probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(p, col("probe_id") =!= col("neighbor_id")) // all pairs except self
      .withColumn("sim", cosine(col("pe"), col("ce")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Exact quantized-dot top-k (the oracle-checked variant). */
  def quantizedDotTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = broadcast(probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("dot").desc, col("neighbor_id"))
    c.join(p, col("probe_id") =!= col("neighbor_id"))
      .withColumn("dot", quantizedDot(col("pe"), col("ce")).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("dot"))
  }

  /** Deterministic random hyperplanes: `tables` × `bitsPerTable` planes of
    * dimension `dim`, seeded — broadcast as a literal. */
  private def hyperplanes(dim: Int, tables: Int, bits: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  def lshBucketUdf(dim: Int, tables: Int, bits: Int, seed: Long) = {
    val planes = hyperplanes(dim, tables, bits, seed)
    udf((emb: Seq[Float]) => {
      (0 until tables).map { t =>
        var key = 0L
        var b = 0
        while (b < bits) {
          var s = 0.0
          var i = 0
          val pl = planes(t)(b)
          while (i < dim) { s += pl(i) * emb(i); i += 1 }
          if (s >= 0) key |= (1L << b)
          b += 1
        }
        key
      }.toArray
    })
  }

  /**
   * Approximate top-k: candidates share an LSH bucket in ≥1 of `tables`
   * hash tables; exact cosine re-rank on candidates. Recall measured in
   * AnnSpec against [[bruteForceTopK]].
   */
  def lshTopK(probes: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              tables: Int = 8, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val bu = lshBucketUdf(dim, tables, bits, seed)
    val p = broadcast(probes
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      .withColumn("bks", bu(col("pe")))
      .select(col("probe_id"), col("pe"), posexplode(col("bks")).as(Seq("t", "bk"))))
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .withColumn("bks", bu(col("ce")))
      .select(col("neighbor_id"), col("ce"), posexplode(col("bks")).as(Seq("t", "bk")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(p, Seq("t", "bk"))
      .where(col("probe_id") =!= col("neighbor_id"))
      // sim computed MAP-SIDE (before the dedup shuffle): a multi-table hit
      // recomputes a 64-dim cosine (~100 ns) instead of shipping two
      // 256-byte embeddings through the exchange — the shuffle payload is
      // (probe_id, neighbor_id, sim) only.
      .withColumn("sim", cosine(col("pe"), col("ce")))
      .groupBy(col("probe_id"), col("neighbor_id")) // dedup multi-table hits
      .agg(first(col("sim")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets + threshold. */
  def cosineNearDups(df: DataFrame, dim: Int, threshold: Double,
                     tables: Int = 8, bits: Int = 10, seed: Long = 42L): DataFrame = {
    val bu = lshBucketUdf(dim, tables, bits, seed)
    val e = df.select(col("vec_id"), col("embedding"))
      .withColumn("bks", bu(col("embedding")))
      .select(col("vec_id"), col("embedding"), posexplode(col("bks")).as(Seq("t", "bk")))
    val l = e.select(col("t"), col("bk"), col("vec_id").as("id_a"), col("embedding").as("ea"))
    val r = e.select(col("t"), col("bk"), col("vec_id").as("id_b"), col("embedding").as("eb"))
    l.join(r, Seq("t", "bk"))
      .where(col("id_a") < col("id_b"))
      // map-side sim + threshold BEFORE the dedup shuffle: candidate pairs
      // failing the threshold never leave the task, and surviving pairs
      // shuffle 16 bytes + a double instead of two embeddings
      .withColumn("sim", cosine(col("ea"), col("eb")))
      .where(col("sim") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("sim")).as("sim"))
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
