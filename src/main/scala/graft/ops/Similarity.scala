package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>`):
  * exact cosine top-k as the baseline, hyperplane-LSH buckets as the
  * 100 TB scale path.
  *
  * Vector math is expressed with `zip_with`/`aggregate` higher-order
  * functions — pure Catalyst expressions, no UDF/serialization cost, and
  * arithmetic is double everywhere so results are engine-reproducible.
  */
object Similarity {

  /** Σ aᵢ·bᵢ (sequential left-to-right double sum — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity; null-safe on zero vectors (returns null).
    * Fused expression ([[graft.functions.VectorExprs.CosineSim]]) — one
    * eval per row; [[cosineHof]] is the builtin-HOF twin kept for parity
    * testing.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = l2norm(a)
    val nb = l2norm(b)
    when(na > 0 && nb > 0, d / (na * nb))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * xxhash64 folded into [-1, 1). No RNG — reproducible across runs,
    * executors, and resumes.
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001L)).cast(DoubleType) - 1000000.0) / 1000000.0

  /** Hyperplane-LSH bucket id: `bits` sign bits of projections onto
    * deterministic hyperplanes. Nearby (cosine) vectors collide with high
    * probability; bucket count = 2^bits bounds candidate-set size.
    * Fused expression; [[hyperplaneBucketHof]] kept for parity testing.
    */
  def hyperplaneBucket(vec: Column, bits: Int): Column =
    graft.functions.VectorExprs.hyperplaneBucket(vec, bits)

  def hyperplaneBucketHof(vec: Column, bits: Int): Column = {
    val idx = sequence(lit(0), size(vec) - 1)
    val bitCols: Seq[Column] = (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, idx, (x, i) => x * planeWeight(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Exact brute-force cosine top-k: every query row scored against the
    * whole corpus, top k per query by (cosine desc, corpus id asc — the
    * deterministic tie-break). Queries are broadcast (the small side);
    * the corpus streams, so cost is one corpus scan + one shuffle of
    * (query, candidate, score) tuples for the per-query ranking.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qId: String, qVec: String, cId: String, cVec: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(qVec).cast("array<double>").as("__qv"))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).cast("array<double>").as("__cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: corpus and queries bucketed by
    * [[hyperplaneBucket]]; each query only scores its own bucket. The
    * 100 TB path — candidate work divides by 2^bits at some recall cost
    * (multiprobe: probe all buckets within `probeHamming` bit flips of the
    * query's bucket to recover recall).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              qId: String, qVec: String, cId: String, cVec: String,
              k: Int, bits: Int, probeHamming: Int = 1): DataFrame = {
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).cast("array<double>").as("__cv"))
      .withColumn("__bkt", hyperplaneBucket(col("__cv"), bits))
    val q0 = queries.select(col(qId).as("query_id"), col(qVec).cast("array<double>").as("__qv"))
      .withColumn("__qbkt", hyperplaneBucket(col("__qv"), bits))
    // multiprobe: expand each query to its bucket plus single-bit flips
    val probes: Column =
      if (probeHamming <= 0) array(col("__qbkt"))
      else {
        val flips = (0 until bits).map(p => col("__qbkt").bitwiseXOR(lit(1L << p)))
        array_distinct(array(col("__qbkt") +: flips: _*))
      }
    val q = q0.select(col("query_id"), col("__qv"), explode(probes).as("__bkt"))
    val scored = broadcast(q).join(c, Seq("__bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    scored
      .select("query_id", "neighbor_id", "cosine").distinct()
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }
}
