package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{Bpe, Corpus, Dedup, Graph, Layout, Multimodal, Similarity, Text, Unigram}

/** Shared DuckDB-oracle SQL builders for the vector gates: cosine and
  * L2 expression snippets plus the unrolled Lloyd-iteration CTE chains
  * used by both the dedup family (SemDeDup, cosine-LSH) and the ANN
  * family (IVF, PQ, IVF-PQ). Extracted from CurationQueries in the
  * round-13 split; bodies verbatim.
  */
private[graft] object VecOracleSql {
  /** Cosine expressed EXACTLY as the fused
    * [[graft.functions.VectorExprs.CosineSim]] expression computes it:
    * `dot / (sqrt(‖a‖²) · sqrt(‖b‖²))`, null when either norm is zero.
    * `LIST_INNER_PRODUCT` accumulates in index order — bit-identical to
    * the expression's sequential double adds (the same property the
    * md5-plane LSH oracles already lean on), so centroid-assignment
    * DECISIONS (not just rounded outputs) reproduce across engines.
    */
  private[graft] def cosSql(a: String, b: String): String =
    s"""CASE WHEN LIST_INNER_PRODUCT($a, $a) > 0 AND LIST_INNER_PRODUCT($b, $b) > 0
             THEN LIST_INNER_PRODUCT($a, $b)
                  / (SQRT(LIST_INNER_PRODUCT($a, $a)) * SQRT(LIST_INNER_PRODUCT($b, $b))) END"""

  /** DuckDB CTE chain rebuilding
    * [[graft.ops.Similarity.ivfCentroids]]' deterministic Lloyd
    * refinement relationally — the oracle half of the quantized-centroid
    * contract ([[graft.ops.Similarity.CentroidQuantScale]]): seeds are
    * the first `kSql` vectors by id, each step assigns every vector to
    * its max-cosine centroid (ties → smallest centroid_id, exactly the
    * max-struct `(-centroid_id)` rule) and recomputes per-cell means as
    * `SUM(FLOOR(x·2²⁰ + ½)) / 2²⁰ / COUNT(x)` — the integer sums are
    * order-independent, so both engines land the SAME double, bit for
    * bit. Emits CTEs `v` (vectors), `dx` (exploded dims), `c0..c<iters>`
    * (centroid frames); callers append their own CTEs referencing
    * `c<iters>`. An empty cell drops out (its centroid_id groups no
    * rows), matching the Spark stream.
    */
  private[graft] def lloydCtesSql(kSql: String, iters: Int): String = {
    val steps = (1 to iters).map { it =>
      s"""a$it AS (
              SELECT vec_id, centroid_id FROM (
                SELECT v.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY ${cosSql("v.e", "c.cent")} DESC NULLS LAST,
                                  c.centroid_id) AS rk
                FROM v CROSS JOIN c${it - 1} c) WHERE rk = 1),
            c$it AS (
              SELECT centroid_id, LIST(m ORDER BY dim) AS cent FROM (
                SELECT a.centroid_id, d.i AS dim,
                       CAST(SUM(CAST(FLOOR(d.x * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
                         / 1048576.0 / CAST(COUNT(d.x) AS DOUBLE) AS m
                FROM a$it a JOIN dx d ON d.vec_id = a.vec_id
                GROUP BY a.centroid_id, d.i)
              GROUP BY centroid_id)"""
    }.mkString(",\n            ")
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            dx AS (SELECT vec_id, GENERATE_SUBSCRIPTS(e, 1) AS i, UNNEST(e) AS x FROM v),
            c0 AS (
              SELECT vec_id AS centroid_id, e AS cent FROM (
                SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM v)
              WHERE rn <= ($kSql)),
            $steps"""
  }

  /** Squared L2 expressed EXACTLY as [[graft.ops.Similarity]]'s private
    * `l2sq` computes it: `⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩`, each inner product a
    * sequential index-order sum (`LIST_INNER_PRODUCT` ≡ the HOF fold),
    * the subtraction/addition in the same association order — so PQ code
    * assignment DECISIONS reproduce bit-for-bit across engines.
    */
  private[graft] def l2sqSql(a: String, b: String): String =
    s"(LIST_INNER_PRODUCT($a, $a) - 2 * LIST_INNER_PRODUCT($a, $b) + LIST_INNER_PRODUCT($b, $b))"

  /** DuckDB CTE chain rebuilding [[graft.ops.Similarity.pqCodebooks]]'
    * per-subspace Lloyd refinement plus the final corpus encoding: CTEs
    * `v` (vectors), `s0` (subvectors: one row per (vector, subspace)),
    * `sdx` (exploded subvector dims), `p0..p<iters>` (codebook frames
    * keyed (s, code); seeds = the first `ksub` vectors by id, code =
    * 1-based id rank), `a1..a<iters>` (assignments), and `enc` (the
    * final (vec_id, s, code) encoding against `p<iters>`). Assignment is
    * min squared-L2 ([[l2sqSql]]) with ties to the smallest code — the
    * min-struct rule — and means are the same order-independent
    * quantized-integer sums as [[lloydCtesSql]].
    */
  private[graft] def pqLloydCtesSql(m: Int, dsub: Int, ksub: Int, iters: Int,
                             prefix: String = "", emitV: Boolean = true): String = {
    val P = prefix // CTE-name prefix so the chain composes beside lloydCtesSql
    def assignSql(to: String): String =
      s"""SELECT vec_id, s, code FROM (
                SELECT s0.vec_id, s0.s, c.code,
                       ROW_NUMBER() OVER (PARTITION BY s0.vec_id, s0.s
                         ORDER BY ${l2sqSql("s0.sv", "c.cent")} ASC NULLS LAST,
                                  c.code) AS rk
                FROM ${P}s0 s0 JOIN $to c ON c.s = s0.s) WHERE rk = 1"""
    val steps = (1 to iters).map { it =>
      s"""${P}a$it AS (${assignSql(s"${P}p${it - 1}")}),
            ${P}p$it AS (
              SELECT s, code, LIST(mv ORDER BY dim) AS cent FROM (
                SELECT a.s, a.code, d.i AS dim,
                       CAST(SUM(CAST(FLOOR(d.x * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
                         / 1048576.0 / CAST(COUNT(d.x) AS DOUBLE) AS mv
                FROM ${P}a$it a JOIN ${P}sdx d ON d.vec_id = a.vec_id AND d.s = a.s
                GROUP BY a.s, a.code, d.i)
              GROUP BY s, code)"""
    }.mkString(",\n            ")
    val vCte =
      if (emitV) "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),\n            "
      else ""
    s"""$vCte${P}s0 AS (SELECT vec_id, s, LIST_SLICE(e, s * $dsub + 1, s * $dsub + $dsub) AS sv
                   FROM v, RANGE(0, $m) ss(s)),
            ${P}sdx AS (SELECT vec_id, s, GENERATE_SUBSCRIPTS(sv, 1) AS i, UNNEST(sv) AS x
                    FROM ${P}s0),
            ${P}p0 AS (
              SELECT s0.s, r.code, s0.sv AS cent
              FROM (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS code FROM v) r
              JOIN ${P}s0 s0 ON s0.vec_id = r.vec_id WHERE r.code <= $ksub),
            $steps,
            ${P}enc AS (${assignSql(s"${P}p$iters")})"""
  }
}
