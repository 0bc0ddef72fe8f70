package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{Bpe, Corpus, Dedup, Graph, Layout, Multimodal, Similarity, Text, Unigram}

/** ANN gates: brute-force/LSH/IVF/SQ8/PQ/IVF-PQ/RP top-k, the recall report, embedding centering and hashing-TF knn.
  *
  * Split from CurationQueries (round 13) for navigation only — gate
  * bodies are verbatim; the aggregator preserves the original catalog
  * order.
  */
private[graft] object CurationKnnQueries {
  import VecOracleSql._

  /** Exact brute-force cosine top-k for a query subset — the ANN baseline.
    * Deterministic tie-break (cosine desc, neighbor_id asc).
    */
  val knnBrute = Q("q_knn_cosine_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 16), emb, "vec_id", "embedding", "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 16),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     LIST_COSINE_SIMILARITY(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
              FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
            SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
              neighbor_id, ROUND(cos, 9) AS cosine
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** IVF approximate top-k (adaptive centroid cells, nprobe probing) —
    * FULLY oracled since the centroid stream went bit-reproducible: the
    * SQL rebuilds the nlist=16 / 3-step Lloyd refinement
    * ([[lloydCtesSql]]), assigns the corpus to cells (rank-1 of the same
    * tie-ruled ordering), expands each query to its nprobe=4 nearest
    * cells, and ranks exact cosine within the probed candidates — the
    * complete IVF definition, not just the output shape. Exactness at
    * nprobe=nlist stays unit-tested against the brute-force baseline.
    */
  val knnIvf = Q("q_knn_cosine_ivf",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 16), emb, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH ${lloydCtesSql("16", 3)},
            cc AS (
              SELECT vec_id AS neighbor_id, centroid_id FROM (
                SELECT v.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY ${cosSql("v.e", "c.cent")} DESC NULLS LAST,
                                  c.centroid_id) AS rk
                FROM v CROSS JOIN c3 c) WHERE rk = 1),
            qp AS (
              SELECT vec_id AS query_id, centroid_id FROM (
                SELECT v.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY ${cosSql("v.e", "c.cent")} DESC NULLS LAST,
                                  c.centroid_id) AS rk
                FROM v CROSS JOIN c3 c WHERE v.vec_id < 16) WHERE rk <= 4),
            sc AS (
              SELECT q.query_id, c.neighbor_id, ${cosSql("vq.e", "vn.e")} AS cos
              FROM qp q
              JOIN cc c ON c.centroid_id = q.centroid_id
                       AND c.neighbor_id <> q.query_id
              JOIN v vq ON vq.vec_id = q.query_id
              JOIN v vn ON vn.vec_id = c.neighbor_id)
            SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC NULLS LAST, neighbor_id) AS INTEGER) AS rank,
              neighbor_id, ROUND(cos, 9) AS cosine
            FROM sc
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** Approximate LSH top-k (multiprobe hyperplane buckets) — FULLY
    * oracled on md5-derived planes, same discipline as
    * [[dedupCosineLsh]]: the SQL rebuilds every 8-bit bucket signature
    * bit-exactly (ordered LIST_INNER_PRODUCT), expands each query to its
    * bucket plus all Hamming-1 probes (XOR over the bit_count(m)≤1
    * masks), scores candidates with exact cosine and ranks — the
    * complete multiprobe definition, not just the output shape.
    */
  val knnLsh = Q("q_knn_cosine_lsh",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(
        emb.filter(col("vec_id") < 16), emb, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, bits = 8, probeHamming = 1, planeHash = "md5")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            planes AS (
              SELECT b,
                     LIST_TRANSFORM(RANGE(0, 64),
                       i -> (('0x' || SUBSTR(MD5(b || '_' || i), 1, 15))::BIGINT
                             % 2000001 - 1000000) / 1000000.0) AS w
              FROM RANGE(0, 8) bb(b)),
            bk AS (
              SELECT v.vec_id,
                     SUM(CASE WHEN LIST_INNER_PRODUCT(v.e, p.w) >= 0
                              THEN (2 ^ p.b)::BIGINT ELSE 0 END)::BIGINT AS bucket
              FROM v CROSS JOIN planes p GROUP BY v.vec_id),
            probes AS (
              SELECT qb.vec_id AS query_id, XOR(qb.bucket, m.m) AS bucket
              FROM bk qb, RANGE(0, 256) m(m)
              WHERE qb.vec_id < 16 AND BIT_COUNT(m.m) <= 1),
            cand AS (
              SELECT DISTINCT p.query_id, cb.vec_id AS neighbor_id
              FROM probes p JOIN bk cb ON cb.bucket = p.bucket
              WHERE cb.vec_id <> p.query_id),
            scored AS (
              SELECT query_id, neighbor_id,
                     LIST_COSINE_SIMILARITY(vq.e, vn.e) AS cos
              FROM cand
              JOIN v vq ON vq.vec_id = cand.query_id
              JOIN v vn ON vn.vec_id = cand.neighbor_id)
            SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
              neighbor_id, ROUND(cos, 9) AS cosine
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** Product-quantized top-k (m=8 subspaces × ksub=16 codes — 8 stored
    * bytes per 64-d vector) — FULLY oracled: the SQL rebuilds the
    * per-subspace 3-step Lloyd codebooks ([[pqLloydCtesSql]]), encodes
    * the corpus, reconstructs each vector from its codes in (subspace,
    * dim) order, shortlists the top 50 per query by approximate cosine
    * against the reconstruction (DESC NULLS LAST, neighbor asc — the
    * same tie rule the Spark window applies), and re-ranks the shortlist
    * by exact cosine — the complete PQ definition including every
    * shortlist decision, not just the output shape. Exactness at
    * shortlist ≥ corpus stays unit-tested against brute force.
    */
  val knnPq = Q("q_knn_cosine_pq",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqTopK(
        emb.filter(col("vec_id") < 16), emb, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, m = 8, dsub = 8, ksub = 16, iters = 3, shortlist = 50)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH ${pqLloydCtesSql(m = 8, dsub = 8, ksub = 16, iters = 3)},
            rec AS (
              SELECT c.vec_id, LIST(d.x ORDER BY c.s, d.i) AS recon
              FROM enc c
              JOIN (SELECT s, code, GENERATE_SUBSCRIPTS(cent, 1) AS i, UNNEST(cent) AS x
                    FROM p3) d
                ON d.s = c.s AND d.code = c.code
              GROUP BY c.vec_id),
            sh AS (
              SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY ${cosSql("q.e", "r.recon")} DESC NULLS LAST,
                                  r.vec_id) AS srk
                FROM v q JOIN rec r ON r.vec_id <> q.vec_id
                WHERE q.vec_id < 16) WHERE srk <= 50),
            sc AS (
              SELECT sh.query_id, sh.neighbor_id, ${cosSql("vq.e", "vn.e")} AS cos
              FROM sh
              JOIN v vq ON vq.vec_id = sh.query_id
              JOIN v vn ON vn.vec_id = sh.neighbor_id)
            SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC NULLS LAST, neighbor_id) AS INTEGER) AS rank,
              neighbor_id, ROUND(cos, 9) AS cosine
            FROM sc
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** IVF-PQ top-k — the candidate-count reduction (nlist=16 cells,
    * nprobe=4 probing) composed with the bytes-per-candidate reduction
    * (8×16 PQ codes) — FULLY oracled by composing both Lloyd rebuilds:
    * [[lloydCtesSql]] for the coarse cells, [[pqLloydCtesSql]] (prefixed
    * `pq`) for the codebooks, then shortlist-by-reconstruction within
    * probed cells and exact re-rank, every decision replayed.
    */
  val knnIvfPq = Q("q_knn_cosine_ivfpq",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(
        emb.filter(col("vec_id") < 16), emb, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, m = 8, dsub = 8, ksub = 16,
        iters = 3, shortlist = 32)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH ${lloydCtesSql("16", 3)},
            ${pqLloydCtesSql(m = 8, dsub = 8, ksub = 16, iters = 3,
                             prefix = "pq", emitV = false)},
            cc AS (
              SELECT vec_id AS neighbor_id, centroid_id FROM (
                SELECT v.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY ${cosSql("v.e", "c.cent")} DESC NULLS LAST,
                                  c.centroid_id) AS rk
                FROM v CROSS JOIN c3 c) WHERE rk = 1),
            qp AS (
              SELECT vec_id AS query_id, centroid_id FROM (
                SELECT v.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY ${cosSql("v.e", "c.cent")} DESC NULLS LAST,
                                  c.centroid_id) AS rk
                FROM v CROSS JOIN c3 c WHERE v.vec_id < 16) WHERE rk <= 4),
            rec AS (
              SELECT c.vec_id, LIST(d.x ORDER BY c.s, d.i) AS recon
              FROM pqenc c
              JOIN (SELECT s, code, GENERATE_SUBSCRIPTS(cent, 1) AS i, UNNEST(cent) AS x
                    FROM pqp3) d
                ON d.s = c.s AND d.code = c.code
              GROUP BY c.vec_id),
            sh AS (
              SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY q.query_id
                         ORDER BY ${cosSql("vq.e", "r.recon")} DESC NULLS LAST,
                                  c.neighbor_id) AS srk
                FROM qp q
                JOIN cc c ON c.centroid_id = q.centroid_id
                         AND c.neighbor_id <> q.query_id
                JOIN rec r ON r.vec_id = c.neighbor_id
                JOIN v vq ON vq.vec_id = q.query_id) WHERE srk <= 32),
            sc AS (
              SELECT sh.query_id, sh.neighbor_id, ${cosSql("vq.e", "vn.e")} AS cos
              FROM sh
              JOIN v vq ON vq.vec_id = sh.query_id
              JOIN v vn ON vn.vec_id = sh.neighbor_id)
            SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC NULLS LAST, neighbor_id) AS INTEGER) AS rank,
              neighbor_id, ROUND(cos, 9) AS cosine
            FROM sc
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** Scalar-quantized (int8) top-k — approximate like IVF/LSH, but the
    * approximation is a pure deterministic function of the data (no
    * hash-bucket or centroid structure), so unlike those two it IS
    * oracle-able: the same quantize→dequantize→cosine formula runs in SQL.
    */
  val knnSq8 = Q("q_knn_cosine_sq8",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.sq8TopK(
        emb.filter(col("vec_id") < 16), emb, "vec_id", "embedding", "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
            dx AS (SELECT vec_id, GENERATE_SUBSCRIPTS(ev, 1) AS i, UNNEST(ev) AS x FROM v),
            b AS (SELECT i, MIN(x) AS mn, MAX(x) - MIN(x) AS span FROM dx GROUP BY i),
            hv AS (
              SELECT vec_id,
                     LIST(
                       (CAST(CASE WHEN span > 0
                               THEN LEAST(255, GREATEST(0, FLOOR((x - mn) / span * 255)))
                               ELSE 0 END - 128 AS TINYINT) + 128) * span / 255 + mn
                       ORDER BY i) AS h
              FROM dx JOIN b USING (i) GROUP BY vec_id),
            q AS (SELECT vec_id AS query_id, h AS qv FROM hv WHERE vec_id < 16),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     LIST_COSINE_SIMILARITY(q.qv, e.h) AS cos
              FROM q JOIN hv e ON e.vec_id <> q.query_id)
            SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
              neighbor_id, ROUND(cos, 9) AS cosine
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** Embedding mean-centering (anisotropy correction before cosine
    * retrieval). The quantized integer-sum mean makes every centered
    * component bit-reproducible, so the oracle recomputes the exact
    * doubles — ROUND(9) only guards the parquet/pandas display path.
    */
  val embedCenter = Q("q_embed_center",
    (s, dir) =>
      Similarity.centerVectors(
        Tables.embeddings(s, dir).filter(col("vec_id") < 200)
          .select("vec_id", "embedding"),
        "embedding", "centered")
        .select(col("vec_id"), posexplode(col("centered")).as(Seq("dim", "c")))
        .select(col("vec_id"), col("dim"), round(col("c"), 9).as("centered"))
        .orderBy("vec_id", "dim"),
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                       FROM embeddings WHERE vec_id < 200),
            dx AS (SELECT vec_id, GENERATE_SUBSCRIPTS(ev, 1) AS i, UNNEST(ev) AS x
                   FROM v),
            m AS (SELECT i,
                    CAST(SUM(CAST(FLOOR(x * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 1048576.0 / CAST(COUNT(x) AS DOUBLE) AS mu
                  FROM dx GROUP BY i)
            SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
                   ROUND(x - mu, 9) AS centered
            FROM dx JOIN m USING (i)
            ORDER BY vec_id, dim"""))

  /** Random-projection ANN (Johnson–Lindenstrauss sign projection,
    * 64 → 16 dims, shortlist in projected space + exact re-rank) —
    * FULLY oracled: the SQL rebuilds the md5-derived ±1 sign matrix,
    * re-projects every vector with the same ordered inner products,
    * replays the 50-deep shortlist cut, and ranks exact cosine among
    * the survivors.
    */
  val knnRp = Q("q_knn_cosine_rp",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.rpTopK(
        emb.filter(col("vec_id") < 16), emb, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, inDim = 64, outDim = 16, shortlist = 50)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH signs AS (
              SELECT j.j, LIST(CAST(CASE WHEN SUBSTR(MD5('rp::' || j.j || ':' || i.i), 1, 1) < '8'
                                         THEN 1.0 ELSE -1.0 END AS DOUBLE) ORDER BY i.i) AS s
              FROM RANGE(0, 16) j(j), RANGE(0, 64) i(i)
              GROUP BY j.j),
            v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
            proj AS (
              SELECT vec_id,
                     LIST(LIST_INNER_PRODUCT(ev, s) / SQRT(16.0) ORDER BY j) AS pv
              FROM v, signs GROUP BY vec_id),
            short AS (
              SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                         CASE WHEN LIST_INNER_PRODUCT(q.pv, q.pv) > 0
                               AND LIST_INNER_PRODUCT(c.pv, c.pv) > 0
                              THEN LIST_INNER_PRODUCT(q.pv, c.pv)
                                   / (SQRT(LIST_INNER_PRODUCT(q.pv, q.pv))
                                      * SQRT(LIST_INNER_PRODUCT(c.pv, c.pv))) END
                         DESC NULLS LAST, c.vec_id) AS srk
                FROM proj q JOIN proj c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < 16)
              WHERE srk <= 50),
            scored AS (
              SELECT s.query_id, s.neighbor_id,
                     CASE WHEN LIST_INNER_PRODUCT(q.ev, q.ev) > 0
                           AND LIST_INNER_PRODUCT(e.ev, e.ev) > 0
                          THEN LIST_INNER_PRODUCT(q.ev, e.ev)
                               / (SQRT(LIST_INNER_PRODUCT(q.ev, q.ev))
                                  * SQRT(LIST_INNER_PRODUCT(e.ev, e.ev))) END AS cos
              FROM short s
              JOIN v q ON q.vec_id = s.query_id
              JOIN v e ON e.vec_id = s.neighbor_id)
            SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC NULLS LAST, neighbor_id) AS INTEGER) AS rank,
              neighbor_id, ROUND(cos, 9) AS cosine
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** ANN recall@k self-evaluation ([[graft.ops.Similarity.recallAtK]]):
    * every approximate family — lsh / ivf / pq / ivfpq / rp / sq8, each
    * at its own gate's exact parameters — scored against the brute-force
    * baseline on the same 16-query sample, one row per (method, query).
    * This is the measurement the family's planners promise but nothing
    * else verifies: recall is what the LSH probe count / nprobe /
    * shortlist knobs trade against scan bytes. The oracle composes the
    * six methods' own full replay SQL as subqueries (DuckDB permits a
    * WITH inside a derived table), so the report is oracled END TO END —
    * not against Spark's idea of each method, but against six
    * independent relational reconstructions of them. sq8 re-ranks its
    * full-corpus shortlist by exact cosine, so its recall is 1 by
    * construction — kept as the sanity row.
    */
  val knnRecallReport = Q("q_knn_recall_report",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 16)
      val exact = Similarity.bruteForceTopK(
        q, emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      def rep(name: String, approx: org.apache.spark.sql.DataFrame) =
        Similarity.recallAtK(approx, exact, 5).withColumn("method", lit(name))
      rep("ivf", Similarity.ivfTopK(q, emb,
          "vec_id", "embedding", "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 4))
        .unionByName(rep("ivfpq", Similarity.ivfPqTopK(q, emb,
          "vec_id", "embedding", "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 4, m = 8, dsub = 8, ksub = 16,
          iters = 3, shortlist = 32)))
        .unionByName(rep("lsh", Similarity.lshTopK(q, emb,
          "vec_id", "embedding", "vec_id", "embedding",
          k = 5, bits = 8, probeHamming = 1, planeHash = "md5")))
        .unionByName(rep("pq", Similarity.pqTopK(q, emb,
          "vec_id", "embedding", "vec_id", "embedding",
          k = 5, m = 8, dsub = 8, ksub = 16, iters = 3, shortlist = 50)))
        .unionByName(rep("rp", Similarity.rpTopK(q, emb,
          "vec_id", "embedding", "vec_id", "embedding",
          k = 5, inDim = 64, outDim = 16, shortlist = 50)))
        .unionByName(rep("sq8", Similarity.sq8TopK(q, emb,
          "vec_id", "embedding", "vec_id", "embedding", 5)))
        .select("method", "query_id", "n_hit", "recall")
        .orderBy("method", "query_id")
    },
    Some(s"""WITH exact AS (
              SELECT query_id, neighbor_id FROM (${knnBrute.oracle.get}) t),
            am AS (
              SELECT 'lsh' AS method, query_id, neighbor_id FROM (${knnLsh.oracle.get}) t
              UNION ALL
              SELECT 'ivf' AS method, query_id, neighbor_id FROM (${knnIvf.oracle.get}) t
              UNION ALL
              SELECT 'pq' AS method, query_id, neighbor_id FROM (${knnPq.oracle.get}) t
              UNION ALL
              SELECT 'ivfpq' AS method, query_id, neighbor_id FROM (${knnIvfPq.oracle.get}) t
              UNION ALL
              SELECT 'rp' AS method, query_id, neighbor_id FROM (${knnRp.oracle.get}) t
              UNION ALL
              SELECT 'sq8' AS method, query_id, neighbor_id FROM (${knnSq8.oracle.get}) t),
            methods AS (SELECT DISTINCT method FROM am),
            qs AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY 1),
            hits AS (
              SELECT a.method, a.query_id, COUNT(*) AS n_hit
              FROM exact e
              JOIN am a ON a.query_id = e.query_id
                       AND a.neighbor_id = e.neighbor_id
              GROUP BY 1, 2)
            SELECT m.method, qs.query_id,
                   CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
                   ROUND(COALESCE(h.n_hit, 0) / CAST(qs.n_exact AS DOUBLE), 9) AS recall
            FROM methods m
            CROSS JOIN qs
            LEFT JOIN hits h ON h.method = m.method AND h.query_id = qs.query_id
            ORDER BY 1, 2"""))

  /** Feature-hashing TF buckets (long format — the scale representation:
    * shuffle rows = tokens, bucket space fixed regardless of vocab).
    */
  val textHashingTf = Q("q_text_hashing_tf",
    (s, dir) =>
      Text.hashingTfBuckets(Tables.documents(s, dir), "doc_id", "text", dim = 64)
        .orderBy("doc_id", "bucket"),
    Some("""WITH toks AS (
              SELECT doc_id, UNNEST(LIST_FILTER(
                STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                x -> x <> '')) AS t
              FROM documents)
            SELECT doc_id,
                   ('0x' || SUBSTR(MD5(t), 1, 15))::BIGINT % 64 AS bucket,
                   COUNT(*) AS cnt
            FROM toks GROUP BY 1, 2 ORDER BY doc_id, bucket"""))

  /** Model-free text similarity search: hashing-trick TF vectors fed to
    * the SAME brute-force cosine top-k the embedding family uses — the
    * text→vector bridge, end-to-end oracled (dense 64-bucket vectors
    * rebuilt via a scaffold join, identical index-order cosine).
    */
  val knnTextHashTf = Q("q_knn_text_hashtf",
    (s, dir) => {
      val tf = Text.hashingTfVector(Tables.documents(s, dir), "doc_id", "text", dim = 64)
      Similarity.bruteForceTopK(
        tf.filter(col("doc_id") < 16), tf, "doc_id", "tf", "doc_id", "tf", k = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 9).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH toks AS (
              SELECT doc_id, UNNEST(LIST_FILTER(
                STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                x -> x <> '')) AS t
              FROM documents),
            cnts AS (
              SELECT doc_id, ('0x' || SUBSTR(MD5(t), 1, 15))::BIGINT % 64 AS b,
                     COUNT(*) AS cnt
              FROM toks GROUP BY 1, 2),
            cells AS (
              SELECT d.doc_id, r.i, COALESCE(c.cnt, 0) AS v
              FROM (SELECT DISTINCT doc_id FROM documents) d
              CROSS JOIN RANGE(0, 64) r(i)
              LEFT JOIN cnts c ON c.doc_id = d.doc_id AND c.b = r.i),
            tf AS (SELECT doc_id, LIST(CAST(v AS DOUBLE) ORDER BY i) AS tf
                   FROM cells GROUP BY doc_id),
            scored AS (
              SELECT q.doc_id AS query_id, e.doc_id AS neighbor_id,
                     CASE WHEN LIST_INNER_PRODUCT(q.tf, q.tf) > 0
                           AND LIST_INNER_PRODUCT(e.tf, e.tf) > 0
                          THEN LIST_INNER_PRODUCT(q.tf, e.tf)
                               / (SQRT(LIST_INNER_PRODUCT(q.tf, q.tf))
                                  * SQRT(LIST_INNER_PRODUCT(e.tf, e.tf))) END AS cos
              FROM tf q JOIN tf e ON e.doc_id <> q.doc_id
              WHERE q.doc_id < 16)
            SELECT query_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC NULLS LAST, neighbor_id) AS INTEGER) AS rank,
              neighbor_id, ROUND(cos, 9) AS cosine
            FROM scored
            QUALIFY rank <= 3
            ORDER BY query_id, rank"""))

  val all: Seq[Q] = Seq(knnBrute, knnIvf, knnLsh, knnPq, knnIvfPq, knnSq8, embedCenter, knnRp, knnRecallReport, textHashingTf, knnTextHashTf)
}
