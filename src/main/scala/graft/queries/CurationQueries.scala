package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{Bpe, Corpus, Dedup, Graph, Layout, Multimodal, Similarity, Text, Unigram}

/** Correctness-gate queries for the training-data-curation operator set
  * (dedup / similarity search / text analysis / multimodal plumbing) over
  * `documents` and `embeddings`.
  *
  * Hash-based candidate generators (MinHash-LSH, SimHash, hyperplane LSH)
  * have no cross-engine SQL equivalent — their exact-verified outputs are
  * compared against exact all-pairs oracles where recall allows, otherwise
  * registered without an oracle (driver falls back to rows-only checks).
  */
object CurationQueries {

  /** Exact dedup by normalized-text digest; survivors = min doc_id per
    * digest. One shuffle of (digest, id) pairs — text never shuffles.
    */
  val dedupExact = Q("q_dedup_exact",
    (s, dir) =>
      Dedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
        .select("doc_id", "source")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, source FROM documents
            WHERE doc_id IN (
              SELECT MIN(doc_id) FROM documents
              GROUP BY TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')))
            ORDER BY doc_id"""))

  /** Incremental exact dedup: odd doc_ids arrive as a new batch, even
    * doc_ids are the already-ingested corpus — keep odd docs novel both
    * within the batch and against the even corpus. The existing side
    * contributes only distinct digests to the anti-join.
    */
  private val incrementalOracleSql =
    """WITH norm AS (
              SELECT doc_id, lang, source,
                     TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS ntext
              FROM documents),
            inc AS (SELECT * FROM norm WHERE doc_id % 2 = 1),
            ex AS (SELECT DISTINCT ntext FROM norm WHERE doc_id % 2 = 0),
            keep AS (
              SELECT * FROM inc WHERE doc_id IN (
                SELECT MIN(doc_id) FROM inc GROUP BY ntext))
            SELECT doc_id, lang, source FROM keep
            WHERE ntext NOT IN (SELECT ntext FROM ex)
            ORDER BY doc_id"""

  val dedupIncremental = Q("q_dedup_incremental",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.exactDedupIncremental(
        d.filter(col("doc_id") % 2 === 1),
        d.filter(col("doc_id") % 2 === 0),
        "text", "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },
    Some(incrementalOracleSql))

  /** Bloom-accelerated twin of [[dedupIncremental]] — EXACT result under
    * the SAME oracle: a bloom miss is definitively novel (no false
    * negatives skip the history entirely), and the bloom-positive
    * residue gets the exact digest check via a broadcast-semi scan of
    * the history — which is read but never shuffled, the 100 TB
    * per-batch saving over the plain anti-join.
    */
  val dedupIncrementalBloom = Q("q_dedup_incremental_bloom",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val existing = d.filter(col("doc_id") % 2 === 0)
      Dedup.exactDedupIncrementalBloom(
        d.filter(col("doc_id") % 2 === 1), existing, "text", "doc_id",
        Dedup.buildDigestBloom(existing, "text"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },
    Some(incrementalOracleSql))

  /** The bloom path in ITS regime — history ≫ batch, bloom built ONCE
    * and reused across many batches, MOST of which are all-novel (the
    * healthy-crawl shape): the corpus amplified 20× plays the ingested
    * history (10k docs at sf0.01, 100k at sf0.1), and six batches screen
    * against one prebuilt low-fpp filter — only batch 0 carries planted
    * history dups; batches 1-5 are entirely novel. The bloom's payoff is
    * that an all-novel batch realizes an EMPTY residue and never reads
    * the history at all (see exactDedupIncrementalBloom's short-circuit)
    * — so the whole run pays two Θ(history) passes (build + batch 0's
    * residue scan) where [[dedupIncrementalReusePlain]] pays six passes
    * plus six digest-distinct shuffles. Same exact-result contract as
    * every incremental gate: the oracle recomputes each batch's keep set
    * relationally, blind to which path produced it.
    */
  private def reuseOracleSql =
    """WITH norm AS (
              SELECT doc_id, lang, source,
                     TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS ntext
              FROM documents),
            hist AS (
              SELECT DISTINCT ntext || ' v' || i AS ntext
              FROM norm, RANGE(0, 20) r(i)),
            batches AS (
              SELECT b, doc_id, lang, source,
                     CASE WHEN b = 0 AND doc_id % 10 = 0 THEN ntext || ' v0'
                          ELSE ntext || ' b' || b END AS ntext
              FROM norm, RANGE(0, 6) rb(b)),
            keep AS (
              SELECT bt.* FROM batches bt
              JOIN (SELECT b, ntext, MIN(doc_id) AS mid
                    FROM batches GROUP BY b, ntext) m
                ON bt.b = m.b AND bt.ntext = m.ntext AND bt.doc_id = m.mid)
            SELECT b::INTEGER AS batch, doc_id, lang, source FROM keep
            WHERE ntext NOT IN (SELECT ntext FROM hist)
            ORDER BY batch, doc_id"""

  private def reuseHistory(d: org.apache.spark.sql.DataFrame) =
    (0 until 20).map(i => d.select(
      (col("doc_id") + lit(100000L * (i + 1))).as("doc_id"),
      concat(col("text"), lit(s" v$i")).as("text"),
      col("lang"), col("source"))).reduce(_ unionByName _)

  private def reuseBatch(d: org.apache.spark.sql.DataFrame, b: Int) =
    d.select(col("doc_id"),
      when(lit(b) === 0 && col("doc_id") % 10 === 0,
        concat(col("text"), lit(" v0")))
        .otherwise(concat(col("text"), lit(s" b$b"))).as("text"),
      col("lang"), col("source"))

  val dedupIncrementalReuseBloom = Q("q_dedup_incremental_reuse_bloom",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      // checkpoint = the persisted corpus table both twins read (at scale
      // this is a stored stage table, not a 20-way recompute per scan)
      val history = reuseHistory(d).localCheckpoint(true)
      // sizing from row counts (20 amplified copies) skips the
      // distinct-count scan. fpp is sized to the SHORT-CIRCUIT RULE, not
      // the usual residue-rate rule: an all-novel batch skips the history
      // entirely only when it realizes ZERO false positives, i.e.
      // E[FP] = |batch|·fpp ≪ 1 ⇒ fpp ≲ 0.01/|batch|. At fpp 1e-4 a
      // 150k-row batch expects ~15 FPs and EVERY batch re-paid the
      // history scan (measured — the bloom twin lost to plain); at 1e-8
      // the five all-novel batches skip it with P ≈ 0.999. The price is
      // ~4× bits (38 vs 9.6 bits/item): ~4.5 GB per 10⁹ docs vs ~1.2 GB
      // at 1% — the right trade whenever batches are large and mostly
      // novel, which is exactly this regime.
      val bloom = Dedup.buildDigestBloom(history, "text",
        expectedItems = 20L * d.count(), fpp = 1e-8)
      // each batch LANDS (checkpoint = the stage-table append) before the
      // next is screened — the sequential-ingestion regime both twins
      // model; see dedupIncrementalReusePlain for why this matters there
      (0 until 6).map { b =>
        Dedup.exactDedupIncrementalBloom(reuseBatch(d, b), history,
          "text", "doc_id", bloom)
          .select(lit(b).as("batch"), col("doc_id"), col("lang"), col("source"))
          .localCheckpoint(true)
      }.reduce(_ unionByName _).orderBy("batch", "doc_id")
    },
    Some(reuseOracleSql))

  /** Plain-anti-join twin of [[dedupIncrementalReuseBloom]] on the SAME
    * history/batches — the number that shows what the bloom buys: every
    * batch, all-novel or not, re-pays the full history scan, digest
    * distinct and shuffle anti-join.
    *
    * Both twins land each batch (eager checkpoint) before screening the
    * next — the sequential-ingestion regime, where batch N is in the
    * stage table before batch N+1 exists. Without it this twin collapses
    * into ONE action whose six identical history-digest-distinct
    * subtrees Spark de-duplicates via ReuseExchange — i.e. it would
    * measure the all-batches-at-once regime, where incremental
    * screening is the wrong tool in the first place (union the batches
    * and run one [[graft.ops.Dedup.exactDedup]]).
    */
  val dedupIncrementalReusePlain = Q("q_dedup_incremental_reuse_plain",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val history = reuseHistory(d).localCheckpoint(true)
      (0 until 6).map { b =>
        Dedup.exactDedupIncremental(reuseBatch(d, b), history, "text", "doc_id")
          .select(lit(b).as("batch"), col("doc_id"), col("lang"), col("source"))
          .localCheckpoint(true)
      }.reduce(_ unionByName _).orderBy("batch", "doc_id")
    },
    Some(reuseOracleSql))

  /** Benchmark decontamination screen: doc_id % 4 == 0 plays the
    * benchmark set, the rest are training docs; flag trainers sharing
    * ≥ 2 distinct word-3-shingles with any benchmark doc. (Real
    * decontamination uses n ≈ 8-13; the short synthetic docs need n = 3
    * for a non-trivial hit set.)
    */
  val dedupDecontaminate = Q("q_dedup_decontaminate",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.contaminatedIds(
        d.filter(col("doc_id") % 4 =!= 0),
        d.filter(col("doc_id") % 4 === 0),
        "text", "doc_id", n = 3, minShared = 2L)
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, UNNEST(shingles) AS g FROM sh),
            bench AS (SELECT DISTINCT g FROM idx WHERE doc_id % 4 = 0)
            SELECT i.doc_id, COUNT(*) AS n_shared
            FROM idx i JOIN bench b ON i.g = b.g
            WHERE i.doc_id % 4 <> 0
            GROUP BY i.doc_id
            HAVING COUNT(*) >= 2
            ORDER BY doc_id"""))

  /** Containment-decontamination twin of [[dedupDecontaminate]]: emit
    * (train, bench, containment) pairs where ≥ 60% of the benchmark
    * doc's distinct 3-shingles appear in the training doc.
    */
  val dedupContainment = Q("q_dedup_containment",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.benchmarkContainment(
        d.filter(col("doc_id") % 4 =!= 0),
        d.filter(col("doc_id") % 4 === 0),
        "text", "doc_id", n = 3, minContainment = 0.6)
        .select(col("train_id"), col("bench_id"),
          round(col("containment"), 9).as("containment"))
        .orderBy("train_id", "bench_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, LEN(shingles) AS nsh, UNNEST(shingles) AS g FROM sh)
            SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
              ROUND(CAST(COUNT(*) AS DOUBLE) / b.nsh, 9) AS containment
            FROM idx t JOIN idx b ON t.g = b.g
            WHERE t.doc_id % 4 <> 0 AND b.doc_id % 4 = 0
            GROUP BY t.doc_id, b.doc_id, b.nsh
            HAVING CAST(COUNT(*) AS DOUBLE) / b.nsh >= 0.6
            ORDER BY train_id, bench_id"""))

  /** Incremental NEAR-dup screen: odd doc_ids arrive as the new batch,
    * even ids are the ingested corpus — keep odd docs that survive
    * within-batch near-dup clustering and match no even doc at
    * jaccard ≥ 0.2. The oracle re-derives both halves relationally:
    * the recursive-CTE closure restricted to the batch, then a bipartite
    * jaccard screen of survivors against the corpus.
    */
  val dedupIncrementalNear = Q("q_dedup_incremental_neardup",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.nearDupIncremental(
        d.filter(col("doc_id") % 2 === 1),
        d.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", n = 3, threshold = 0.2)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },
    Some("""WITH RECURSIVE
            toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, LEN(shingles) AS ns, UNNEST(shingles) AS g FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id
              WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
              GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
              HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.2),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (
              SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
            losers AS (SELECT id FROM labels WHERE label <> id),
            surv AS (
              SELECT doc_id FROM documents
              WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT id FROM losers)),
            crosshit AS (
              SELECT a.doc_id
              FROM idx a JOIN idx b ON a.g = b.g
              WHERE a.doc_id IN (SELECT doc_id FROM surv) AND b.doc_id % 2 = 0
              GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
              HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.2)
            SELECT doc_id, lang FROM documents
            WHERE doc_id IN (SELECT doc_id FROM surv)
              AND doc_id NOT IN (SELECT doc_id FROM crosshit)
            ORDER BY doc_id"""))

  /** Incremental MINHASH-BANDED near-dup screen — the same split and
    * semantics as [[dedupIncrementalNear]] (odd ids = batch, even =
    * corpus) but candidates come from the persisted band index instead
    * of the shingle inverted index, and the verify runs on per-doc
    * hashed shingle sets. Threshold 0.5 with 64×2 banding: the oracle is
    * the EXACT all-pairs definition, valid because a true pair at
    * j ≥ 0.5 escapes all 64 bands with p = (1-0.25)^64 ≈ 1e-8 (the same
    * argument as [[dedupMinhash]]; equality verified empirically at
    * every gate SF, deterministic while the corpus generator is fixed).
    */
  val dedupIncrementalMinhash = Q("q_dedup_incremental_minhash",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.minhashIncremental(
        d.filter(col("doc_id") % 2 === 1),
        d.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", n = 3, bands = 64, rowsPerBand = 2,
        threshold = 0.5)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },
    Some("""WITH RECURSIVE
            toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, LEN(shingles) AS ns, UNNEST(shingles) AS g FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id
              WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
              GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
              HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.5),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (
              SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
            losers AS (SELECT id FROM labels WHERE label <> id),
            surv AS (
              SELECT doc_id FROM documents
              WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT id FROM losers)),
            crosshit AS (
              SELECT a.doc_id
              FROM idx a JOIN idx b ON a.g = b.g
              WHERE a.doc_id IN (SELECT doc_id FROM surv) AND b.doc_id % 2 = 0
              GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
              HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.5)
            SELECT doc_id, lang FROM documents
            WHERE doc_id IN (SELECT doc_id FROM surv)
              AND doc_id NOT IN (SELECT doc_id FROM crosshit)
            ORDER BY doc_id"""))

  /** Exact duplicated-substring screen at 8-token granularity: per doc,
    * how many sliding 8-token spans occur ≥2 times corpus-wide. The
    * oracle recomputes the identical definition relationally (span text
    * as the group key — Spark groups on the span's xxhash64, equivalent
    * modulo 64-bit collisions, deterministic either way). Fractions are
    * rounded to 9 decimals on both sides: one double division, same
    * operand order, but pinning the printed representation is free.
    */
  val dedupSubstring = Q("q_dedup_substring",
    (s, dir) =>
      Dedup.duplicatedSpanStats(Tables.documents(s, dir), "text", "doc_id", k = 8)
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
          round(col("dup_span_fraction"), 9).as("dup_span_fraction"))
        .orderBy("doc_id"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            spans AS (
              SELECT doc_id, ARRAY_TO_STRING(t[s + 1 : s + 8], ' ') AS span
              FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t) - 8 + 1)) AS s
                    FROM toks WHERE LEN(t) >= 8)),
            cnt AS (SELECT span, COUNT(*) AS occ FROM spans GROUP BY span),
            per AS (
              SELECT doc_id, COUNT(*) AS n_spans,
                     SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS n_dup
              FROM spans JOIN cnt USING (span) GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(COALESCE(per.n_spans, 0) AS BIGINT) AS n_spans,
              CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup_spans,
              CASE WHEN COALESCE(per.n_spans, 0) > 0
                   THEN ROUND(CAST(per.n_dup AS DOUBLE) / per.n_spans, 9)
                   ELSE 0.0 END AS dup_span_fraction
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id"""))

  /** Duplicated-substring removal at 8-token spans: non-canonical
    * occurrences (window rank ≥ 2 over (doc_id, start) per span) are cut
    * and the survivors re-joined. The oracle rebuilds each document by
    * anti-joining token positions against the removal set and
    * re-aggregating in position order.
    */
  val dedupSubstringStrip = Q("q_dedup_substring_strip",
    (s, dir) =>
      Dedup.stripDuplicatedSpans(Tables.documents(s, dir), "text", "doc_id", k = 8)
        .orderBy("doc_id"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            spans AS (
              SELECT doc_id, s, ARRAY_TO_STRING(t[s + 1 : s + 8], ' ') AS span
              FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t) - 8 + 1)) AS s
                    FROM toks WHERE LEN(t) >= 8)),
            marked AS (
              SELECT doc_id, s,
                     ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, s) AS rn
              FROM spans),
            rem AS (
              SELECT DISTINCT doc_id, s + r.u AS pos
              FROM marked CROSS JOIN range(0, 8) r(u)
              WHERE rn >= 2),
            kept AS (
              SELECT p.doc_id, p.pos, p.t[p.pos + 1] AS tok
              FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t))) AS pos FROM toks) p
              LEFT JOIN rem ON p.doc_id = rem.doc_id AND p.pos = rem.pos
              WHERE rem.doc_id IS NULL),
            agg AS (
              SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY pos) AS clean_text,
                     COUNT(*) AS n_kept
              FROM kept GROUP BY doc_id)
            SELECT tk.doc_id,
              COALESCE(a.clean_text, '') AS clean_text,
              CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
              CAST(LEN(tk.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
            FROM toks tk LEFT JOIN agg a ON tk.doc_id = a.doc_id
            ORDER BY tk.doc_id"""))

  /** Both line-granularity gates run on a synthesized MULTI-LINE corpus:
    * each document's tokens re-chunked into 12-token lines plus one
    * planted boilerplate footer line shared by every document (the
    * single-line driver corpus would make the ops trivially no-op). The
    * oracle recomputes the identical re-chunking relationally, so the
    * synthesis itself is under the hash check too.
    */
  private def multilineDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      concat(
        array_join(transform(
          Text.tokenChunks(Text.tokens(col("text")), 12, 12),
          c => c.getField("chunk_text")), "\n"),
        lit("\nvisit our sponsor at example dot com")).as("text"))

  private val multilineSql: String =
    """base AS (
         SELECT doc_id,
                CONCAT(
                  ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(0, CAST(CEIL(LEN(t)/12.0) AS BIGINT)),
                    g -> ARRAY_TO_STRING(t[g*12+1 : g*12+12], ' ')), chr(10)),
                  chr(10), 'visit our sponsor at example dot com') AS text
         FROM (SELECT doc_id,
                      LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                        x -> LEN(x) > 0) AS t
               FROM documents))"""

  /** Line-granularity duplication screen (CCNet/RefinedWeb paragraph
    * diagnostic): per doc, how many non-blank normalized lines occur ≥2
    * times corpus-wide. The planted footer guarantees every doc carries
    * at least one duplicated line.
    */
  val dedupLineStats = Q("q_dedup_line_stats",
    (s, dir) =>
      Dedup.duplicatedLineStats(multilineDocs(s, dir), "text", "doc_id")
        .orderBy("doc_id"),
    Some(s"""WITH $multilineSql,
            l0 AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, chr(10))) AS line FROM base),
            ne AS (SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(line), '\\s+', ' ', 'g')) AS nline
                   FROM l0
                   WHERE LEN(TRIM(REGEXP_REPLACE(LOWER(line), '\\s+', ' ', 'g'))) > 0),
            occ AS (SELECT nline, COUNT(*) AS c FROM ne GROUP BY nline),
            per AS (SELECT doc_id, COUNT(*) AS n_lines,
                           CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines
                    FROM ne JOIN occ USING (nline) GROUP BY doc_id)
            SELECT b.doc_id,
              COALESCE(per.n_lines, 0) AS n_lines,
              COALESCE(per.n_dup_lines, 0) AS n_dup_lines,
              CASE WHEN COALESCE(per.n_lines, 0) > 0
                   THEN CAST(per.n_dup_lines AS DOUBLE) / per.n_lines
                   ELSE 0.0 END AS dup_line_fraction
            FROM base b LEFT JOIN per ON b.doc_id = per.doc_id
            ORDER BY b.doc_id"""))

  /** Keep-first line-level dedup (CCNet paragraph removal): every
    * non-blank line survives only at its first corpus occurrence in
    * (doc_id, position) order — the planted footer survives in exactly
    * one document. The oracle rebuilds each document by dropping
    * window-rank ≥ 2 line occurrences and re-aggregating in position
    * order.
    */
  val dedupLineStrip = Q("q_dedup_line_strip",
    (s, dir) =>
      Dedup.stripDuplicatedLines(multilineDocs(s, dir), "text", "doc_id")
        .orderBy("doc_id"),
    Some(s"""WITH $multilineSql,
            arr AS (SELECT doc_id, STRING_SPLIT(text, chr(10)) AS l FROM base),
            pos AS (SELECT doc_id, UNNEST(RANGE(1, LEN(l) + 1)) AS i, l FROM arr),
            lines AS (SELECT doc_id, i - 1 AS p, l[i] AS line,
                             TRIM(REGEXP_REPLACE(LOWER(l[i]), '\\s+', ' ', 'g')) AS nline
                      FROM pos),
            marked AS (
              SELECT doc_id, p, line,
                     CASE WHEN LEN(nline) > 0 THEN
                       ROW_NUMBER() OVER (PARTITION BY nline ORDER BY doc_id, p) END AS rn
              FROM lines),
            kept AS (SELECT doc_id, p, line FROM marked WHERE rn IS NULL OR rn = 1)
            SELECT m.doc_id,
              COALESCE((SELECT STRING_AGG(k.line, chr(10) ORDER BY k.p)
                        FROM kept k WHERE k.doc_id = m.doc_id), '') AS clean_text,
              COUNT(*) AS n_lines,
              CAST(SUM(CASE WHEN rn >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed_lines
            FROM marked m GROUP BY m.doc_id ORDER BY m.doc_id"""))

  /** Word-3-gram Jaccard near-dup pairs via inverted shingle index
    * (never all-pairs). Oracle recomputes the same definition
    * relationally in DuckDB.
    */
  val dedupJaccard = Q("q_dedup_ngram_jaccard",
    (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "text", "doc_id",
        n = 3, threshold = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("jaccard"))
        .orderBy("id_a", "id_b"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (
              SELECT doc_id, LEN(shingles) AS nsh, UNNEST(shingles) AS s FROM sh)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              ROUND(CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)), 9) AS jaccard
            FROM idx a JOIN idx b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
            HAVING CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) >= 0.2
            ORDER BY id_a, id_b"""))

  /** Planted variant corpus for the edit-distance gates, built to scale
    * LINEARLY so the bench's 10×/30× sections measure the operator, not
    * the corpus shape. Three deliberate choices, each fixing a measured
    * super-linearity:
    *
    *   - COUNT-DERIVED MODULI (G = max(50, n/10), V = max(10, n/50)):
    *     docs-per-group stays constant as n grows. A fixed G=50 made the
    *     corpus quadratic by construction — 1000 identical docs per
    *     group at sf1, 241 s (28× on 10× data).
    *   - BASE64 BODIES: group bodies draw from a 64-char alphabet
    *     (base64 of the md5 BYTES), 260k possible 3-grams, so gram
    *     document frequency stays ~flat as groups multiply. Hex bodies
    *     saturate their 4096-gram space and df grows ∝ n — the
    *     candidate join went Σ df² ≈ n²/4096 (396 s at sf30). The
    *     constant '==' padding tail is corpus-frequent BY DESIGN: the
    *     rarity prefix must keep it out of every prefix, same as a
    *     crawl's boilerplate head.
    *   - SPARSE MICRO-VOCAB past the first ten: values 'id0'…'id9'
    *     keep the dense cross-value ed≤2 coverage at gate scale, but
    *     additional values are 5-hex md5 prefixes — random pairs sit at
    *     ed 3+ — because numeric suffixes put EVERY value pair within
    *     two substitutions and the short route's output went quadratic
    *     in V.
    *
    * At the sf0.01 gate size the moduli reduce to the fixed 50/10 and
    * only the body spelling differs from the original plant; the oracle
    * replays the identical expression chain.
    */
  private def editDistPlanted(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.documents(s, dir).count()
    val bigG = math.max(50L, n / 10)
    val vocab = math.max(10L, n / 50)
    val g = pmod(col("doc_id"), lit(bigG))
    val v = pmod(floor(col("doc_id") / lit(bigG)).cast(LongType), lit(5))
    val gv = pmod(g, lit(vocab))
    val short = when(gv < 10, concat(lit("id"), pmod(gv, lit(10)).cast(StringType)))
      .otherwise(concat(lit("i"), substring(md5(gv.cast(StringType)), 1, 5)))
    Tables.documents(s, dir).select(col("doc_id"),
      when(v === 4, short)
        .otherwise(concat(lit("doc "), base64(unhex(md5(g.cast(StringType)))),
          when(v === 1, lit("x")).when(v === 2, lit("xy"))
            .when(v === 3, lit("xyz")).otherwise(lit("")))).as("s"))
  }

  /** The matching oracle CTE (`strs`): same count-derived moduli. */
  private val editDistStrsSql: String =
    """cnt AS (SELECT GREATEST(50, COUNT(*) // 10) AS g_mod,
                      GREATEST(10, COUNT(*) // 50) AS v_mod
               FROM documents),
            strs AS (
              SELECT doc_id,
                CASE WHEN CAST(FLOOR(doc_id / g_mod) AS BIGINT) % 5 = 4
                     THEN CASE WHEN (doc_id % g_mod) % v_mod < 10
                          THEN 'id' || CAST(((doc_id % g_mod) % v_mod) % 10 AS VARCHAR)
                          ELSE 'i' || SUBSTR(MD5(CAST((doc_id % g_mod) % v_mod AS VARCHAR)), 1, 5)
                          END
                     ELSE 'doc ' || BASE64(UNHEX(MD5(CAST(doc_id % g_mod AS VARCHAR)))) ||
                          CASE CAST(FLOOR(doc_id / g_mod) AS BIGINT) % 5
                            WHEN 1 THEN 'x' WHEN 2 THEN 'xy'
                            WHEN 3 THEN 'xyz' ELSE '' END
                END AS s
              FROM documents CROSS JOIN cnt)"""

  /** Bounded edit-distance pairs ([[graft.ops.Dedup.editDistancePairs]]):
    * every unordered pair within Levenshtein distance 2, via the
    * positional-q-gram count filter for long strings and the
    * distinct-value route for micro-strings. The planted column drives
    * every branch: per-group md5 bodies keep grams group-local (the
    * cross-group false candidates die at the count filter), suffix
    * variants x/xy/xyz sit at distances 1/2/3 so the threshold cuts
    * between xy and xyz, the length band (|Δlen| ≤ 2) excludes v0–v3
    * before any DP runs, and the 'idN' micro-strings (distance 0 within
    * a value, 1 across values) exercise the value-level join and its
    * output-sized id expansion. The oracle computes the all-pairs
    * DEFINITION over distinct values — deliberately not the operator's
    * candidate route, so the count-filter completeness claim is what the
    * gate actually tests.
    */
  val dedupEditDist = Q("q_dedup_editdist_pairs",
    (s, dir) =>
      Dedup.editDistancePairs(editDistPlanted(s, dir), "s", "doc_id",
        maxDist = 2, q = 3)
        .select(col("id_a"), col("id_b"), col("dist").cast(LongType))
        .orderBy("id_a", "id_b"),
    Some(s"""WITH $editDistStrsSql,
            vals AS (SELECT DISTINCT s FROM strs),
            vp AS (
              SELECT a.s AS sa, b.s AS sb, LEVENSHTEIN(a.s, b.s) AS dist
              FROM vals a JOIN vals b
                ON a.s <= b.s AND ABS(LENGTH(a.s) - LENGTH(b.s)) <= 2
              WHERE LEVENSHTEIN(a.s, b.s) <= 2)
            SELECT LEAST(x.doc_id, y.doc_id) AS id_a,
                   GREATEST(x.doc_id, y.doc_id) AS id_b, vp.dist
            FROM vp JOIN strs x ON x.s = vp.sa
                    JOIN strs y ON y.s = vp.sb
            WHERE x.doc_id <> y.doc_id
              AND (vp.sa <> vp.sb OR x.doc_id < y.doc_id)
            ORDER BY id_a, id_b"""))

  /** Edit-distance keep-one ([[graft.ops.Dedup.editDistanceSurvivors]]):
    * variant clusters from the same planted column as
    * `q_dedup_editdist_pairs` collapse to their minimum id — the long
    * groups chain v0–v1–v2–v3 through ≤2-distance links, and the whole
    * micro-string vocabulary ('id0'…'id9', all within one substitution)
    * forms a single corpus-wide cluster. The oracle recomputes the pair
    * DEFINITION, closes it transitively with a recursive CTE, and keeps
    * non-losers.
    */
  val dedupEditDistKeep = Q("q_dedup_editdist_keep",
    (s, dir) =>
      Dedup.editDistanceSurvivors(editDistPlanted(s, dir), "s", "doc_id",
        maxDist = 2, q = 3)
        .orderBy("doc_id"),
    Some(s"""WITH $editDistStrsSql,
            vals AS (SELECT DISTINCT s FROM strs),
            vp AS (
              SELECT a.s AS sa, b.s AS sb
              FROM vals a JOIN vals b
                ON a.s <= b.s AND ABS(LENGTH(a.s) - LENGTH(b.s)) <= 2
              WHERE LEVENSHTEIN(a.s, b.s) <= 2),
            pairs AS (
              SELECT LEAST(x.doc_id, y.doc_id) AS id_a,
                     GREATEST(x.doc_id, y.doc_id) AS id_b
              FROM vp JOIN strs x ON x.s = vp.sa
                      JOIN strs y ON y.s = vp.sb
              WHERE x.doc_id <> y.doc_id
                AND (vp.sa <> vp.sb OR x.doc_id < y.doc_id)),
            ed AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
            nodes AS (SELECT DISTINCT a AS n FROM ed),
            reach AS (
              WITH RECURSIVE r(n, m) AS (
                SELECT n, n FROM nodes
                UNION
                SELECT r.n, ed.b FROM r JOIN ed ON ed.a = r.m)
              SELECT n, MIN(m) AS label FROM r GROUP BY n),
            losers AS (SELECT n FROM reach WHERE label <> n)
            SELECT doc_id, s FROM strs
            WHERE doc_id NOT IN (SELECT n FROM losers)
            ORDER BY doc_id"""))

  /** MinHash(128) + LSH(64 bands × 2 rows) candidate pairs over word-3
    * shingles, verified with exact Jaccard ≥ 0.5. Banding chosen for
    * near-certain recall at the threshold (miss prob (1-j²)⁶⁴ ≈ 1e-8 at
    * j=0.5), so the verified output equals the exact all-pairs definition
    * — which is what the oracle computes relationally.
    */
  val dedupMinhash = Q("q_dedup_minhash_lsh",
    (s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), "text", "doc_id",
        n = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("jaccard"))
        .orderBy("id_a", "id_b"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, LEN(shingles) AS ns, UNNEST(shingles) AS g FROM sh)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              ROUND(CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)), 9) AS jaccard
            FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
            HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.5
            ORDER BY id_a, id_b"""))

  /** Planner-driven twin of [[dedupMinhash]]: (bands, rowsPerBand) come
    * from [[graft.ops.Dedup.planMinhashLsh]] at the ACTUAL corpus size
    * (the 100 TB path — fixed banding at a growing corpus is the
    * quadratic trap the r6 sf30 section measured on the cosine family).
    * The oracle is the EXACT all-pairs Jaccard definition: at the gate
    * corpora the planner's targetRecall=0.98 banding misses a
    * threshold-j pair with p=(1-0.5^r)^b ≈ 2e-2 — but every true pair in
    * these corpora is a planted near-identical dup far above threshold
    * (j ≥ 0.6 ⇒ miss ≤ 1.4e-5/pair), and the whole path is seeded-hash
    * deterministic, so equality was verified empirically at
    * sf0.001/0.01/0.1 and cannot drift while the corpus generator is
    * fixed.
    */
  val dedupMinhashAuto = Q("q_dedup_minhash_lsh_auto",
    (s, dir) =>
      Dedup.minhashLshPairsAuto(Tables.documents(s, dir), "text", "doc_id",
        n = 3, threshold = 0.5, targetRecall = 0.98)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("jaccard"))
        .orderBy("id_a", "id_b"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, LEN(shingles) AS ns, UNNEST(shingles) AS g FROM sh)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              ROUND(CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)), 9) AS jaccard
            FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
            HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.5
            ORDER BY id_a, id_b"""))

  /** SimHash(64-bit) near-dup pairs within hamming distance 3 via 16-bit
    * chunk bucketing (pigeonhole-complete for d ≤ 3). The gate runs the
    * md5-token-hash variant (Spark md5 ≡ DuckDB md5) so the ENTIRE pair
    * list is oracled: the SQL rebuilds each 64-bit signature from
    * per-token md5 halves with the same per-bit majority vote, then takes
    * all pairs at bit_count(xor) ≤ 3 — bucketing completeness means the
    * chunked Spark path must emit exactly the all-pairs answer. The
    * xxhash64 variant (the fused-expression scale path) stays covered by
    * DedupSpec's bit-parity + pigeonhole tests.
    */
  val dedupSimhash = Q("q_dedup_simhash",
    (s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "text", "doc_id",
        maxHamming = 3, tokenHash = "md5")
        .orderBy("id_a", "id_b"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     UNNEST(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ')) AS tok
              FROM documents),
            h AS (
              SELECT doc_id,
                     ('0x' || SUBSTR(MD5(tok), 1, 8))::BIGINT AS hi,
                     ('0x' || SUBSTR(MD5(tok), 9, 8))::BIGINT AS lo
              FROM toks WHERE LEN(tok) > 0),
            votes AS (
              SELECT doc_id, j,
                CASE WHEN SUM(CASE WHEN ((CASE WHEN j < 32 THEN lo >> j
                                               ELSE hi >> (j - 32) END) & 1) = 1
                             THEN 1 ELSE -1 END) > 0
                     THEN POWER(2, j)::HUGEINT ELSE 0::HUGEINT END AS bitval
              FROM h CROSS JOIN GENERATE_SERIES(0, 63) AS g(j)
              GROUP BY doc_id, j),
            sigv AS (SELECT doc_id, SUM(bitval) AS sig FROM votes GROUP BY doc_id),
            -- total over the corpus: a doc that normalizes to ZERO tokens
            -- casts no votes and signs 0, exactly as the Spark majority
            -- vote does (two empty docs are a hamming-0 pair); null text
            -- hashes null on the Spark side and never pairs, so it stays
            -- excluded here too
            sig AS (
              SELECT d.doc_id, COALESCE(s.sig, 0::HUGEINT) AS sig
              FROM documents d LEFT JOIN sigv s ON s.doc_id = d.doc_id
              WHERE d.text IS NOT NULL)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   BIT_COUNT(XOR(a.sig, b.sig))::INTEGER AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE BIT_COUNT(XOR(a.sig, b.sig)) <= 3
            ORDER BY id_a, id_b"""))

  /** Embedding-cosine near-dup pairs, exact all-pairs path (the oracle
    * definition); the LSH-bucketed scale path is exercised by
    * [[dedupCosineLsh]].
    */
  val dedupCosine = Q("q_dedup_embed_cosine",
    (s, dir) =>
      // 0.45 sits inside the corpus' actual similarity range (max ≈ 0.5-0.6)
      // so the result is non-trivial at every scale factor
      Dedup.cosineDupPairs(Tables.embeddings(s, dir), "embedding", "vec_id",
        threshold = 0.45, lshBits = 0)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("cosine"))
        .orderBy("id_a", "id_b"),
    Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 9) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.45
            ORDER BY id_a, id_b"""))

  /** Embedding-space decontamination: vec_id % 10 == 0 plays the
    * benchmark suite, the rest are training vectors; flag every trainer
    * within cosine 0.45 of any benchmark vector with its worst (max)
    * similarity and distinct-hit count. Exact mode (benchmark broadcast,
    * one scan of the training side) — the mode a real benchmark-sized
    * screen runs; the LSH mode for corpus-sized screening sides is
    * recall-gated in DedupSpec against this exact path.
    */
  val dedupDecontaminateEmbed = Q("q_dedup_decontaminate_embed",
    (s, dir) => {
      val v = Tables.embeddings(s, dir)
      Dedup.contaminatedIdsEmbedding(
        v.filter(col("vec_id") % 10 =!= 0), v.filter(col("vec_id") % 10 === 0),
        "embedding", "vec_id", threshold = 0.4)
        .select(col("vec_id"), round(col("max_cosine"), 9).as("max_cosine"),
          col("n_bench_hits"))
        .orderBy("vec_id")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            hits AS (
              SELECT t.vec_id, LIST_COSINE_SIMILARITY(t.e, b.e) AS c
              FROM v t JOIN v b ON t.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
              WHERE LIST_COSINE_SIMILARITY(t.e, b.e) >= 0.4)
            SELECT vec_id, ROUND(MAX(c), 9) AS max_cosine,
                   COUNT(*) AS n_bench_hits
            FROM hits GROUP BY vec_id ORDER BY vec_id"""))

  /** Hyperplane-LSH bucketed variant of cosine dedup — the 100 TB path
    * (candidates within any of 16 independent 4-bit bucket tables;
    * OR-amplified recall 1-(1-p⁴)¹⁶ ≈ 0.95 even at the 0.45 threshold's
    * p ≈ 0.65 per-plane agreement, vs ≈ 3% for a single 8-bit signature).
    *
    * FULLY oracled despite being an LSH path: the gate runs md5-derived
    * plane weights (reproducible in DuckDB), and the oracle rebuilds
    * every (table, bucket) signature — LIST_INNER_PRODUCT accumulates
    * the projection in index order, bit-identical to the expression's
    * sequential double adds — then takes within-bucket pairs and
    * verifies exact cosine, i.e. the complete LSH definition, not just
    * its output shape. Recall vs the exact path stays gated numerically
    * in DedupSpec (xxhash64 planes, the default family).
    */
  val dedupCosineLsh = Q("q_dedup_embed_cosine_lsh",
    (s, dir) =>
      Dedup.cosineDupPairs(Tables.embeddings(s, dir), "embedding", "vec_id",
        threshold = 0.45, lshBits = 4, lshTables = 16, planeHash = "md5")
        .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("cosine"))
        .orderBy("id_a", "id_b"),
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            planes AS (
              SELECT t, b,
                     LIST_TRANSFORM(RANGE(0, 64),
                       i -> (('0x' || SUBSTR(MD5((t*4+b) || '_' || i), 1, 15))::BIGINT
                             % 2000001 - 1000000) / 1000000.0) AS w
              FROM RANGE(0, 16) tt(t), RANGE(0, 4) bb(b)),
            bk AS (
              SELECT v.vec_id, p.t,
                     SUM(CASE WHEN LIST_INNER_PRODUCT(v.e, p.w) >= 0
                              THEN (2 ^ p.b)::BIGINT ELSE 0 END)::BIGINT AS bucket
              FROM v CROSS JOIN planes p GROUP BY v.vec_id, p.t),
            cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
                                  AND a.vec_id < b.vec_id),
            pr AS (
              SELECT id_a, id_b, LIST_COSINE_SIMILARITY(va.e, vb.e) AS cosine
              FROM cand
              JOIN v va ON va.vec_id = cand.id_a
              JOIN v vb ON vb.vec_id = cand.id_b)
            SELECT id_a, id_b, ROUND(cosine, 9) AS cosine
            FROM pr WHERE cosine >= 0.45 ORDER BY id_a, id_b"""))

  /** Planner-driven twin of [[dedupCosineLsh]]: (bits, tables) come from
    * [[graft.ops.Dedup.planCosineLsh]] at the ACTUAL corpus size — the
    * 100 TB path. The r6 sf30 section measured the fixed-bits trap
    * directly (lshBits=4 ⇒ 53.3 s at sf30 vs 6.3 s at sf1, 8.5× on 3×
    * data); this query is the one the scale sections now run. FULLY
    * oracled: the SQL recomputes the SAME plan from COUNT(*) — the
    * integer (bits, tables) land far from every ceil boundary at the
    * gate corpora (verified n=500 → (3,8) with the tables ratio 7.23
    * sitting 0.23 from its boundary; n=2000 and n=5000 cap tables at the
    * planner's work/memory budget of 16, which is integer-exact) — then
    * rebuilds every (table, bucket) md5-plane signature and verifies
    * exact cosine, exactly as [[dedupCosineLsh]]'s oracle does.
    */
  val dedupCosineLshAuto = Q("q_dedup_embed_cosine_lsh_auto",
    (s, dir) =>
      Dedup.cosineDupPairsAuto(Tables.embeddings(s, dir), "embedding", "vec_id",
        threshold = 0.45, planeHash = "md5")
        .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("cosine"))
        .orderBy("id_a", "id_b"),
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            plan AS (
              SELECT bits,
                     LEAST(16, GREATEST(1, CAST(CEIL(LN(0.1) /
                       LN(1 - POWER(1 - ACOS(0.45)/PI(), bits))) AS INT))) AS tabs
              FROM (SELECT GREATEST(1, LEAST(30, CAST(CEIL(
                      LN((SELECT COUNT(*) FROM v) / 100.0) / LN(2)) AS INT))) AS bits)),
            planes AS (
              SELECT t, b, p.bits,
                     LIST_TRANSFORM(RANGE(0, 64),
                       i -> (('0x' || SUBSTR(MD5((t*p.bits+b) || '_' || i), 1, 15))::BIGINT
                             % 2000001 - 1000000) / 1000000.0) AS w
              FROM plan p, RANGE(0, 64) tt(t), RANGE(0, 30) bb(b)
              WHERE t < p.tabs AND b < p.bits),
            bk AS (
              SELECT v.vec_id, p.t,
                     SUM(CASE WHEN LIST_INNER_PRODUCT(v.e, p.w) >= 0
                              THEN (2 ^ p.b)::BIGINT ELSE 0 END)::BIGINT AS bucket
              FROM v CROSS JOIN planes p GROUP BY v.vec_id, p.t),
            cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
                                  AND a.vec_id < b.vec_id),
            pr AS (
              SELECT id_a, id_b, LIST_COSINE_SIMILARITY(va.e, vb.e) AS cosine
              FROM cand
              JOIN v va ON va.vec_id = cand.id_a
              JOIN v vb ON vb.vec_id = cand.id_b)
            SELECT id_a, id_b, ROUND(cosine, 9) AS cosine
            FROM pr WHERE cosine >= 0.45 ORDER BY id_a, id_b"""))

  /** Cosine expressed EXACTLY as the fused
    * [[graft.functions.VectorExprs.CosineSim]] expression computes it:
    * `dot / (sqrt(‖a‖²) · sqrt(‖b‖²))`, null when either norm is zero.
    * `LIST_INNER_PRODUCT` accumulates in index order — bit-identical to
    * the expression's sequential double adds (the same property the
    * md5-plane LSH oracles already lean on), so centroid-assignment
    * DECISIONS (not just rounded outputs) reproduce across engines.
    */
  private def cosSql(a: String, b: String): String =
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
  private def lloydCtesSql(kSql: String, iters: Int): String = {
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

  /** SemDeDup clustered variant with soft (top-2) cell assignment.
    * Approximate vs the exact all-pairs path (pairs outside any shared
    * cell missed by design — recall is gated numerically in DedupSpec),
    * but DETERMINISTIC, so since the centroid stream went
    * bit-reproducible the gate is FULLY oracled: the SQL recomputes
    * nCells from COUNT(*) with [[graft.ops.Dedup.planSemdedupCells]]'
    * own arithmetic (n=500 → s=√1500≈38.73, nCells=⌈25.82⌉=26 and
    * n=2000 → ⌈51.64⌉=52 — both far from their ceil boundaries),
    * rebuilds the 3-step Lloyd refinement ([[lloydCtesSql]]), re-derives
    * the top-2 soft assignment as rank ≤ min(2, |centroids|) of the same
    * (cosine desc, centroid_id) ordering — peeling m argmax passes with
    * the prior choices excluded IS the rank-m row of that ordering — and
    * emits within-cell pairs at exact cosine ≥ 0.45. nCells sits at the
    * planner's balanced default (cells ∝ √n — fixed cells make the pair
    * stream quadratic, linear cells make the centroid-assignment stream
    * quadratic; the balance point is the flat-k-means n^1.5 floor).
    */
  val dedupSemdedup = Q("q_dedup_semdedup",
    (s, dir) =>
      Dedup.semdedupPairsAuto(Tables.embeddings(s, dir), "embedding", "vec_id",
        threshold = 0.45, nAssign = 2)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("cosine"))
        .orderBy("id_a", "id_b"),
    Some(s"""WITH ${lloydCtesSql(
      "SELECT GREATEST(1, CAST(CEIL(CAST(COUNT(*) AS DOUBLE) * 2 / " +
        "GREATEST(16.0, SQRT(2.0 * 3 * COUNT(*) / 2.0))) AS INT)) FROM v", 3)},
            nc AS (SELECT LEAST(2, COUNT(*)) AS eff FROM c3),
            cells AS (
              SELECT vec_id, centroid_id FROM (
                SELECT v.vec_id, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY ${cosSql("v.e", "c.cent")} DESC NULLS LAST,
                                  c.centroid_id) AS rk
                FROM v CROSS JOIN c3 c), nc WHERE rk <= eff),
            cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM cells a JOIN cells b ON a.centroid_id = b.centroid_id
                                       AND a.vec_id < b.vec_id),
            sc AS (
              SELECT id_a, id_b, ${cosSql("va.e", "vb.e")} AS cosine
              FROM cand
              JOIN v va ON va.vec_id = cand.id_a
              JOIN v vb ON vb.vec_id = cand.id_b)
            SELECT id_a, id_b, ROUND(cosine, 9) AS cosine
            FROM sc WHERE cosine >= 0.45 ORDER BY id_a, id_b"""))

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

  /** Squared L2 expressed EXACTLY as [[graft.ops.Similarity]]'s private
    * `l2sq` computes it: `⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩`, each inner product a
    * sequential index-order sum (`LIST_INNER_PRODUCT` ≡ the HOF fold),
    * the subtraction/addition in the same association order — so PQ code
    * assignment DECISIONS reproduce bit-for-bit across engines.
    */
  private def l2sqSql(a: String, b: String): String =
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
  private def pqLloydCtesSql(m: Int, dsub: Int, ksub: Int, iters: Int,
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

  /** Text quality metrics + token counting (whitespace and BPE-ish). */
  val textQuality = Q("q_text_quality",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(col("doc_id"), Text.qualityStruct(col("text")).as("q"),
        Text.bpeishTokenCount(col("text")).cast(LongType).as("n_bpeish"))
        .select(col("doc_id"), col("q.n_chars").as("n_chars"),
          col("q.n_tokens").as("n_tokens"), col("q.mean_token_len").as("mean_token_len"),
          col("q.punct_ratio").as("punct_ratio"), col("q.upper_ratio").as("upper_ratio"),
          col("q.stopword_hit_ratio").as("stopword_hit_ratio"), col("n_bpeish"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT doc_id, text,
                LEN(text) AS n_chars,
                LEN(LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '), x -> x <> '')) AS n_tokens,
                LEN(REGEXP_EXTRACT_ALL(text, '[\.,;:!\?"'']')) AS n_punct,
                LEN(REGEXP_EXTRACT_ALL(text, '[A-Z]')) AS n_upper,
                LEN(LIST_INTERSECT(
                  LIST_DISTINCT(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ')),
                  ['the','a','of','and','to','in','is','that','it','for'])) AS n_stop,
                LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpeish
              FROM documents)
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
              CASE WHEN n_tokens > 0 THEN CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_token_len,
              CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
              CASE WHEN n_chars > 0 THEN CAST(n_upper AS DOUBLE) / n_chars ELSE 0.0 END AS upper_ratio,
              CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_hit_ratio,
              CAST(n_bpeish AS BIGINT) AS n_bpeish
            FROM t ORDER BY doc_id"""))

  /** Heuristic language ID: per-language stopword-profile hits, first
    * profile achieving the max wins, zero hits → "und".
    */
  val textLangid = Q("q_text_langid",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val scores = Text.langProfiles.map { case (lang, words) =>
        Text.langScore(col("text"), words).as(s"s_$lang")
      }
      d.select(col("doc_id") +: Text.langId(col("text")).as("lang_pred") +: scores: _*)
        .orderBy("doc_id")
    },
    Some {
      val profiles = Text.langProfiles
      val scoreExprs = profiles.map { case (lang, words) =>
        val arr = words.map(w => s"'$w'").mkString("[", ",", "]")
        s"""LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' ')), $arr)) AS s_$lang"""
      }.mkString(",\n                ")
      val best = profiles.map { case (l, _) => s"s_$l" }.mkString("GREATEST(", ", ", ")")
      val caseArms = profiles.map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }.mkString("\n                ")
      s"""WITH scored AS (
              SELECT doc_id,
                $scoreExprs
              FROM documents),
            best_of AS (SELECT *, $best AS best FROM scored)
            SELECT doc_id,
              CASE WHEN best = 0 THEN 'und'
                $caseArms
                ELSE 'und' END AS lang_pred,
              s_en, s_es, s_fr, s_de, s_zh
            FROM best_of ORDER BY doc_id"""
    })

  /** One-pass document annotation: the metadata-materialization job
    * that precedes corpus decisions — language ID, quality band fields,
    * unigram-LM score, content fingerprint and split label in a single
    * frame. Everything is fused scan expressions except the LM score's
    * corpus joins; the final attach is a shuffle-hash join on the id
    * (both sides corpus-sized). Oracle re-derives every column.
    */
  val curateAnnotate = Q("q_curate_annotate",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val ppl = Corpus.unigramNegLogProb(d, "text", "doc_id")
        .select(col("doc_id"), col("neg_logp"))
      d.select(col("doc_id"),
        Text.langId(col("text")).as("lang_pred"),
        Text.qualityStruct(col("text")).as("q"),
        Text.fingerprintMd5(col("text")).as("fp_md5"),
        Text.hashSplit(Text.normalize(col("text")),
          Seq("train" -> "cd", "valid" -> "e6"), "test").as("split"))
        .select(col("doc_id"), col("lang_pred"),
          col("q.n_tokens").cast(LongType).as("n_tokens"),
          col("q.mean_token_len").as("mean_token_len"),
          col("q.stopword_hit_ratio").as("stopword_hit_ratio"),
          col("fp_md5"), col("split"))
        .join(ppl.hint("shuffle_hash"), Seq("doc_id"))
        .orderBy("doc_id")
    },
    Some {
      val profiles = Text.langProfiles
      val scoreExprs = profiles.map { case (lang, words) =>
        val arr = words.map(w => s"'$w'").mkString("[", ",", "]")
        s"""LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' ')), $arr)) AS s_$lang"""
      }.mkString(",\n                ")
      val best = profiles.map { case (l, _) => s"s_$l" }.mkString("GREATEST(", ", ", ")")
      val caseArms = profiles.map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }.mkString("\n                ")
      s"""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' '), x -> x <> '') AS t,
                     TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS ntext
              FROM documents),
            uni AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
            cnt AS (SELECT term, COUNT(*) AS c FROM uni GROUP BY term),
            tot AS (SELECT COUNT(*) AS n FROM uni),
            ppl AS (
              SELECT doc_id, AVG(-LN(CAST(c AS DOUBLE) / n)) AS m
              FROM uni JOIN cnt USING (term) CROSS JOIN tot GROUP BY doc_id),
            q AS (
              SELECT doc_id, LEN(text) AS n_chars, LEN(t) AS n_tokens,
                LEN(LIST_INTERSECT(LIST_DISTINCT(t),
                  ['the','a','of','and','to','in','is','that','it','for'])) AS n_stop,
                $scoreExprs,
                MD5(ntext) AS fp_md5,
                CASE WHEN SUBSTR(MD5(ntext), 1, 2) < 'cd' THEN 'train'
                     WHEN SUBSTR(MD5(ntext), 1, 2) < 'e6' THEN 'valid'
                     ELSE 'test' END AS split
              FROM documents JOIN toks USING (doc_id)),
            b AS (SELECT *, $best AS best FROM q)
            SELECT b.doc_id,
              CASE WHEN best = 0 THEN 'und'
                $caseArms
                ELSE 'und' END AS lang_pred,
              CAST(n_tokens AS BIGINT) AS n_tokens,
              CASE WHEN n_tokens > 0 THEN CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_token_len,
              CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_hit_ratio,
              fp_md5, split,
              ROUND(COALESCE(ppl.m, 0.0), 6) AS neg_logp
            FROM b LEFT JOIN ppl ON b.doc_id = ppl.doc_id
            ORDER BY b.doc_id"""
    })

  /** Keep-one-per-cluster near-dup removal: word-3-gram Jaccard pairs →
    * connected components (min-label propagation) → drop every document
    * that isn't its cluster's minimum id. Oracle: transitive closure via
    * recursive CTE over the identical pair definition.
    */
  val dedupClusters = Q("q_dedup_cluster_keep",
    (s, dir) =>
      Dedup.nearDupSurvivors(Tables.documents(s, dir), "text", "doc_id",
        n = 3, threshold = 0.2)
        .select("doc_id", "source")
        .orderBy("doc_id"),
    Some("""WITH RECURSIVE
            toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, LEN(shingles) AS ns, UNNEST(shingles) AS g FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
              HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.2),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (
              SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
            losers AS (SELECT id FROM labels WHERE label <> id)
            SELECT doc_id, source FROM documents
            WHERE doc_id NOT IN (SELECT id FROM losers)
            ORDER BY doc_id"""))

  /** The curation end-use: filter a corpus on quality signals (Gopher/C4
    * style) — keep documents inside token/length bands with sane mean
    * token length. Demonstrates the quality ops composing into the
    * pipeline's actual purpose.
    */
  val curateFilter = Q("q_curate_quality_filter",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(col("doc_id"), col("lang"), Text.qualityStruct(col("text")).as("q"))
        .filter(col("q.n_tokens").between(30, 200) &&
          col("q.mean_token_len").between(2.0, 12.0))
        .select(col("doc_id"), col("lang"), col("q.n_tokens").as("n_tokens"),
          col("q.mean_token_len").as("mean_token_len"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT doc_id, lang,
                LEN(LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '), x -> x <> '')) AS n_tokens,
                LEN(text) AS n_chars
              FROM documents),
            q AS (
              SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
                CASE WHEN n_tokens > 0 THEN CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens
                     ELSE 0.0 END AS mean_token_len
              FROM t)
            SELECT doc_id, lang, n_tokens, mean_token_len FROM q
            WHERE n_tokens BETWEEN 30 AND 200 AND mean_token_len BETWEEN 2.0 AND 12.0
            ORDER BY doc_id"""))

  /** Deterministic content-hash train/valid/test split (≈80/10/10 via
    * md5-prefix ranges) — stable across runs/engines/partitionings, the
    * held-out-split property a training pipeline needs. Keyed by doc
    * content fingerprint so exact duplicates land in the same split
    * (no train/test leakage through dup docs).
    */
  val curateSplit = Q("q_curate_hash_split",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        Text.hashSplit(Text.normalize(col("text")),
          Seq("train" -> "cd", "valid" -> "e6"), "test").as("split"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
              CASE WHEN SUBSTR(MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))), 1, 2) < 'cd' THEN 'train'
                   WHEN SUBSTR(MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))), 1, 2) < 'e6' THEN 'valid'
                   ELSE 'test' END AS split
            FROM documents ORDER BY doc_id"""))

  /** Domain-blocklist screen: the corpus carries no URLs, so the gate
    * plants a deterministic one per doc (doc_id-keyed domain from a
    * 4-entry rotation), then extracts the domain and anti-joins a 2-entry
    * blocklist — extraction must fire on real matches, not vacuously.
    */
  val curateDomainFilter = Q("q_curate_domain_filter",
    (s, dir) => {
      import s.implicits._
      val domains = array(lit("alpha.example.com"), lit("spam.example.com"),
        lit("beta.example.org"), lit("ads.example.net"))
      val withUrl = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(lit("https://www."),
          element_at(domains, (col("doc_id") % 4 + 1).cast(IntegerType)),
          lit("/p/"), col("doc_id").cast(StringType)).as("url"))
      val blocked = Seq("spam.example.com", "ads.example.net").toDF("domain")
      Corpus.filterByDomainBlocklist(withUrl, "url", blocked, "domain")
        .select(col("doc_id"), Text.urlDomain(col("url")).as("domain"))
        .orderBy("doc_id")
    },
    Some("""WITH u AS (
              SELECT doc_id,
                     'https://www.' ||
                     (CASE doc_id % 4 WHEN 0 THEN 'alpha.example.com'
                                      WHEN 1 THEN 'spam.example.com'
                                      WHEN 2 THEN 'beta.example.org'
                                      ELSE 'ads.example.net' END) ||
                     '/p/' || doc_id AS url
              FROM documents),
            d AS (
              SELECT doc_id,
                     REGEXP_REPLACE(
                       REGEXP_EXTRACT(LOWER(url), 'https?://([^/:?#]+)', 1),
                       '^www\.', '') AS domain
              FROM u)
            SELECT doc_id, domain FROM d
            WHERE domain NOT IN ('spam.example.com', 'ads.example.net')
            ORDER BY doc_id"""))

  /** Winnowing fingerprints (k=5 char grams, w=4 windows) over the whole
    * corpus — the oracle replays gram hashing, the per-window argmin
    * with the paper's rightmost-tie rule (`ORDER BY h, i DESC`), and the
    * distinct selection.
    */
  val textWinnow = Q("q_text_winnow",
    (s, dir) =>
      Text.winnowingFingerprints(Tables.documents(s, dir), "doc_id", "text",
        k = 5, w = 4)
        .orderBy("doc_id", "pos", "fingerprint"),
    Some("""WITH n AS (
              SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS s
              FROM documents),
            g AS (
              SELECT doc_id, CAST(i AS INTEGER) AS i,
                     ('0x' || SUBSTR(MD5(SUBSTR(s, CAST(i AS INTEGER), 5)), 1, 15))::BIGINT AS h
              FROM (SELECT doc_id, s,
                           UNNEST(RANGE(1, GREATEST(LEN(s) - 4, 1) + 1)) AS i
                    FROM n)),
            ng AS (SELECT doc_id, COUNT(*) AS cnt FROM g GROUP BY doc_id),
            wins AS (
              SELECT doc_id, CAST(widx AS INTEGER) AS widx
              FROM (SELECT doc_id,
                           UNNEST(RANGE(1, GREATEST(cnt - 3, 1) + 1)) AS widx
                    FROM ng)),
            sel AS (
              SELECT doc_id, h, i FROM (
                SELECT w.doc_id, w.widx, g.h, g.i,
                       ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.widx
                                          ORDER BY g.h ASC, g.i DESC) AS rk
                FROM wins w JOIN g ON g.doc_id = w.doc_id
                                  AND g.i BETWEEN w.widx AND w.widx + 3)
              WHERE rk = 1)
            SELECT DISTINCT doc_id, i AS pos, h AS fingerprint
            FROM sel
            ORDER BY doc_id, pos, fingerprint"""))

  /** Winnowing copy-pair screen: pairs sharing ≥ 2 distinct fingerprints
    * after the df ≤ 64 boilerplate cap. The oracle replays the winnowing
    * CTEs, the distinct (doc, fp) index, the cap, and the pair join.
    */
  val dedupWinnowPairs = Q("q_dedup_winnow_pairs",
    (s, dir) =>
      Dedup.winnowCopyPairs(Tables.documents(s, dir), "text", "doc_id",
        k = 5, w = 4, minShared = 2, maxFpDocFreq = 64L)
        .orderBy("id_a", "id_b"),
    Some("""WITH n AS (
              SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS s
              FROM documents),
            g AS (
              SELECT doc_id, CAST(i AS INTEGER) AS i,
                     ('0x' || SUBSTR(MD5(SUBSTR(s, CAST(i AS INTEGER), 5)), 1, 15))::BIGINT AS h
              FROM (SELECT doc_id, s,
                           UNNEST(RANGE(1, GREATEST(LEN(s) - 4, 1) + 1)) AS i
                    FROM n)),
            ng AS (SELECT doc_id, COUNT(*) AS cnt FROM g GROUP BY doc_id),
            wins AS (
              SELECT doc_id, CAST(widx AS INTEGER) AS widx
              FROM (SELECT doc_id,
                           UNNEST(RANGE(1, GREATEST(cnt - 3, 1) + 1)) AS widx
                    FROM ng)),
            sel AS (
              SELECT doc_id, h FROM (
                SELECT w.doc_id, w.widx, g.h,
                       ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.widx
                                          ORDER BY g.h ASC, g.i DESC) AS rk
                FROM wins w JOIN g ON g.doc_id = w.doc_id
                                  AND g.i BETWEEN w.widx AND w.widx + 3)
              WHERE rk = 1),
            fpd AS (SELECT DISTINCT doc_id, h FROM sel),
            idx AS (
              SELECT f.doc_id, f.h
              FROM fpd f
              JOIN (SELECT h FROM fpd GROUP BY h HAVING COUNT(*) <= 64) d
                USING (h))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   COUNT(*) AS shared_fps
            FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 2
            ORDER BY id_a, id_b"""))

  /** URL canonicalization + URL-keyed keep-first dedup: planted aliases
    * (uppercase scheme/host, default ports, www., fragments, tracking
    * params in all three query positions, trailing slashes, a non-URL
    * shape, and a literal `&ref=` inside a PATH segment that must
    * survive) collapse to canonical keys; `is_url_dup` marks every row
    * whose canonical key was already claimed by a lower doc_id. The
    * oracle replays the identical RE2 regex chain step by step.
    */
  val curateUrlCanon = Q("q_curate_url_canon",
    (s, dir) => {
      val m = pmod(col("doc_id"), lit(7))
      val withUrl = Tables.documents(s, dir).select(col("doc_id"),
        when(m === 0, concat(lit("HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id="),
            col("doc_id").cast(StringType)))
          .when(m === 1, lit("http://example.com:80/a/b/?ref=abc"))
          .when(m === 2, concat(lit("https://example.com/p/"),
            col("doc_id").cast(StringType), lit("/#frag")))
          .when(m === 3, concat(lit("http://news.example.org/article?id="),
            col("doc_id").cast(StringType), lit("&utm_campaign=z&x=1")))
          .when(m === 4, concat(lit("not a url "), col("doc_id").cast(StringType)))
          .when(m === 5, lit("https://shop.example.net/?gclid=123"))
          // '&ref=' inside a PATH segment (legal per RFC 3986) — must
          // survive canonicalization untouched; the r10 chain stripped it
          .otherwise(lit("https://example.com/a&ref=x/b?id=1")).as("url"))
      withUrl
        .select(col("doc_id"), Text.canonicalUrl(col("url")).as("canon"))
        .withColumn("is_url_dup",
          when(col("canon").isNull, lit(false)).otherwise(
            min(col("doc_id")).over(
              org.apache.spark.sql.expressions.Window.partitionBy("canon"))
              < col("doc_id")))
        .orderBy("doc_id")
    },
    Some("""WITH u AS (
              SELECT doc_id,
                CASE doc_id % 7
                  WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=' || doc_id
                  WHEN 1 THEN 'http://example.com:80/a/b/?ref=abc'
                  WHEN 2 THEN 'https://example.com/p/' || doc_id || '/#frag'
                  WHEN 3 THEN 'http://news.example.org/article?id=' || doc_id || '&utm_campaign=z&x=1'
                  WHEN 4 THEN 'not a url ' || doc_id
                  WHEN 5 THEN 'https://shop.example.net/?gclid=123'
                  ELSE 'https://example.com/a&ref=x/b?id=1' END AS url
              FROM documents),
            ext AS (
              SELECT doc_id,
                LOWER(REGEXP_EXTRACT(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                LOWER(REGEXP_EXTRACT(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
                REGEXP_EXTRACT(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)', 1) AS rest
              FROM (SELECT doc_id, REGEXP_REPLACE(TRIM(url), '#.*', '', 'g') AS nf FROM u)),
            hp AS (
              SELECT doc_id, scheme,
                CASE WHEN scheme = 'http' THEN REGEXP_REPLACE(h1, ':80$', '')
                     WHEN scheme = 'https' THEN REGEXP_REPLACE(h1, ':443$', '')
                     ELSE h1 END AS host,
                REGEXP_EXTRACT(rest, '^([^?]*)', 1) AS pathpart,
                REGEXP_REPLACE(
                  REGEXP_REPLACE(
                    REGEXP_REPLACE(REGEXP_EXTRACT(rest, '(\?.*)$', 1),
                      '&(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&]*', '', 'g'),
                    '\?(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&]*&', '?', 'g'),
                  '\?(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&]*$', '', 'g') AS s3
              FROM (SELECT doc_id, scheme, rest,
                      REGEXP_REPLACE(hostport, '^www\.', '') AS h1 FROM ext)),
            canon AS (
              SELECT doc_id,
                CASE WHEN scheme = '' THEN NULL
                     ELSE scheme || '://' || host ||
                          (CASE WHEN LEN(q4) = 0 THEN '/' ELSE q4 END) END AS canon
              FROM (SELECT doc_id, scheme, host,
                      (CASE WHEN LEN(s3) = 0
                            THEN REGEXP_REPLACE(pathpart, '^(.+)/$', '\1')
                            ELSE pathpart END) || s3 AS q4 FROM hp))
            SELECT doc_id, canon,
              CASE WHEN canon IS NULL THEN FALSE
                   ELSE MIN(doc_id) OVER (PARTITION BY canon) < doc_id END AS is_url_dup
            FROM canon
            ORDER BY doc_id"""))

  /** Z-order (Morton) layout values over (user_id, value) — the
    * data-skipping clustering primitive: min/max scale each dimension to
    * 16 bits (the same fixed-order IEEE arithmetic the SQ8 gate proves
    * reproducible), then interleave bits round-robin. The oracle rebuilds
    * the scale and the full 32-term bit interleave in SQL.
    */
  val layoutZorder = Q("q_layout_zorder",
    (s, dir) =>
      Layout.withZValue(
        Tables.events(s, dir).select("event_id", "user_id", "value"),
        Seq("user_id", "value"), bits = 16)
        .select("event_id", "zvalue")
        .orderBy("event_id"),
    Some {
      val interleave = (0 until 16).flatMap(i => Seq(
        s"(((su >> $i) & 1) << ${2 * i})",
        s"(((sv >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""WITH b AS (
              SELECT MIN(CAST(user_id AS DOUBLE)) AS mnu, MAX(CAST(user_id AS DOUBLE)) AS mxu,
                     MIN(CAST(value AS DOUBLE)) AS mnv, MAX(CAST(value AS DOUBLE)) AS mxv
              FROM events),
            s AS (
              SELECT event_id,
                CASE WHEN mxu - mnu > 0
                     THEN CAST(FLOOR((CAST(user_id AS DOUBLE) - mnu) / (mxu - mnu) * 65535) AS BIGINT)
                     ELSE 0 END AS su,
                CASE WHEN mxv - mnv > 0
                     THEN CAST(FLOOR((CAST(value AS DOUBLE) - mnv) / (mxv - mnv) * 65535) AS BIGINT)
                     ELSE 0 END AS sv
              FROM events, b)
            SELECT event_id, $interleave AS zvalue
            FROM s ORDER BY event_id"""
    })

  /** Deterministic epoch shuffle: md5-derived shard + dense in-shard
    * position. Same permutation from any engine — the oracle recomputes
    * it byte-for-byte in SQL.
    */
  val curateShuffle = Q("q_curate_shuffle_shard",
    (s, dir) =>
      Corpus.shuffleShard(
        Tables.documents(s, dir).select("doc_id", "source"),
        "doc_id", nShards = 8, seed = "ep0")
        .select(col("doc_id"), col("source"), col("shard"), col("pos"))
        .orderBy("shard", "pos"),
    Some("""WITH k AS (
              SELECT doc_id, source,
                     MD5('ep0' || CAST(doc_id AS VARCHAR)) AS h
              FROM documents),
            s AS (
              SELECT doc_id, source, h,
                     CAST(((STRPOS('0123456789abcdef', SUBSTR(h, 1, 1)) - 1) * 16 +
                           (STRPOS('0123456789abcdef', SUBSTR(h, 2, 1)) - 1)) % 8
                          AS INTEGER) AS shard
              FROM k)
            SELECT doc_id, source, shard,
                   CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
                        AS INTEGER) AS pos
            FROM s ORDER BY shard, pos"""))

  /** C4-style PII/noise scrub: emails, URLs, phone numbers → typed
    * placeholders. The corpus carries no PII, so the gate plants a
    * deterministic email+URL+phone per doc and scrubs it — the regexes
    * (RE2-compatible, identical strings both engines) must fire on real
    * matches, not vacuously.
    */
  val curateScrub = Q("q_curate_pii_scrub",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        Text.scrubPii(concat(col("text"),
          lit(" contact user"), col("doc_id").cast(StringType), lit("@example.com or "),
          lit("https://ex.com/d/"), col("doc_id").cast(StringType),
          lit(" tel +265 99 123 "), col("doc_id").cast(StringType))).as("scrubbed"))
        .orderBy("doc_id"),
    // DuckDB string literals keep backslashes raw, so the Scala pattern
    // constants interpolate verbatim — both engines compile the SAME
    // pattern string
    Some(s"""SELECT doc_id,
              REGEXP_REPLACE(
                REGEXP_REPLACE(
                  REGEXP_REPLACE(
                    text || ' contact user' || doc_id || '@example.com or ' ||
                      'https://ex.com/d/' || doc_id || ' tel +265 99 123 ' || doc_id,
                    '${Text.EmailRe}', '<EMAIL>', 'g'),
                  '${Text.UrlRe}', '<URL>', 'g'),
                '${Text.PhoneRe}', '<PHONE>', 'g') AS scrubbed
            FROM documents ORDER BY doc_id"""))

  /** Gopher-style repetition signals: type-token ratio (pure expression)
    * and top-bigram fraction (most frequent word 2-gram's share of all
    * 2-gram occurrences — needs the non-distinct n-gram counts, one
    * shuffle on (doc, bigram)). Docs under 2 tokens get null fraction.
    */
  val curateRepetition = Q("q_curate_repetition",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val base = d.select(col("doc_id"), Text.tokens(col("text")).as("t"))
      val bigrams = base
        .select(col("doc_id"), explode(Text.wordNgramsAll(col("t"), 2)).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          (max(col("c")).cast(DoubleType) / sum(col("c"))).as("top_bigram_frac"))
      // shuffle_hash: bigrams is PER-DOC (corpus-sized) — the planner's
      // undersized aggregate estimate would broadcast it otherwise
      d.select(col("doc_id"), round(Text.typeTokenRatio(col("text")), 9).as("ttr"))
        .join(bigrams.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("ttr"), round(col("top_bigram_frac"), 9).as("top_bigram_frac"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            big AS (
              SELECT doc_id,
                     LIST_TRANSFORM(RANGE(1, LEN(t)), i -> ARRAY_TO_STRING(t[i:i+1], ' ')) AS bgs
              FROM toks WHERE LEN(t) >= 2),
            ex AS (SELECT doc_id, UNNEST(bgs) AS bg FROM big),
            cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM ex GROUP BY 1, 2),
            top AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_frac
                    FROM cnt GROUP BY 1)
            SELECT toks.doc_id,
              ROUND(CASE WHEN LEN(t) > 0
                         THEN CAST(LEN(LIST_DISTINCT(t)) AS DOUBLE) / LEN(t) END, 9) AS ttr,
              ROUND(top.top_bigram_frac, 9) AS top_bigram_frac
            FROM toks LEFT JOIN top ON toks.doc_id = top.doc_id
            ORDER BY toks.doc_id"""))

  /** Gopher rule bank (Rae et al. 2021 §A1.1) over decorated docs: the
    * synthetic corpus is uniformly clean prose, so the gate plants
    * deterministic doc_id-keyed decorations (12 bullet lines on id%7=0,
    * a trailing ellipsis line on id%5=0, a symbol line on id%11=0) that
    * push different documents across different rule thresholds — every
    * rule fires on real structure, not vacuously. The keep decision is
    * computed from the UNROUNDED ratios on both sides.
    */
  val curateGopher = Q("q_curate_gopher_rules",
    (s, dir) => {
      val bullets = (1 to 12).map(i => s"- item $i\n").mkString
      val decorated = concat(
        when(col("doc_id") % 7 === 0, lit(bullets)).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 5 === 0, lit("\nto be continued...")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("\n# ## ### #### #")).otherwise(lit("")))
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.gopherStruct(decorated).as("g"))
        .select(col("doc_id"),
          col("g.n_tokens").as("n_tokens"),
          round(col("g.alpha_word_frac"), 9).as("alpha_word_frac"),
          round(col("g.symbol_word_ratio"), 9).as("symbol_word_ratio"),
          round(col("g.bullet_line_frac"), 9).as("bullet_line_frac"),
          round(col("g.ellipsis_line_frac"), 9).as("ellipsis_line_frac"),
          col("g.n_stopword_hits").as("n_stopword_hits"),
          Text.gopherKeep(col("g")).as("keep"))
        .orderBy("doc_id")
    },
    Some(s"""WITH dec AS (
              SELECT doc_id,
                (CASE WHEN doc_id % 7 = 0
                      THEN ${(1 to 12).map(i => s"'- item $i' || CHR(10)").mkString(" || ")}
                      ELSE '' END) || text ||
                (CASE WHEN doc_id % 5 = 0 THEN CHR(10) || 'to be continued...' ELSE '' END) ||
                (CASE WHEN doc_id % 11 = 0 THEN CHR(10) || '# ## ### #### #' ELSE '' END) AS txt
              FROM documents),
            t AS (
              SELECT doc_id, txt,
                LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(txt), '\\s+', ' ', 'g')), ' '),
                            x -> x <> '') AS toks,
                STRING_SPLIT(txt, CHR(10)) AS lines
              FROM dec),
            m AS (
              SELECT doc_id,
                LEN(toks) AS n_tokens,
                LEN(LIST_FILTER(toks, x -> REGEXP_MATCHES(x, '[a-z]'))) AS n_alpha,
                LEN(REGEXP_EXTRACT_ALL(txt, '#|\\.\\.\\.')) AS n_sym,
                LEN(lines) AS n_lines,
                LEN(LIST_FILTER(lines, l -> REGEXP_MATCHES(TRIM(l), '^[-*•]'))) AS n_bullet,
                LEN(LIST_FILTER(lines, l -> REGEXP_MATCHES(l, '(\\.\\.\\.|…)$$'))) AS n_ell,
                LEN(LIST_INTERSECT(LIST_DISTINCT(toks),
                  ['the','a','of','and','to','in','is','that','it','for'])) AS n_stop
              FROM t)
            SELECT doc_id,
              CAST(n_tokens AS BIGINT) AS n_tokens,
              ROUND(CASE WHEN n_tokens > 0 THEN CAST(n_alpha AS DOUBLE) / n_tokens END, 9) AS alpha_word_frac,
              ROUND(CASE WHEN n_tokens > 0 THEN CAST(n_sym AS DOUBLE) / n_tokens END, 9) AS symbol_word_ratio,
              ROUND(CASE WHEN n_lines > 0 THEN CAST(n_bullet AS DOUBLE) / n_lines END, 9) AS bullet_line_frac,
              ROUND(CASE WHEN n_lines > 0 THEN CAST(n_ell AS DOUBLE) / n_lines END, 9) AS ellipsis_line_frac,
              CAST(n_stop AS BIGINT) AS n_stopword_hits,
              (n_tokens BETWEEN 50 AND 100000)
                AND COALESCE(CAST(n_alpha AS DOUBLE) / n_tokens > 0.8, FALSE)
                AND COALESCE(CAST(n_sym AS DOUBLE) / n_tokens < 0.1, FALSE)
                AND COALESCE(CAST(n_bullet AS DOUBLE) / n_lines < 0.9, FALSE)
                AND COALESCE(CAST(n_ell AS DOUBLE) / n_lines < 0.3, FALSE)
                AND n_stop >= 2 AS keep
            FROM m ORDER BY doc_id"""))

  /** HLL distinct-count sketch per source, beside the exact count — the
    * oracle recomputes the registers with the same string/integer ρ
    * derivation (no floats until the estimate), the same exact
    * power-of-two harmonic sum, and the same published constants; the
    * estimate (one α·m²/x or m·ln(m/V) per group) rounds to 6 decimals,
    * far coarser than any ulp divergence in `ln`. Mergeability (the
    * 100 TB property) is spec-tested: sharded register frames max-merge
    * to the exact whole-corpus sketch.
    */
  /** KMV distinct sketch ([[graft.ops.Corpus.kmvDistinct]], k=16 so the
    * estimator branch engages at gate scale — ~40+ distinct texts per
    * source): estimate beside the exact count. Deterministic end to end
    * (integer hashes, one division chain), so the oracle rebuilds the
    * SAME sketch hash-for-hash and the compare is exact equality — no
    * tolerance bands.
    */
  val corpusKmv = Q("q_corpus_kmv_distinct",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Corpus.kmvDistinct(d, "source", "text", k = 16)
        .join(d.groupBy("source")
          .agg(countDistinct(col("text")).as("exact_distinct")), Seq("source"))
        .orderBy("source")
    },
    Some("""WITH h AS (SELECT DISTINCT source AS g,
                   ('0x' || SUBSTR(MD5(text), 1, 15))::BIGINT AS h
              FROM documents WHERE text IS NOT NULL),
            r AS (SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
                  FROM h),
            sk AS (SELECT g, h, rn FROM r WHERE rn <= 16),
            ex AS (SELECT source AS g, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
                   FROM documents GROUP BY source)
            SELECT sk.g AS source, CAST(COUNT(*) AS BIGINT) AS n_sketch,
              CASE WHEN COUNT(*) < 16 THEN CAST(COUNT(*) AS DOUBLE)
                   ELSE CAST(15 AS DOUBLE) /
                        (MAX(CASE WHEN rn = 16 THEN h END) / POWER(2, 60)) END
                AS est_distinct,
              ANY_VALUE(ex.exact_distinct) AS exact_distinct
            FROM sk JOIN ex ON ex.g = sk.g
            GROUP BY sk.g
            ORDER BY source"""))

  /** KMV cross-source overlap report ([[graft.ops.Corpus
    * .kmvOverlapReport]]): union/Jaccard/intersection estimates for every
    * source pair from one corpus pass — the sketch composition HLL
    * registers can't do. Same exact-equality compare: the oracle replays
    * the union sketch, the ρ membership counts, and the division chain.
    */
  val corpusKmvOverlap = Q("q_corpus_kmv_overlap",
    (s, dir) =>
      Corpus.kmvOverlapReport(Tables.documents(s, dir), "source", "text", k = 16)
        .orderBy("group_a", "group_b"),
    Some("""WITH h AS (SELECT DISTINCT source AS g,
                   ('0x' || SUBSTR(MD5(text), 1, 15))::BIGINT AS h
              FROM documents WHERE text IS NOT NULL),
            r AS (SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
                  FROM h),
            sk AS (SELECT g, h FROM r WHERE rn <= 16),
            gs AS (SELECT DISTINCT g FROM sk),
            gp AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
            uh AS (SELECT gp.ga, gp.gb, s.h FROM gp JOIN sk s ON s.g = gp.ga
                   UNION
                   SELECT gp.ga, gp.gb, s.h FROM gp JOIN sk s ON s.g = gp.gb),
            ur AS (SELECT ga, gb, h,
                     ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
                   FROM uh),
            uk AS (SELECT * FROM ur WHERE rn <= 16),
            st AS (SELECT u.ga, u.gb, COUNT(*) AS nu,
                     MAX(CASE WHEN u.rn = 16 THEN u.h END) AS hk,
                     SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                              THEN 1 ELSE 0 END) AS rho
                   FROM uk u
                   LEFT JOIN sk sa ON sa.g = u.ga AND sa.h = u.h
                   LEFT JOIN sk sb ON sb.g = u.gb AND sb.h = u.h
                   GROUP BY u.ga, u.gb)
            SELECT ga AS group_a, gb AS group_b,
              CAST(nu AS BIGINT) AS n_union_sketch,
              CAST(rho AS BIGINT) AS n_shared,
              CASE WHEN nu < 16 THEN CAST(nu AS DOUBLE)
                   ELSE CAST(15 AS DOUBLE) / (hk / POWER(2, 60)) END AS est_union,
              CAST(rho AS DOUBLE) / CAST(nu AS DOUBLE) AS est_jaccard,
              (CAST(rho AS DOUBLE) / CAST(nu AS DOUBLE)) *
                (CASE WHEN nu < 16 THEN CAST(nu AS DOUBLE)
                      ELSE CAST(15 AS DOUBLE) / (hk / POWER(2, 60)) END)
                AS est_intersection
            FROM st ORDER BY group_a, group_b"""))

  val corpusHll = Q("q_corpus_hll_distinct",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val exact = d.groupBy("source").agg(countDistinct(col("text")).as("n_exact"))
      Corpus.hllDistinct(d, "source", "text")
        .withColumn("est_distinct", round(col("est_distinct"), 6))
        .join(exact, Seq("source"))
        .orderBy("source")
    },
    Some(s"""WITH k AS (SELECT source, MD5(text) AS h FROM documents
                        WHERE text IS NOT NULL),
            r AS (
              SELECT source,
                     ('0x' || SUBSTR(h, 1, 1))::INT AS reg,
                     LEN(REGEXP_EXTRACT(SUBSTR(h, 2, 8), '^0*')) AS lz,
                     SUBSTR(h, 2, 8) AS win
              FROM k),
            x AS (
              SELECT source, reg, lz,
                     CASE WHEN lz = 8 THEN 0
                          ELSE ('0x' || SUBSTR(win, lz + 1, 1))::INT END AS fd
              FROM r),
            rho AS (
              SELECT source, reg,
                     CASE WHEN lz = 8 THEN 33
                          ELSE lz * 4 +
                               (CASE WHEN fd >= 8 THEN 0 WHEN fd >= 4 THEN 1
                                     WHEN fd >= 2 THEN 2 ELSE 3 END) + 1 END AS rho
              FROM x),
            m AS (SELECT source, reg, MAX(rho) AS mr FROM rho GROUP BY 1, 2),
            g AS (
              SELECT source, COUNT(*) AS nreg,
                     SUM(POWER(2.0, -mr)) AS hp
              FROM m GROUP BY 1),
            est AS (
              SELECT source,
                     0.673 * 16 * 16 / ((16 - nreg) * 1.0 + hp) AS e,
                     16 - nreg AS v
              FROM g)
            SELECT est.source,
                   ROUND(CASE WHEN e <= 2.5 * 16 AND v > 0
                              THEN 16.0 * LN(16.0 / v) ELSE e END, 6) AS est_distinct,
                   ex.n_exact
            FROM est
            JOIN (SELECT source, COUNT(DISTINCT text) AS n_exact
                  FROM documents GROUP BY 1) ex ON ex.source = est.source
            ORDER BY est.source"""))

  /** ANALYZE-style profile of the documents table: rows / nulls /
    * HLL-estimated distinct per column, the same register chain as
    * [[corpusHll]] keyed by column name over a string-cast unpivot.
    */
  val corpusProfile = Q("q_corpus_profile",
    (s, dir) =>
      Corpus.profileColumns(Tables.documents(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("col_name"),
    Some("""WITH long AS (
              SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v FROM documents
              UNION ALL SELECT 'text', text FROM documents
              UNION ALL SELECT 'lang', lang FROM documents
              UNION ALL SELECT 'source', source FROM documents
              UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents),
            basic AS (
              SELECT col_name, COUNT(*) AS n_rows,
                     SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_nulls
              FROM long GROUP BY 1),
            k AS (SELECT col_name, MD5(v) AS h FROM long WHERE v IS NOT NULL),
            r AS (
              SELECT col_name,
                     ('0x' || SUBSTR(h, 1, 1))::INT AS reg,
                     LEN(REGEXP_EXTRACT(SUBSTR(h, 2, 8), '^0*')) AS lz,
                     SUBSTR(h, 2, 8) AS win
              FROM k),
            x AS (
              SELECT col_name, reg, lz,
                     CASE WHEN lz = 8 THEN 0
                          ELSE ('0x' || SUBSTR(win, lz + 1, 1))::INT END AS fd
              FROM r),
            rho AS (
              SELECT col_name, reg,
                     CASE WHEN lz = 8 THEN 33
                          ELSE lz * 4 +
                               (CASE WHEN fd >= 8 THEN 0 WHEN fd >= 4 THEN 1
                                     WHEN fd >= 2 THEN 2 ELSE 3 END) + 1 END AS rho
              FROM x),
            m AS (SELECT col_name, reg, MAX(rho) AS mr FROM rho GROUP BY 1, 2),
            g AS (
              SELECT col_name, COUNT(*) AS nreg, SUM(POWER(2.0, -mr)) AS hp
              FROM m GROUP BY 1),
            est AS (
              SELECT col_name,
                     0.673 * 16 * 16 / ((16 - nreg) * 1.0 + hp) AS e,
                     16 - nreg AS v
              FROM g)
            SELECT basic.col_name, CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(n_nulls AS BIGINT) AS n_nulls,
                   ROUND(CASE WHEN e <= 2.5 * 16 AND v > 0
                              THEN 16.0 * LN(16.0 / v) ELSE e END, 6) AS n_distinct_est
            FROM basic
            LEFT JOIN est ON est.col_name = basic.col_name
            ORDER BY basic.col_name"""))

  /** Exact per-source token-count quantiles (p50/p90/p99) by integer
    * rank — the deterministic alternative to `percentile_approx`, whose
    * sketch is neither engine-reproducible nor oracle-able. The oracle
    * replays the identical ⌈q·n⌉ rank pick.
    */
  val corpusQuantiles = Q("q_corpus_length_quantiles",
    (s, dir) => {
      val lens = Tables.documents(s, dir)
        .select(col("source"), Text.tokenCount(col("text")).cast(LongType).as("n_tok"))
      Corpus.exactQuantiles(lens, "source", "n_tok", Seq(0.5, 0.9, 0.99))
        .orderBy("source")
    },
    Some("""WITH lens AS (
              SELECT source,
                CAST(LEN(LIST_FILTER(
                  STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                  x -> x <> '')) AS BIGINT) AS n_tok
              FROM documents),
            r AS (
              SELECT source, n_tok,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM lens)
            SELECT source,
                   MAX(CASE WHEN rn = CEIL(0.5 * n) THEN n_tok END) AS p50,
                   MAX(CASE WHEN rn = CEIL(0.9 * n) THEN n_tok END) AS p90,
                   MAX(CASE WHEN rn = CEIL(0.99 * n) THEN n_tok END) AS p99
            FROM r GROUP BY source ORDER BY source"""))

  /** Mergeable log-bucket quantile sketch
    * ([[graft.ops.Corpus.quantileSketch]]) on the SAME per-source
    * token-count distribution as `q_corpus_length_quantiles`, so the
    * exact/sketch twins are directly comparable: each count keeps its
    * top 8 significant bits (subBits 7 → relative error < 1/128; exact
    * below 256), buckets computed in pure integer/string arithmetic
    * (LENGTH(BIN(v)) + two shifts — no cross-libm log), estimates are
    * the lowest bucket reaching the exact ⌈q·n⌉ rank. The oracle
    * replays the bucket map, the SUM-merge and the rank pick.
    */
  val corpusQuantileSketch = Q("q_corpus_quantile_sketch",
    (s, dir) => {
      val lens = Tables.documents(s, dir)
        .select(col("source"), Text.tokenCount(col("text")).cast(LongType).as("n_tok"))
      Corpus.quantileSketchEstimate(
        Corpus.quantileSketch(lens, "source", "n_tok", subBits = 7),
        "source", Seq(0.5, 0.9, 0.99))
        .orderBy("source")
    },
    Some("""WITH lens AS (
              SELECT source,
                CAST(LEN(LIST_FILTER(
                  STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                  x -> x <> '')) AS BIGINT) AS n_tok
              FROM documents),
            b AS (
              SELECT source,
                     CASE WHEN LENGTH(BIN(n_tok)) <= 8 THEN n_tok
                          ELSE (n_tok >> (LENGTH(BIN(n_tok)) - 8)) << (LENGTH(BIN(n_tok)) - 8)
                     END AS bucket
              FROM lens),
            c AS (SELECT source, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
            cum AS (
              SELECT source, bucket, c,
                     SUM(c) OVER (PARTITION BY source ORDER BY bucket) AS cum,
                     SUM(c) OVER (PARTITION BY source) AS n
              FROM c)
            SELECT source,
                   MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN bucket END) AS p50,
                   MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN bucket END) AS p90,
                   MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN bucket END) AS p99
            FROM cum GROUP BY source ORDER BY source"""))

  /** Per-source winsorization ([[graft.ops.Corpus.winsorize]]): n_chars
    * clamped into the source's exact [p05, p95] band — the clip-not-drop
    * robust-preprocessing twin of the validators' bound checks. Oracle
    * replays the integer-rank picks and the LEAST/GREATEST clamp.
    */
  val corpusWinsorize = Q("q_corpus_winsorize",
    (s, dir) =>
      Corpus.winsorize(
        Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
        "source", "n_chars", pLo = 0.05, pHi = 0.95)
        .select("doc_id", "source", "n_chars", "n_chars_clipped")
        .orderBy("doc_id"),
    Some("""WITH r AS (
              SELECT source, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM documents),
            cuts AS (
              SELECT source,
                     MAX(CASE WHEN rn = CEIL(0.05 * n) THEN n_chars END) AS lo,
                     MAX(CASE WHEN rn = CEIL(0.95 * n) THEN n_chars END) AS hi
              FROM r GROUP BY source)
            SELECT d.doc_id, d.source, d.n_chars,
                   LEAST(GREATEST(d.n_chars, c.lo), c.hi) AS n_chars_clipped
            FROM documents d JOIN cuts c USING (source)
            ORDER BY d.doc_id"""))

  /** Count-min heavy hitters: the 4×1024 counter sketch over every
    * corpus token, point-estimated for the top-20 true tokens beside
    * their exact counts — est ≥ exact always, bounded by ε·N. Everything
    * is md5 buckets and integer sums, so the oracle replays the sketch
    * bit-for-bit; mergeability (shard counters SUM to the whole) is
    * spec-tested.
    */
  val corpusCms = Q("q_corpus_cms_topterms",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("token"))
      val exact = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
      val top = exact.orderBy(col("n_exact").desc, col("token")).limit(20)
      Corpus.cmsEstimate(Corpus.cmsCounters(toks, "token"), top, "token")
        .join(top, Seq("token"))
        .select(col("token"), col("n_exact"), col("est_count"))
        .orderBy("token")
    },
    Some("""WITH toks AS (
              SELECT UNNEST(LIST_FILTER(
                STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                x -> x <> '')) AS token
              FROM documents),
            ex AS (SELECT token, COUNT(*) AS n_exact FROM toks GROUP BY 1),
            top AS (SELECT token, n_exact FROM ex ORDER BY n_exact DESC, token LIMIT 20),
            ctr AS (
              SELECT j, ('0x' || SUBSTR(MD5(j || '_' || token), 1, 15))::BIGINT % 1024 AS b,
                     COUNT(*) AS c
              FROM toks, RANGE(0, 4) jj(j) GROUP BY 1, 2),
            est AS (
              SELECT t.token, MIN(COALESCE(ctr.c, 0)) AS est_count
              FROM (SELECT token, j,
                           ('0x' || SUBSTR(MD5(j || '_' || token), 1, 15))::BIGINT % 1024 AS b
                    FROM top, RANGE(0, 4) jj(j)) t
              LEFT JOIN ctr ON ctr.j = t.j AND ctr.b = t.b
              GROUP BY 1)
            SELECT top.token, top.n_exact, est.est_count
            FROM top JOIN est USING (token)
            ORDER BY token"""))

  /** Fixed-iteration PageRank ([[graft.ops.Graph.pageRank]]) over a
    * deterministic synthetic link graph (two modular out-edges per
    * document — every node has out-degree ≥ 2, so no dangling leak in
    * this gate). The oracle unrolls all 8 iterations as CTEs: degrees,
    * per-iteration contribution sums, the (1−d)/N teleport — computed
    * with the same literal arithmetic ((1.0 − 0.85), not a pre-folded
    * 0.15, so both engines fold the identical IEEE constant).
    */
  val graphPagerank = Q("q_graph_pagerank",
    (s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id")
      val cnt = d.count()
      val edges = d.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 3, lit(cnt)).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 5, lit(cnt)).as("dst")))
      Graph.pageRank(edges, "src", "dst", iters = 8).orderBy("node")
    },
    Some {
      val iterCte = (t: Int) =>
        s"""r$t AS (
              SELECT nodes.node,
                     ((1.0 - 0.85) / nn.m) + 0.85 * COALESCE(s.inr, 0) AS rank
              FROM nodes CROSS JOIN nn
              LEFT JOIN (SELECT ed.dst AS node, SUM(r${t - 1}.rank / ed.d) AS inr
                         FROM ed JOIN r${t - 1} ON r${t - 1}.node = ed.src
                         GROUP BY ed.dst) s
                ON s.node = nodes.node)"""
      s"""WITH c AS (SELECT COUNT(*) AS n FROM documents),
            e AS (SELECT doc_id AS src, (doc_id * 7 + 3) % n AS dst
                  FROM documents CROSS JOIN c
                  UNION ALL
                  SELECT doc_id AS src, (doc_id * 13 + 5) % n AS dst
                  FROM documents CROSS JOIN c),
            nodes AS (SELECT DISTINCT node FROM
                        (SELECT src AS node FROM e
                         UNION ALL SELECT dst AS node FROM e)),
            nn AS (SELECT COUNT(*) AS m FROM nodes),
            deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
            ed AS (SELECT e.src, e.dst, deg.d FROM e JOIN deg USING (src)),
            r0 AS (SELECT node, 1.0 / m AS rank FROM nodes CROSS JOIN nn),
            ${(1 to 8).map(iterCte).mkString(",\n            ")}
          SELECT node, ROUND(rank, 9) AS rank FROM r8 ORDER BY node"""
    })

  /** Standalone connected-components gate ([[graft.ops.Dedup
    * .connectedComponents]] — the large-star/small-star engine the
    * near-dup keep-one path runs, surfaced as its own operator with a
    * full oracle). Planted edge set with bounded diameter so the
    * recursive-CTE oracle terminates fast: doc_id blocks of 9 chained
    * (d ↔ d−1 except at block starts) plus a shortcut (d ↔ d−3 at
    * d ≡ 5) that puts a cycle in every block — components are exactly
    * the 9-blocks, labels their minima. The oracle computes min
    * reachable label by transitive closure, NOT star contraction — an
    * independent definition of the same fixpoint.
    */
  val graphCC = Q("q_graph_cc",
    (s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id")
      val edges = d.filter(pmod(col("doc_id"), lit(9)) =!= 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") - 1).as("id_b"))
        .unionByName(d.filter(pmod(col("doc_id"), lit(9)) === 5)
          .select(col("doc_id").as("id_a"), (col("doc_id") - 3).as("id_b")))
      Dedup.connectedComponents(edges).orderBy("id")
    },
    Some("""WITH RECURSIVE e AS (
              SELECT doc_id AS a, doc_id - 1 AS b FROM documents WHERE doc_id % 9 <> 0
              UNION ALL
              SELECT doc_id AS a, doc_id - 3 AS b FROM documents WHERE doc_id % 9 = 5),
            ed AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
            nodes AS (SELECT DISTINCT a AS n FROM ed),
            reach(n, m) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT r.n, ed.b FROM reach r JOIN ed ON ed.a = r.m)
            SELECT n AS id, MIN(m) AS label FROM reach GROUP BY n ORDER BY id"""))

  /** Fixed-iteration HITS ([[graft.ops.Graph.hits]]) over the same
    * synthetic link graph as the PageRank gate. Unnormalized by design:
    * h₀ = 1 keeps every intermediate an exact integer carried in
    * doubles, so both engines' sums are order-independent and the
    * compare needs NO rounding discipline — the oracle unrolls all four
    * hub/authority half-steps as CTEs.
    */
  val graphHits = Q("q_graph_hits",
    (s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id")
      val cnt = d.count()
      val edges = d.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 3, lit(cnt)).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 5, lit(cnt)).as("dst")))
      Graph.hits(edges, "src", "dst", iters = 4).orderBy("node")
    },
    Some {
      val authCte = (t: Int) =>
        s"""a$t AS (
              SELECT nodes.node, COALESCE(s.v, CAST(0 AS DOUBLE)) AS auth
              FROM nodes LEFT JOIN
                (SELECT e.dst AS node, SUM(h${t - 1}.hub) AS v
                 FROM e JOIN h${t - 1} ON h${t - 1}.node = e.src
                 GROUP BY e.dst) s ON s.node = nodes.node)"""
      val hubCte = (t: Int) =>
        s"""h$t AS (
              SELECT nodes.node, COALESCE(s.v, CAST(0 AS DOUBLE)) AS hub
              FROM nodes LEFT JOIN
                (SELECT e.src AS node, SUM(a$t.auth) AS v
                 FROM e JOIN a$t ON a$t.node = e.dst
                 GROUP BY e.src) s ON s.node = nodes.node)"""
      s"""WITH c AS (SELECT COUNT(*) AS n FROM documents),
            e AS (SELECT doc_id AS src, (doc_id * 7 + 3) % n AS dst
                  FROM documents CROSS JOIN c
                  UNION ALL
                  SELECT doc_id AS src, (doc_id * 13 + 5) % n AS dst
                  FROM documents CROSS JOIN c),
            nodes AS (SELECT DISTINCT node FROM
                        (SELECT src AS node FROM e
                         UNION ALL SELECT dst AS node FROM e)),
            h0 AS (SELECT node, CAST(1 AS DOUBLE) AS hub FROM nodes),
            ${(1 to 4).map(t => authCte(t) + ",\n            " + hubCte(t))
              .mkString(",\n            ")}
          SELECT nodes.node, h4.hub, a4.auth
          FROM nodes JOIN h4 ON h4.node = nodes.node
                     JOIN a4 ON a4.node = nodes.node
          ORDER BY nodes.node"""
    })

  /** Per-node triangle counts ([[graft.ops.Graph.triangleCount]]) over a
    * ring + chords graph (edges i→i+1 and i→i+2 mod n put every node in
    * exactly 3 triangles; the ×7 chord adds irregular ones). The oracle
    * replays the whole degree-orientation pipeline — canonical edges,
    * (deg, id) orientation, apex wedges, the closing-edge join — NOT
    * just the counts, so the dedup/orientation semantics are what's
    * being compared.
    */
  val graphTriangles = Q("q_graph_triangles",
    (s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id")
      val cnt = d.count()
      val edges = d.select(col("doc_id").as("src"),
          pmod(col("doc_id") + 1, lit(cnt)).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          pmod(col("doc_id") + 2, lit(cnt)).as("dst")))
        .unionByName(d.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 3, lit(cnt)).as("dst")))
      Graph.triangleCount(edges, "src", "dst").orderBy("node")
    },
    Some("""WITH c AS (SELECT COUNT(*) AS n FROM documents),
            raw AS (
              SELECT doc_id AS s, (doc_id + 1) % n AS d FROM documents CROSS JOIN c
              UNION ALL
              SELECT doc_id AS s, (doc_id + 2) % n AS d FROM documents CROSS JOIN c
              UNION ALL
              SELECT doc_id AS s, (doc_id * 7 + 3) % n AS d FROM documents CROSS JOIN c),
            und AS (SELECT DISTINCT LEAST(s, d) AS u, GREATEST(s, d) AS v
                    FROM raw WHERE s <> d),
            deg AS (SELECT node, COUNT(*) AS deg FROM
                      (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
                    GROUP BY node),
            o AS (SELECT
                    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
                         THEN u ELSE v END AS a,
                    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
                         THEN v ELSE u END AS b
                  FROM und JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
            ob AS (SELECT o.a, o.b, deg.deg AS bd FROM o JOIN deg ON deg.node = o.b),
            w AS (SELECT x.a, x.b, y.b AS c2 FROM ob x JOIN ob y ON x.a = y.a
                    AND (x.bd < y.bd OR (x.bd = y.bd AND x.b < y.b))),
            t AS (SELECT w.a, w.b, w.c2 FROM w JOIN o ON o.a = w.b AND o.b = w.c2),
            pm AS (SELECT a AS node FROM t UNION ALL SELECT b FROM t
                   UNION ALL SELECT c2 FROM t),
            tc AS (SELECT node, COUNT(*) AS nt FROM pm GROUP BY node)
            SELECT deg.node, CAST(COALESCE(tc.nt, 0) AS BIGINT) AS n_triangles
            FROM deg LEFT JOIN tc USING (node) ORDER BY node"""))

  /** DSIR selection ([[graft.ops.Corpus.dsirSelect]]): top-200 corpus
    * documents by hashed-unigram importance log-ratio against the
    * reference-quality target (sources src0–src3 — the same target the
    * NB gate trains on). The oracle refits BOTH bucket distributions,
    * the Laplace smoothing, every per-doc weighted sum (bucket-level,
    * mirroring Spark's cnt·w aggregation), and the (score desc, id)
    * top-k cut — decision-for-decision, on the rounded score both
    * engines sort by.
    */
  val selectDsir = Q("q_select_dsir",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Corpus.dsirSelect(
        d, d.filter(col("source").isin("src0", "src1", "src2", "src3")),
        "text", "doc_id", k = 200, dim = 256)
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id, source,
                     ('0x' || SUBSTR(MD5(t), 1, 15))::BIGINT % 256 AS b
              FROM (SELECT doc_id, source, UNNEST(LIST_FILTER(
                      STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                      x -> x <> '')) AS t
                    FROM documents)),
            db AS (SELECT doc_id, b, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
            sb AS (SELECT b, COUNT(*) AS sc FROM toks GROUP BY b),
            st AS (SELECT COUNT(*) AS stot FROM toks),
            tb AS (SELECT b, COUNT(*) AS tc FROM toks
                   WHERE source IN ('src0','src1','src2','src3') GROUP BY b),
            tt AS (SELECT COUNT(*) AS ttot FROM toks
                   WHERE source IN ('src0','src1','src2','src3')),
            w AS (
              SELECT sb.b,
                     LN(CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / (ttot + 256)) -
                     LN(CAST(sc + 1 AS DOUBLE) / (stot + 256)) AS wb
              FROM sb LEFT JOIN tb ON tb.b = sb.b
              CROSS JOIN st CROSS JOIN tt),
            per AS (
              SELECT doc_id, SUM(cnt) AS n_tokens, SUM(cnt * wb) AS s
              FROM db JOIN w ON w.b = db.b GROUP BY doc_id),
            scored AS (
              SELECT d.doc_id,
                CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                ROUND(COALESCE(per.s, 0.0), 6) AS log_ratio
              FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id)
            SELECT * FROM (
              SELECT doc_id, n_tokens, log_ratio FROM scored
              ORDER BY log_ratio DESC, doc_id LIMIT 200)
            ORDER BY doc_id"""))

  /** RefinedWeb-style per-domain cap: at most 10 docs per source, chosen
    * by deterministic md5 rank — the mixture-control selection primitive.
    * At sf0.01 every source holds ~25 docs, so the cap genuinely cuts;
    * the oracle replays the identical (md5(seed‖id), id) ranking.
    */
  val selectDomainCap = Q("q_select_domain_cap",
    (s, dir) =>
      Corpus.capPerDomain(
        Tables.documents(s, dir).select("doc_id", "source"),
        "source", "doc_id", cap = 10, seed = "cap0")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, source FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY MD5('cap0' || CAST(doc_id AS VARCHAR)), doc_id) <= 10
            ORDER BY doc_id"""))

  /** Context-window chunking: 32-token windows every 24 tokens (8-token
    * overlap) — one row per (doc, chunk) with 1-based chunk index.
    * Chunking is a pure expression fused into the scan; the explode is
    * narrow (no shuffle), so at 100 TB this runs at parquet-read speed.
    */
  val curateChunk = Q("q_curate_chunk",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(col("doc_id"),
        posexplode(Text.tokenChunks(Text.tokens(col("text")), 32, 24))
          .as(Seq("__pos", "c")))
        .select(col("doc_id"), (col("__pos") + 1).as("chunk_id"),
          col("c.n_tokens").as("n_tokens"), col("c.chunk_text").as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            starts AS (
              SELECT doc_id, t, UNNEST(RANGE(0, LEN(t), 24)) AS s
              FROM toks WHERE LEN(t) > 0)
            SELECT doc_id,
              CAST(s // 24 + 1 AS INTEGER) AS chunk_id,
              CAST(LEN(t[s + 1 : s + 32]) AS INTEGER) AS n_tokens,
              ARRAY_TO_STRING(t[s + 1 : s + 32], ' ') AS chunk_text
            FROM starts
            ORDER BY doc_id, chunk_id"""))

  /** Document fingerprinting: md5 of normalized text (engine-stable). The
    * xxhash64 rolling fingerprint has no DuckDB twin → unit-tested.
    */
  val textFingerprint = Q("q_text_fingerprint",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        Text.fingerprintMd5(col("text")).as("fp_md5"),
        Text.tokenCount(col("text")).cast(LongType).as("n_tokens"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
              MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))) AS fp_md5,
              CAST(LEN(LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '), x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents ORDER BY doc_id"""))

  /** Multimodal plumbing: text treated as an opaque binary payload column
    * with typed metadata (byte length + sha256) — the decode/feature steps
    * ride on this schema via mapPartitions (graft.ops.Multimodal; decode
    * itself is a deterministic stub, container has no codec libs).
    */
  val mmBinary = Q("q_mm_binary_meta",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        col("text").cast(BinaryType).as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast(LongType).as("n_bytes"),
          sha2(col("payload"), 256).as("sha256"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
              CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
              SHA256(text) AS sha256
            FROM documents ORDER BY doc_id"""))

  /** Audio modality, REAL end to end: each document's bytes are wrapped
    * in a PCM WAV envelope (fixture half), then the pure-JVM RIFF parser
    * recovers geometry and duration from the binary header
    * (graft.ops.Multimodal.parseWavHeader). DuckDB never sees the WAV —
    * it independently recomputes the expected numbers arithmetically
    * (duration = bytes × 1000 / byteRate, same operation order for IEEE
    * bit parity), so a parser that misreads any header field fails the
    * gate.
    */
  val mmWav = Q("q_mm_wav_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val wavved = Multimodal.synthesizeWav(docs, "doc_id", "payload",
        sampleRate = 16000, channels = 1, bitsPerSample = 16)
      Multimodal.decodeAudio(wavved, "doc_id", "payload")
        .select(col("doc_id"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.bits_per_sample").as("bits_per_sample"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              16000 AS sample_rate,
              1 AS channels,
              16 AS bits_per_sample,
              CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) * 1000.0 / 32000.0 AS duration_ms
            FROM documents ORDER BY doc_id"""))

  /** MP3 modality, REAL header decode end to end: document bytes wrapped
    * in an ID3v2 tag + MPEG1 Layer III frame envelope (fixture half),
    * then the pure-JVM frame-header parser recovers sample rate, channel
    * mode and the CBR duration estimate. DuckDB recomputes the expected
    * numbers arithmetically — (bytes + 4 header bytes) × 8 / bitrate,
    * identical operation order for IEEE bit parity — so a parser that
    * mis-skips the tag or misreads any header field fails the gate.
    */
  val mmMp3 = Q("q_mm_mp3_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeMp3(docs, "doc_id", "payload",
        bitrateKbps = 128, sampleRate = 44100)
      Multimodal.decodeAudio(enveloped, "doc_id", "payload")
        .select(col("doc_id"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.format").as("format"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              44100 AS sample_rate,
              2 AS channels,
              'mp3' AS format,
              CAST(OCTET_LENGTH(ENCODE(text)) + 4 AS DOUBLE) * 8.0 * 1000.0 / 128000.0 AS duration_ms
            FROM documents ORDER BY doc_id"""))

  /** MP4 modality, REAL header decode end to end: document bytes carried
    * as the mdat body of a minimal ftyp+moov/mvhd container whose mvhd
    * duration field is data.length ticks at timescale 600 (fixture
    * half); the ISO BMFF box walk recovers duration/timescale/brand from
    * the header alone. DuckDB recomputes duration = bytes × 1000 / 600
    * independently — a parser that read the mdat body (or the wrong
    * box) could not produce these numbers.
    */
  val mmMp4 = Q("q_mm_mp4_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeMp4(docs, "doc_id", "payload", timescale = 600)
      Multimodal.decodeVideo(enveloped, "doc_id", "payload")
        .select(col("doc_id"),
          col("n_bytes"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.timescale").as("timescale"),
          col("meta.major_brand").as("major_brand"),
          col("meta.format").as("format"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(OCTET_LENGTH(ENCODE(text)) + 144 AS BIGINT) AS n_bytes,
              CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) * 1000.0 / 600.0 AS duration_ms,
              600 AS timescale,
              'isom' AS major_brand,
              'mp4' AS format
            FROM documents ORDER BY doc_id"""))

  /** Per-sample MP4 metadata, REAL `stbl` parse end to end: document
    * bytes ride as mdat inside an envelope whose stsz/stts/stss tables
    * are arithmetic functions of the byte length (64-byte chunks,
    * 100-tick durations with a len%100 remainder on the last sample,
    * every-5th keyframes — see Multimodal.mp4PayloadWithSamples). DuckDB
    * recomputes every emitted sample row from OCTET_LENGTH alone, so the
    * gate proves the parser walks moov/trak/mdia/minf/stbl and expands
    * the run-length tables correctly — a parser reading the mdat body or
    * inventing a schedule cannot produce these rows.
    */
  val mmMp4Samples = Q("q_mm_mp4_samples",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeMp4WithSamples(docs, "doc_id", "payload",
        timescale = 600, chunkBytes = 64, keyEvery = 5)
      Multimodal.decodeVideoSamples(enveloped, "doc_id", "payload")
        .orderBy("doc_id", "sample_no")
    },
    Some("""WITH d AS (SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS len FROM documents),
            s AS (SELECT doc_id, len,
                         UNNEST(RANGE(1, CAST(CEIL(len / 64.0) AS BIGINT) + 1)) AS i
                  FROM d WHERE len > 0)
            SELECT doc_id,
                   i AS sample_no,
                   CAST(CASE WHEN i * 64 <= len THEN 64 ELSE len - (i - 1) * 64 END AS BIGINT) AS size_bytes,
                   CAST(CASE WHEN i = CAST(CEIL(len / 64.0) AS BIGINT) THEN 100 + len % 100 ELSE 100 END AS BIGINT) AS duration_ticks,
                   CAST((i - 1) * 100 AS BIGINT) AS dts_ticks,
                   (i - 1) * 100 * 1000.0 / 600 AS time_ms,
                   (i - 1) % 5 = 0 AS keyframe
            FROM s ORDER BY doc_id, sample_no"""))

  /** FLAC modality, REAL STREAMINFO decode end to end: document bytes
    * ride as the unread frame section of a fLaC envelope whose
    * total-samples field is data.length; the bit-packed STREAMINFO parse
    * recovers rate/channels/bits/duration from the header alone. DuckDB
    * recomputes duration = bytes × 1000 / 44100 independently.
    */
  val mmFlac = Q("q_mm_flac_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeFlac(docs, "doc_id", "payload",
        sampleRate = 44100, channels = 2, bitsPerSample = 16)
      Multimodal.decodeAudio(enveloped, "doc_id", "payload")
        .select(col("doc_id"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.bits_per_sample").as("bits_per_sample"),
          col("meta.format").as("format"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              44100 AS sample_rate,
              2 AS channels,
              16 AS bits_per_sample,
              'flac' AS format,
              CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) * 1000.0 / 44100.0 AS duration_ms
            FROM documents ORDER BY doc_id"""))

  /** WebP modality, REAL VP8X header decode end to end: canvas
    * dimensions and the alpha flag are derived from the payload length
    * in the fixture and recovered by the RIFF chunk parse; DuckDB
    * recomputes the same arithmetic from OCTET_LENGTH.
    */
  val mmWebp = Q("q_mm_webp_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeWebp(docs, "doc_id", "payload")
      Multimodal.decodeImages(enveloped, "doc_id", "payload")
        .select(col("doc_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.channels").as("channels"),
          col("meta.format").as("format"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(100 + OCTET_LENGTH(ENCODE(text)) % 1000 AS INTEGER) AS width,
              CAST(50 + OCTET_LENGTH(ENCODE(text)) % 500 AS INTEGER) AS height,
              CAST(CASE WHEN OCTET_LENGTH(ENCODE(text)) % 2 = 0 THEN 4 ELSE 3 END AS INTEGER) AS channels,
              'webp' AS format
            FROM documents ORDER BY doc_id"""))

  /** PNG modality, REAL pixels end to end: each document gets a
    * spec-conformant PNG whose geometry, channel count and every byte
    * are closed-form functions of doc_id (Multimodal.pngFixture —
    * scanline filters cycle through all five types), written by the
    * hand-rolled encoder (deflate + filter + CRC) and read back by the
    * hand-rolled decoder (CRC check + inflate + de-filter). DuckDB never
    * sees a PNG — it recomputes the integer pixel aggregates
    * arithmetically from doc_id, so a single mis-filtered byte anywhere
    * in either codec direction moves the position-weighted checksum and
    * fails the gate.
    */
  val mmPngPixels = Q("q_mm_png_pixels",
    (s, dir) => {
      val pngs = Multimodal.synthesizePng(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeImagePixels(pngs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     16 + (doc_id % 50) % 9 AS w,
                     12 + (doc_id % 50) % 7 AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, w * h * ch)) AS i
              FROM dims),
            vals AS (
              SELECT doc_id, w, h, ch, i,
                (g * 7919 + (i // (ch * w)) * (104729 + 2 * g) + ((i // ch) % w) * (131 + 2 * g) + (i % ch) * 17
                 + CASE WHEN ((doc_id // 50) + ((i // ch) % w) * 13 + (i // (ch * w)) * 7) % 89 = 0
                        THEN 128 ELSE 0 END) % 256 AS v
              FROM px)
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                   CAST(ch AS INTEGER) AS channels,
                   CAST(SUM(v) AS BIGINT) AS sum_val,
                   CAST(SUM((v + 1) * (i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v) AS INTEGER) AS min_val,
                   CAST(MAX(v) AS INTEGER) AS max_val
            FROM vals GROUP BY doc_id, w, h, ch ORDER BY doc_id"""))

  /** JPEG modality, REAL pixels end to end through the hand-rolled
    * baseline codec (Jpeg.scala — FDCT + Huffman entropy coding one way,
    * marker parse + Huffman decode + dequant + IDCT + JFIF color
    * conversion the other). Every fixture image is BLOCK-CONSTANT, which
    * makes the lossy codec exact by construction: constant 8×8 tiles
    * have DC-only DCT coefficients and the fixture quant table's DC step
    * of 8 divides them out losslessly (see Jpeg scaladoc). DuckDB never
    * sees a JPEG — it recomputes each decoded pixel from the per-block
    * closed form, including the floor(x+0.5) JFIF YCbCr→RGB arithmetic
    * for the color half of the corpus, so a one-bit Huffman slip or an
    * IDCT scaling error anywhere moves the position-weighted checksum.
    */
  val mmJpegPixels = Q("q_mm_jpeg_pixels",
    (s, dir) => {
      val jpgs = Multimodal.synthesizeJpeg(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeImagePixels(jpgs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     8 * (2 + (doc_id % 50) % 3) AS w,
                     8 * (1 + (doc_id % 50) % 2) AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, w * h * ch)) AS i
              FROM dims),
            m AS (
              SELECT doc_id, g, w, h, ch, i,
                     (i // ch) % w AS x, i // (ch * w) AS y, i % ch AS c
              FROM px),
            bv AS (
              SELECT doc_id, g, ch, i, c,
                     CAST((g*37 + (doc_id // 50)*31 + (x // 8)*(19 + 2*g)
                           + (y // 8)*(29 + 2*g)) % 256 AS DOUBLE) AS yv,
                     CAST((g*37 + (doc_id // 50)*31 + (x // 8)*(19 + 2*g)
                           + (y // 8)*(29 + 2*g) + 41) % 256 AS DOUBLE) AS cb,
                     CAST((g*37 + (doc_id // 50)*31 + (x // 8)*(19 + 2*g)
                           + (y // 8)*(29 + 2*g) + 82) % 256 AS DOUBLE) AS cr
              FROM m),
            vals AS (
              SELECT doc_id, ch, i,
                     CASE WHEN ch = 1 THEN CAST(yv AS INTEGER)
                          WHEN c = 0 THEN LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv + (1.402::DOUBLE) * (cr - 128.0) + 0.5) AS INTEGER)))
                          WHEN c = 1 THEN LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv - (0.344136::DOUBLE) * (cb - 128.0)
                               - (0.714136::DOUBLE) * (cr - 128.0) + 0.5) AS INTEGER)))
                          ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv + (1.772::DOUBLE) * (cb - 128.0) + 0.5) AS INTEGER)))
                     END AS v
              FROM bv),
            dims2 AS (SELECT doc_id, w, h, ch FROM dims)
            SELECT d.doc_id,
                   CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   CAST(SUM(v.v) AS BIGINT) AS sum_val,
                   CAST(SUM((v.v + 1) * (v.i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v.v) AS INTEGER) AS min_val,
                   CAST(MAX(v.v) AS INTEGER) AS max_val
            FROM dims2 d JOIN vals v ON d.doc_id = v.doc_id
            GROUP BY d.doc_id, d.w, d.h, d.ch ORDER BY d.doc_id"""))

  /** CROSS-CODEC resize: decode the block-constant JPEG fixture through
    * the hand-rolled baseline decoder → nearest-resample to 10×7 →
    * re-encode as PNG → decode again for the stats — one row round-trips
    * BOTH image codecs with the resample arithmetic in between. Exact
    * because the JPEG leg is lossless on block-constant fixtures and the
    * PNG leg is lossless always; DuckDB recomputes each resized byte
    * from the source block at (sx·8⁻¹, sy·8⁻¹) including the JFIF color
    * conversion the decoder applied before the resample.
    */
  val mmJpegResize = Q("q_mm_jpeg_resize",
    (s, dir) => {
      val jpgs = Multimodal.synthesizeJpeg(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      val resized = Multimodal.resizeImages(jpgs, "doc_id", "payload",
        outW = 10, outH = 7, method = "nearest")
      Multimodal.decodeImagePixels(resized, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     8 * (2 + (doc_id % 50) % 3) AS w,
                     8 * (1 + (doc_id % 50) % 2) AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, 10 * 7 * ch)) AS i
              FROM dims),
            m AS (
              SELECT doc_id, g, w, h, ch, i,
                     ((i // ch) % 10 * w) // 10 AS sx,
                     (i // (ch * 10) * h) // 7 AS sy,
                     i % ch AS c
              FROM px),
            bv AS (
              SELECT doc_id, g, ch, i, c,
                     CAST((g*37 + (doc_id // 50)*31 + (sx // 8)*(19 + 2*g)
                           + (sy // 8)*(29 + 2*g)) % 256 AS DOUBLE) AS yv,
                     CAST((g*37 + (doc_id // 50)*31 + (sx // 8)*(19 + 2*g)
                           + (sy // 8)*(29 + 2*g) + 41) % 256 AS DOUBLE) AS cb,
                     CAST((g*37 + (doc_id // 50)*31 + (sx // 8)*(19 + 2*g)
                           + (sy // 8)*(29 + 2*g) + 82) % 256 AS DOUBLE) AS cr
              FROM m),
            vals AS (
              SELECT doc_id, ch, i,
                     CASE WHEN ch = 1 THEN CAST(yv AS INTEGER)
                          WHEN c = 0 THEN LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv + (1.402::DOUBLE) * (cr - 128.0) + 0.5) AS INTEGER)))
                          WHEN c = 1 THEN LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv - (0.344136::DOUBLE) * (cb - 128.0)
                               - (0.714136::DOUBLE) * (cr - 128.0) + 0.5) AS INTEGER)))
                          ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv + (1.772::DOUBLE) * (cb - 128.0) + 0.5) AS INTEGER)))
                     END AS v
              FROM bv)
            SELECT d.doc_id,
                   10 AS width, 7 AS height, CAST(d.ch AS INTEGER) AS channels,
                   CAST(SUM(v.v) AS BIGINT) AS sum_val,
                   CAST(SUM((v.v + 1) * (v.i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v.v) AS INTEGER) AS min_val,
                   CAST(MAX(v.v) AS INTEGER) AS max_val
            FROM dims d JOIN vals v ON d.doc_id = v.doc_id
            GROUP BY d.doc_id, d.ch ORDER BY d.doc_id"""))

  /** REAL GIF decode through the hand-rolled LZW codec
    * (`ops/Gif.scala`): the palette-indexed fixture — half the corpus
    * interlaced — is decoded by [[Multimodal.decodeImagePixels]], and
    * DuckDB recomputes every RGB byte as palette arithmetic over the
    * closed-form index arithmetic, never seeing a GIF byte. A one-bit
    * LZW slip, a width-growth off-by-one, or a deinterlace error moves
    * the position-weighted checksum.
    */
  val mmGifPixels = Q("q_mm_gif_pixels",
    (s, dir) => {
      val gifs = Multimodal.synthesizeGif(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeImagePixels(gifs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     11 + (doc_id % 50) % 8 AS w,
                     7 + (doc_id % 50) % 5 AS h,
                     CASE (doc_id % 50) % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 16 END AS nc
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, nc, UNNEST(RANGE(0, w * h * 3)) AS i
              FROM dims),
            m AS (
              SELECT doc_id, g, w, h, nc, i,
                     (i // 3) % w AS x, i // (3 * w) AS y, i % 3 AS c
              FROM px),
            pv AS (
              SELECT doc_id, g, w, h, i, c,
                     (x * 7 + y * 11 + doc_id // 50 + g) % nc AS p
              FROM m),
            vals AS (
              SELECT doc_id, w, h, i,
                     CASE c WHEN 0 THEN (p * 37 + g * 11) % 256
                            WHEN 1 THEN (p * 59 + g * 13) % 256
                            ELSE (p * 83 + g * 17) % 256 END AS v
              FROM pv)
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                   CAST(3 AS INTEGER) AS channels,
                   CAST(SUM(v) AS BIGINT) AS sum_val,
                   CAST(SUM((v + 1) * (i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v) AS INTEGER) AS min_val,
                   CAST(MAX(v) AS INTEGER) AS max_val
            FROM vals GROUP BY doc_id, w, h ORDER BY doc_id"""))

  /** REAL BMP decode through the hand-rolled DIB codec
    * (`ops/Bmp.scala`): 24-bit BI_RGB fixtures with odd widths (DWORD
    * row padding load-bearing), decoded by
    * [[Multimodal.decodeImagePixels]]; DuckDB recomputes every RGB byte
    * from the gradient closed form. A BGR swap, a padding slip, or a
    * bottom-up row-order error moves the position-weighted checksum.
    */
  val mmBmpPixels = Q("q_mm_bmp_pixels",
    (s, dir) => {
      val bmps = Multimodal.synthesizeBmp(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeImagePixels(bmps, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     13 + (doc_id % 50) % 7 AS w,
                     6 + (doc_id % 50) % 5 AS h
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, UNNEST(RANGE(0, w * h * 3)) AS i
              FROM dims),
            vals AS (
              SELECT doc_id, w, h, i,
                     ((i // 3) % w * (11 + g) + i // (3 * w) * (17 + 2 * g)
                      + (i % 3) * 41 + doc_id // 50) % 256 AS v
              FROM px)
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                   CAST(3 AS INTEGER) AS channels,
                   CAST(SUM(v) AS BIGINT) AS sum_val,
                   CAST(SUM((v + 1) * (i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v) AS INTEGER) AS min_val,
                   CAST(MAX(v) AS INTEGER) AS max_val
            FROM vals GROUP BY doc_id, w, h ORDER BY doc_id"""))

  /** CROSS-CODEC audio resample: the WAV fixture decodes through the
    * PCM path, nearest-resamples to 4 kHz on integer index arithmetic
    * (out[i] = src[(i·srcRate)/4000], m = n·4000/srcRate samples), is
    * re-encoded by the FLAC encoder, and decodes AGAIN for the stats —
    * one row round-trips both audio codecs with the resample in
    * between, the audio twin of q_mm_jpeg_resize. DuckDB recomputes
    * every resampled sample from the fixture closed form at the source
    * index.
    */
  val mmAudioResample = Q("q_mm_audio_resample",
    (s, dir) => {
      val wavs = Multimodal.synthesizeWavPcm(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      val resampled = Multimodal.resampleAudio(wavs, "doc_id", "payload", dstRate = 4000)
      Multimodal.decodeAudioPcm(resampled, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH geo AS (
       |  SELECT doc_id, doc_id % 50 AS g,
       |         CASE (doc_id % 50) % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 11025 END AS rate,
       |         1 + (doc_id % 50) % 2 AS ch,
       |         400 + (doc_id % 50) * 13 AS n,
       |         (doc_id % 50) % 7 - 3 AS slope,
       |         doc_id % 997 - 498 AS base
       |  FROM documents),
       |res AS (
       |  SELECT doc_id, rate, ch, n, slope, base,
       |         (n * 4000) // rate AS m
       |  FROM geo),
       |idxs AS (
       |  SELECT doc_id, rate, ch, n, m, slope, base, UNNEST(RANGE(0, m * ch)) AS j
       |  FROM res),
       |src AS (
       |  SELECT doc_id, rate, ch, n, m, slope, base, j,
       |         LEAST(n - 1, ((j // ch) * rate) // 4000) AS si
       |  FROM idxs),
       |vals AS (
       |  SELECT doc_id, ch, m, j,
       |         slope * si + base
       |           + (doc_id * 31 + (j % ch) * 7919 + si * 104729) % 23 - 11 AS v
       |  FROM src)
       |SELECT doc_id,
       |       CAST(4000 AS INTEGER) AS sample_rate,
       |       CAST(ch AS INTEGER) AS channels,
       |       CAST(16 AS INTEGER) AS bits_per_sample,
       |       CAST(m AS BIGINT) AS n_samples,
       |       CAST(SUM(v) AS BIGINT) AS sum_val,
       |       CAST(SUM((v + 32769) * (j + 1)) AS BIGINT) AS sample_checksum,
       |       CAST(MIN(v) AS INTEGER) AS min_val,
       |       CAST(MAX(v) AS INTEGER) AS max_val
       |FROM vals GROUP BY doc_id, ch, m ORDER BY doc_id""".stripMargin))

  /** REAL audio feature extraction through the FLAC codec: energy,
    * per-channel zero crossings, peak amplitude — the cheap audio
    * quality signals a curation pipeline filters on. Integer-exact, so
    * DuckDB recomputes all three from the fixture closed form (the
    * zero-crossing count needs LAG over the reconstructed per-channel
    * sample sequence — an off-by-one in channel de-interleaving or
    * sample order shows up immediately).
    */
  val mmAudioFeatures = Q("q_mm_audio_features",
    (s, dir) => {
      val flacs = Multimodal.synthesizeFlacPcm(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.audioFeatures(flacs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH geo AS (
       |  SELECT doc_id, doc_id % 50 AS g,
       |         CASE (doc_id % 50) % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 11025 END AS rate,
       |         1 + (doc_id % 50) % 2 AS ch,
       |         400 + (doc_id % 50) * 13 AS n,
       |         (doc_id % 50) % 7 - 3 AS slope,
       |         doc_id % 997 - 498 AS base
       |  FROM documents),
       |idxs AS (
       |  SELECT doc_id, rate, ch, n, slope, base, UNNEST(RANGE(0, n * ch)) AS j
       |  FROM geo),
       |vals AS (
       |  SELECT doc_id, rate, ch, n,
       |         j % ch AS c, j // ch AS i,
       |         slope * (j // ch) + base
       |           + (doc_id * 31 + (j % ch) * 7919 + (j // ch) * 104729) % 23 - 11 AS v
       |  FROM idxs),
       |lagd AS (
       |  SELECT doc_id, rate, ch, n, c, i, v,
       |         LAG(v) OVER (PARTITION BY doc_id, c ORDER BY i) AS pv
       |  FROM vals)
       |SELECT doc_id,
       |       CAST(rate AS INTEGER) AS sample_rate,
       |       CAST(ch AS INTEGER) AS channels,
       |       CAST(n AS BIGINT) AS n_samples,
       |       CAST(SUM(v * v) AS BIGINT) AS energy,
       |       CAST(SUM(CASE WHEN pv IS NOT NULL AND (v < 0) <> (pv < 0)
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       |       CAST(MAX(ABS(v)) AS INTEGER) AS peak_abs
       |FROM lagd GROUP BY doc_id, rate, ch, n ORDER BY doc_id""".stripMargin))

  /** REAL lossless audio decode: the hand-rolled FLAC codec
    * (`ops/Flac.scala` — FIXED+Rice frames, stereo decorrelation,
    * CRC-8/CRC-16/MD5 verified) encodes a closed-form PCM fixture per
    * document and [[Multimodal.decodeAudioPcm]] decodes it back for
    * per-row sample stats. FLAC is lossless by construction, so DuckDB
    * recomputes every decoded sample from the fixture arithmetic
    * without ever seeing a FLAC byte — a one-bit Rice slip, predictor
    * error, or channel-decorrelation mistake anywhere moves the
    * position-and-channel-weighted checksum.
    */
  private val audioPcmOracle: String =
    """WITH geo AS (
       |  SELECT doc_id, doc_id % 50 AS g,
       |         CASE (doc_id % 50) % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 11025 END AS rate,
       |         1 + (doc_id % 50) % 2 AS ch,
       |         400 + (doc_id % 50) * 13 AS n,
       |         (doc_id % 50) % 7 - 3 AS slope,
       |         doc_id % 997 - 498 AS base
       |  FROM documents),
       |idxs AS (
       |  SELECT doc_id, rate, ch, n, slope, base, UNNEST(RANGE(0, n * ch)) AS j
       |  FROM geo),
       |vals AS (
       |  SELECT doc_id, rate, ch, n, j,
       |         slope * (j // ch) + base
       |           + (doc_id * 31 + (j % ch) * 7919 + (j // ch) * 104729) % 23 - 11 AS v
       |  FROM idxs)
       |SELECT doc_id,
       |       CAST(rate AS INTEGER) AS sample_rate,
       |       CAST(ch AS INTEGER) AS channels,
       |       CAST(16 AS INTEGER) AS bits_per_sample,
       |       CAST(n AS BIGINT) AS n_samples,
       |       CAST(SUM(v) AS BIGINT) AS sum_val,
       |       CAST(SUM((v + 32769) * (j + 1)) AS BIGINT) AS sample_checksum,
       |       CAST(MIN(v) AS INTEGER) AS min_val,
       |       CAST(MAX(v) AS INTEGER) AS max_val
       |FROM vals GROUP BY doc_id, rate, ch, n ORDER BY doc_id""".stripMargin

  val mmFlacPcm = Q("q_mm_flac_pcm",
    (s, dir) => {
      val flacs = Multimodal.synthesizeFlacPcm(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeAudioPcm(flacs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some(audioPcmOracle))

  /** Same PCM fixture through the 16-bit WAV path of
    * [[Multimodal.decodeAudioPcm]] — the two codecs share one oracle,
    * so a FLAC-vs-WAV disagreement can only be a codec bug, never a
    * fixture ambiguity (FlacSpec asserts their equality row-by-row).
    */
  val mmWavPcm = Q("q_mm_wav_pcm",
    (s, dir) => {
      val wavs = Multimodal.synthesizeWavPcm(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeAudioPcm(wavs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some(audioPcmOracle))

  /** REAL image resize: decode → nearest-neighbor resample to 10×7 →
    * re-encode as PNG → decode AGAIN for the stats, so every row
    * round-trips the codec twice and the resample arithmetic sits in
    * between. DuckDB recomputes each resized byte from the source-pixel
    * closed form at sx=(x·w)//10, sy=(y·h)//7 — integer-exact, no
    * sampling convention ambiguity.
    */
  val mmPngResize = Q("q_mm_png_resize",
    (s, dir) => {
      val pngs = Multimodal.synthesizePng(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      val resized = Multimodal.resizeImages(pngs, "doc_id", "payload",
        outW = 10, outH = 7, method = "nearest")
      Multimodal.decodeImagePixels(resized, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     16 + (doc_id % 50) % 9 AS w,
                     12 + (doc_id % 50) % 7 AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, 10 * 7 * ch)) AS i
              FROM dims),
            m AS (
              SELECT doc_id, g, w, h, ch, i,
                     (i // ch) % 10 AS x, i // (ch * 10) AS y, i % ch AS c
              FROM px),
            vals AS (
              SELECT doc_id, ch, i,
                (g * 7919 + ((y * h) // 7) * (104729 + 2 * g) + ((x * w) // 10) * (131 + 2 * g) + c * 17
                 + CASE WHEN ((doc_id // 50) + ((x * w) // 10) * 13 + ((y * h) // 7) * 7) % 89 = 0
                        THEN 128 ELSE 0 END) % 256 AS v
              FROM m)
            SELECT doc_id,
                   10 AS width, 7 AS height, CAST(ch AS INTEGER) AS channels,
                   CAST(SUM(v) AS BIGINT) AS sum_val,
                   CAST(SUM((v + 1) * (i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v) AS INTEGER) AS min_val,
                   CAST(MAX(v) AS INTEGER) AS max_val
            FROM vals GROUP BY doc_id, ch ORDER BY doc_id"""))

  /** Perceptual image hash (dHash), fully oracled: gray values (integer
    * (r+g+b)/3) nearest-sampled on the 9×8 grid, bit y·8+x set when the
    * right neighbor is strictly brighter. DuckDB rebuilds the 64-bit
    * signature from the pixel closed form (HUGEINT bit sum, two's-
    * complement-folded to BIGINT) — decoder, gray conversion, sampling
    * and bit packing all verified byte-exactly.
    */
  val mmImageDhash = Q("q_mm_image_dhash",
    (s, dir) => {
      val pngs = Multimodal.synthesizePng(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.imageDHash(pngs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     16 + (doc_id % 50) % 9 AS w,
                     12 + (doc_id % 50) % 7 AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            r8 AS (SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, 8)) AS gy FROM dims),
            grid AS (SELECT doc_id, g, w, h, ch, gy, UNNEST(RANGE(0, 9)) AS gx FROM r8),
            samp AS (SELECT doc_id, g, ch, gx, gy,
                            (gx * w) // 9 AS sx, (gy * h) // 8 AS sy
                     FROM grid),
            chanv AS (SELECT doc_id, g, ch, gx, gy, sx, sy, UNNEST(RANGE(0, ch)) AS c
                      FROM samp),
            cv AS (SELECT doc_id, ch, gx, gy,
                     (g * 7919 + sy * (104729 + 2 * g) + sx * (131 + 2 * g) + c * 17
                      + CASE WHEN ((doc_id // 50) + sx * 13 + sy * 7) % 89 = 0
                             THEN 128 ELSE 0 END) % 256 AS v
                   FROM chanv),
            gray AS (SELECT doc_id, gx, gy, SUM(v) // MAX(ch) AS gv
                     FROM cv GROUP BY doc_id, gx, gy),
            bits AS (SELECT a.doc_id,
                       CASE WHEN b.gv > a.gv
                            THEN POWER(2, a.gy * 8 + a.gx)::HUGEINT
                            ELSE 0::HUGEINT END AS bit
                     FROM gray a JOIN gray b
                       ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
                     WHERE a.gx < 8),
            sig AS (SELECT doc_id, SUM(bit) AS s FROM bits GROUP BY doc_id)
            SELECT doc_id,
                   CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
                             THEN s - 18446744073709551616::HUGEINT
                             ELSE s END AS BIGINT) AS dhash
            FROM sig ORDER BY doc_id"""))

  /** Image near-duplicate pairs: dHash signatures through the same
    * chunk-pigeonhole pairing as SimHash (Dedup.hammingPairs — 9 disjoint
    * chunks for radius 8, recall-complete, never all-pairs). The fixture
    * makes id%50 groups near-identical (sparse 1-in-89 pixel
    * perturbation keyed on id//50) while group-dependent gradient slopes
    * keep cross-group images dissimilar, so the radius-8 screen finds
    * exactly the same-group pairs plus a thin tail. DuckDB rebuilds every
    * signature and takes exact all-pairs at ≤ 8 — candidate-generation
    * recall and verify both gated.
    */
  val mmImageNearDup = Q("q_mm_image_neardup",
    (s, dir) => {
      val pngs = Multimodal.synthesizePng(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      val sigs = Multimodal.imageDHash(pngs, "doc_id", "payload")
      Dedup.hammingPairs(sigs, "dhash", "doc_id", maxHamming = 8)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     16 + (doc_id % 50) % 9 AS w,
                     12 + (doc_id % 50) % 7 AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            r8 AS (SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, 8)) AS gy FROM dims),
            grid AS (SELECT doc_id, g, w, h, ch, gy, UNNEST(RANGE(0, 9)) AS gx FROM r8),
            samp AS (SELECT doc_id, g, ch, gx, gy,
                            (gx * w) // 9 AS sx, (gy * h) // 8 AS sy
                     FROM grid),
            chanv AS (SELECT doc_id, g, ch, gx, gy, sx, sy, UNNEST(RANGE(0, ch)) AS c
                      FROM samp),
            cv AS (SELECT doc_id, ch, gx, gy,
                     (g * 7919 + sy * (104729 + 2 * g) + sx * (131 + 2 * g) + c * 17
                      + CASE WHEN ((doc_id // 50) + sx * 13 + sy * 7) % 89 = 0
                             THEN 128 ELSE 0 END) % 256 AS v
                   FROM chanv),
            gray AS (SELECT doc_id, gx, gy, SUM(v) // MAX(ch) AS gv
                     FROM cv GROUP BY doc_id, gx, gy),
            bits AS (SELECT a.doc_id,
                       CASE WHEN b.gv > a.gv
                            THEN POWER(2, a.gy * 8 + a.gx)::HUGEINT
                            ELSE 0::HUGEINT END AS bit
                     FROM gray a JOIN gray b
                       ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
                     WHERE a.gx < 8),
            sig AS (SELECT doc_id, SUM(bit) AS s FROM bits GROUP BY doc_id)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(BIT_COUNT(XOR(a.s, b.s)) AS INTEGER) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE BIT_COUNT(XOR(a.s, b.s)) <= 8
            ORDER BY id_a, id_b"""))

  /** End-to-end curation pipeline gate: the full composed stage
    * (graft.pipeline.Curate — exact dedup → near-dup keep-one → quality
    * filter → PII scrub → hash split → chunking) against ONE DuckDB
    * oracle that re-derives every step relationally. Per-op gates can't
    * catch composition bugs (filter-before-dedup changing cluster minima,
    * scrub-after-chunk shifting window boundaries, split keyed on the
    * wrong text) — this one does: any reordering moves chunk boundaries
    * or split labels and fails the hash.
    *
    * The corpus carries no PII, so the gate plants one constant
    * email+URL+phone tail on every document (same string for all docs —
    * a doc_id-specific tail would destroy the exact-dup groups the dedup
    * steps need to exercise). The scrub step must strip it before the
    * split key and chunk windows are computed.
    */
  val curateE2E = Q("q_curate_e2e",
    (s, dir) => {
      val planted = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(col("text"),
          lit(" contact user@example.com or https://ex.com/d/x42 tel +265 99 123 4567"))
          .as("text"))
      graft.pipeline.Curate(planted).orderBy("doc_id", "chunk_id")
    },
    Some(curateOracle(plantTail = true)))

  /** Screens-ON twin of [[curateE2E]] — the round-11 verdict's
    * composition-gap item: foldAccents, the CCNet perplexity-bucket
    * screen and DSIR selection are each per-op-oracled but ran
    * default-OFF in both e2e gates, leaving exactly the
    * fold→dedup-keying and screen→quality-ordering composition surface
    * untested. This gate runs the chain with all three on:
    *
    *   - the corpus is doubled with ACCENTED TWINS (doc_id+10⁷,
    *     a/e→á/é) — fold-before-dedup collapses every twin into its
    *     original's exact-dup bucket (keep-one drops it); fold in any
    *     later slot would leave twins alive (their shingles differ in
    *     nearly every position, so near-dup wouldn't catch them) and
    *     shift every downstream hash;
    *   - the perplexity screen (keep head+middle) is FIT on the deduped
    *     survivors — fitting on the raw corpus would double-weight the
    *     twins' tokens and move the tertile cuts;
    *   - DSIR (top-120 vs the src0–3 target) runs LAST of the
    *     document-level stages, over quality-passing docs only.
    *
    * One oracle replays the whole composition: strip_accents → exact
    * dedup → near-dup closure → LM fit + tertile cuts + keep → token
    * band → hashed-unigram importance weights + top-k cut → scrub →
    * split → chunk. Any stage reordering moves the final chunk set.
    *
    * COST NOTE: this is, by construction, the suite's most expensive
    * gate (~23 s vs curateE2E's ~12.5 s clean at sf0.1) — it pushes a
    * DOUBLED copy of the planted-tail corpus through the near-dup
    * candidate stage, whose true pair count is corpus²-shaped on this
    * corpus (see curateE2EScale's scaladoc); 2× docs ≈ 4× pairs in the
    * stage that already dominates curateE2E's wall (60%, see
    * docs/CURATE_E2E_ATTRIBUTION.md). Like curateE2E it is excluded
    * from every scale set for exactly that reason — the composition
    * coverage needs the planted structure; scaling claims don't.
    */
  val curateE2EScreens = Q("q_curate_e2e_screens",
    (s, dir) => {
      val planted = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(col("text"),
          lit(" contact user@example.com or https://ex.com/d/x42 tel +265 99 123 4567"))
          .as("text"),
        col("lang"), col("source"))
      val twins = planted.select(
        (col("doc_id") + lit(10000000L)).as("doc_id"),
        translate(col("text"), "ae", "\u00e1\u00e9").as("text"),
        col("lang"), col("source"))
      val target = planted.filter(col("source").isin("src0", "src1", "src2", "src3"))
      graft.pipeline.Curate(planted.unionByName(twins),
        foldAccents = true,
        pplKeepBuckets = Seq("head", "middle"), pplLangCol = Some("lang"),
        dsirTarget = Some(target), dsirK = 120)
        .orderBy("doc_id", "chunk_id")
    },
    Some(curateScreensOracle))

  /** MinHash-family twin of [[curateE2E]]: the identical composed
    * pipeline with `nearDupFamily = "minhash"` — the keep-one stage's
    * candidates come from 64×2 banding instead of the shingle inverted
    * index. Threshold 0.5 (the banding config's oracled operating point:
    * a true pair at j ≥ 0.5 escapes all bands with p ≈ 1e-8, so the
    * exact-definition oracle applies — same argument as [[dedupMinhash]];
    * at the planted corpus's 0.2 the banding would need planner-sized
    * re-tuning and the pair list is corpus²-shaped anyway). What this
    * gate pins is the COMPOSITION: the family swap must change only
    * which pairs fn runs — exact dedup before it, and every stage after
    * the keep-one (quality, scrub, split, chunk), must hash identically
    * against the shared oracle body at the matching threshold.
    *
    * SCALE POSTURE: excluded from every scale set, like its planted
    * siblings — and with a second, family-specific reason: the gate's
    * FIXED 64×2 banding (pinned for oracle determinism) is the planner
    * trap at corpus scale. On the planted corpus every pair has
    * background similarity ≈ 0.1 through the shared tail, and r=2 gives
    * each pair a ~47% per-run band-collision probability at 500k docs —
    * ~10¹¹ candidates (measured: heap OOM at sf100, while the
    * planner-sized q_dedup_minhash_lsh_auto runs the same corpus in
    * ~30 s). Scale users set `minhashBands = 0` (curation.minhash_bands)
    * to get planMinhashLsh sizing from the actual corpus.
    */
  val curateE2EMinhash = Q("q_curate_e2e_minhash",
    (s, dir) => {
      val planted = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(col("text"),
          lit(" contact user@example.com or https://ex.com/d/x42 tel +265 99 123 4567"))
          .as("text"))
      graft.pipeline.Curate(planted, jaccardThreshold = 0.5,
        nearDupFamily = "minhash")
        .orderBy("doc_id", "chunk_id")
    },
    Some(curateOracle(plantTail = true, jaccardThreshold = 0.5)))

  /** Scale twin of [[curateE2E]]: the identical composed pipeline over
    * the RAW corpus — no planted contact tail. The planted gate's corpus
    * is quadratic BY CONSTRUCTION at scale: every document shares the
    * same 9-token tail, so at jaccard 0.2 any two sufficiently short
    * documents are GENUINE near-dups through the tail alone (the true
    * pair count grows as corpus², ~11M pairs at 50k docs) — correct for
    * exercising scrub+dedup composition at gate scale, meaningless as a
    * scale benchmark. This twin is what belongs in a scale smoke: the
    * raw corpus' near-dup structure stays sparse as it grows.
    */
  val curateE2EScale = Q("q_curate_e2e_scale",
    (s, dir) =>
      graft.pipeline.Curate(Tables.documents(s, dir)).orderBy("doc_id", "chunk_id"),
    Some(curateOracle(plantTail = false)))

  /** One oracle body for both curate e2e gates: identical pipeline SQL,
    * with or without the planted PII tail on the input corpus.
    */
  private def curateOracle(plantTail: Boolean,
                           jaccardThreshold: Double = 0.2): String = {
    val base =
      if (plantTail)
        """base AS (
              SELECT doc_id,
                     text || ' contact user@example.com or https://ex.com/d/x42 tel +265 99 123 4567' AS text
              FROM documents),"""
      else
        """base AS (SELECT doc_id, text FROM documents),"""
    """WITH RECURSIVE
            """ + base + """
            -- exact dedup: keep min doc_id per normalized text
            norm AS (
              SELECT doc_id, text,
                     TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS ntext
              FROM base),
            exact AS (
              SELECT doc_id, text, ntext FROM norm
              WHERE doc_id IN (SELECT MIN(doc_id) FROM norm GROUP BY ntext)),
            -- near-dup keep-one over the exact survivors (word-3-shingles,
            -- jaccard >= threshold, transitive closure, keep cluster min)
            toks AS (SELECT doc_id, text, STRING_SPLIT(ntext, ' ') AS t FROM exact),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, LEN(shingles) AS ns, UNNEST(shingles) AS g FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
              HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= """ +
      jaccardThreshold.toString + """),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (
              SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
            losers AS (SELECT id FROM labels WHERE label <> id),
            surv AS (
              SELECT doc_id, text, t FROM toks
              WHERE doc_id NOT IN (SELECT id FROM losers)),
            -- quality filter on the pre-scrub text
            qf AS (
              SELECT doc_id, text FROM surv
              WHERE LEN(t) BETWEEN 30 AND 200
                AND (CAST(LEN(text) - LEN(t) + 1 AS DOUBLE) / LEN(t)) BETWEEN 2.0 AND 12.0),
            -- PII scrub (same pattern strings as the Spark expressions)
            scr AS (
              SELECT doc_id,
                REGEXP_REPLACE(
                  REGEXP_REPLACE(
                    REGEXP_REPLACE(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    'https?://[^ ]+', '<URL>', 'g'),
                  '\+[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g') AS stext
              FROM qf),
            -- content-hash split keyed on the scrubbed normalized text
            spl AS (
              SELECT doc_id, stext,
                CASE WHEN SUBSTR(MD5(TRIM(REGEXP_REPLACE(LOWER(stext), '\s+', ' ', 'g'))), 1, 2) < 'cd' THEN 'train'
                     WHEN SUBSTR(MD5(TRIM(REGEXP_REPLACE(LOWER(stext), '\s+', ' ', 'g'))), 1, 2) < 'e6' THEN 'valid'
                     ELSE 'test' END AS split
              FROM scr),
            -- context-window chunking of the scrubbed text
            stoks AS (
              SELECT doc_id, split,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(stext), '\s+', ' ', 'g')), ' ') AS t
              FROM spl),
            starts AS (
              SELECT doc_id, split, t, UNNEST(RANGE(0, LEN(t), 24)) AS s
              FROM stoks WHERE LEN(t) > 0)
            SELECT doc_id, split,
              CAST(s // 24 + 1 AS INTEGER) AS chunk_id,
              CAST(LEN(t[s + 1 : s + 32]) AS INTEGER) AS n_tokens,
              ARRAY_TO_STRING(t[s + 1 : s + 32], ' ') AS chunk_text
            FROM starts
            ORDER BY doc_id, chunk_id"""
  }

  /** Oracle for [[curateE2EScreens]]: the [[curateOracle]] body with the
    * accent fold, the survivor-fit perplexity screen and the DSIR top-k
    * cut spliced into their pipeline slots. Accented characters are
    * \u-escaped in source to pin the encoding (the StripSuffix rule).
    */
  private def curateScreensOracle: String = {
    val ae = "\u00e1\u00e9" // a-acute e-acute, the twins' a/e replacements
    """WITH RECURSIVE
            base0 AS (
              SELECT doc_id,
                     text || ' contact user@example.com or https://ex.com/d/x42 tel +265 99 123 4567' AS text,
                     lang, source
              FROM documents),
            base AS (
              SELECT doc_id, text, lang FROM base0
              UNION ALL
              SELECT doc_id + 10000000, TRANSLATE(text, 'ae', '""" + ae + """'), lang FROM base0),
            -- accent fold BEFORE any content keying
            folded AS (SELECT doc_id, STRIP_ACCENTS(text) AS text, lang FROM base),
            norm AS (
              SELECT doc_id, text, lang,
                     TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS ntext
              FROM folded),
            exact AS (
              SELECT doc_id, text, lang, ntext FROM norm
              WHERE doc_id IN (SELECT MIN(doc_id) FROM norm GROUP BY ntext)),
            toks AS (SELECT doc_id, text, lang, STRING_SPLIT(ntext, ' ') AS t FROM exact),
            sh AS (
              SELECT doc_id,
                CASE WHEN LEN(t) <= 3 THEN [ARRAY_TO_STRING(t, ' ')]
                     ELSE LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                            i -> ARRAY_TO_STRING(t[i:i+2], ' '))) END AS shingles
              FROM toks),
            idx AS (SELECT doc_id, LEN(shingles) AS ns, UNNEST(shingles) AS g FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
              HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.2),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            labels AS (
              SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
            losers AS (SELECT id FROM labels WHERE label <> id),
            surv AS (
              SELECT doc_id, text, lang, t FROM toks
              WHERE doc_id NOT IN (SELECT id FROM losers)),
            -- CCNet perplexity screen FIT ON THE SURVIVORS
            ptoks AS (
              SELECT doc_id, UNNEST(LIST_FILTER(t, x -> x <> '')) AS term FROM surv),
            pcnt AS (SELECT term, COUNT(*) AS c FROM ptoks GROUP BY term),
            ptot AS (SELECT COUNT(*) AS n FROM ptoks),
            pper AS (
              SELECT doc_id, COUNT(*) AS n_tokens, AVG(-LN(CAST(c AS DOUBLE) / n)) AS m
              FROM ptoks JOIN pcnt USING (term) CROSS JOIN ptot
              GROUP BY doc_id),
            pscored AS (
              SELECT s.doc_id, s.lang,
                CAST(COALESCE(pper.n_tokens, 0) AS BIGINT) AS n_tokens,
                ROUND(COALESCE(pper.m, 0.0), 6) AS neg_logp
              FROM surv s LEFT JOIN pper ON s.doc_id = pper.doc_id),
            pranked AS (
              SELECT lang, neg_logp,
                     ROW_NUMBER() OVER (PARTITION BY lang ORDER BY neg_logp) AS rn,
                     COUNT(*) OVER (PARTITION BY lang) AS n
              FROM pscored WHERE n_tokens > 0),
            pcuts AS (
              SELECT lang,
                     MAX(CASE WHEN rn = CEIL(n * (1.0/3)) THEN neg_logp END) AS p33,
                     MAX(CASE WHEN rn = CEIL(n * (2.0/3)) THEN neg_logp END) AS p67
              FROM pranked GROUP BY lang),
            pkeep AS (
              SELECT s.doc_id FROM pscored s LEFT JOIN pcuts c USING (lang)
              WHERE s.n_tokens > 0 AND s.neg_logp <= c.p67),
            -- quality band on the pre-scrub folded text
            qf AS (
              SELECT doc_id, text, t FROM surv
              WHERE doc_id IN (SELECT doc_id FROM pkeep)
                AND LEN(t) BETWEEN 30 AND 200
                AND (CAST(LEN(text) - LEN(t) + 1 AS DOUBLE) / LEN(t)) BETWEEN 2.0 AND 12.0),
            -- DSIR top-k over the quality survivors vs the src0-3 target
            dtoks AS (
              SELECT doc_id, ('0x' || SUBSTR(MD5(x), 1, 15))::BIGINT % 1024 AS b
              FROM (SELECT doc_id, UNNEST(LIST_FILTER(t, y -> y <> '')) AS x FROM qf)),
            db AS (SELECT doc_id, b, COUNT(*) AS cnt FROM dtoks GROUP BY 1, 2),
            sb AS (SELECT b, COUNT(*) AS sc FROM dtoks GROUP BY b),
            st AS (SELECT COUNT(*) AS stot FROM dtoks),
            ttoks AS (
              SELECT ('0x' || SUBSTR(MD5(x), 1, 15))::BIGINT % 1024 AS b
              FROM (SELECT UNNEST(LIST_FILTER(
                      STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                      y -> y <> '')) AS x
                    FROM base0 WHERE source IN ('src0','src1','src2','src3'))),
            tb AS (SELECT b, COUNT(*) AS tc FROM ttoks GROUP BY b),
            tt AS (SELECT COUNT(*) AS ttot FROM ttoks),
            w AS (
              SELECT sb.b,
                     LN(CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / (ttot + 1024)) -
                     LN(CAST(sc + 1 AS DOUBLE) / (stot + 1024)) AS wb
              FROM sb LEFT JOIN tb ON tb.b = sb.b CROSS JOIN st CROSS JOIN tt),
            dper AS (
              SELECT doc_id, ROUND(SUM(cnt * wb), 6) AS log_ratio
              FROM db JOIN w ON w.b = db.b GROUP BY doc_id),
            picks AS (
              SELECT doc_id FROM dper ORDER BY log_ratio DESC, doc_id LIMIT 120),
            -- scrub, split, chunk the picked docs
            scr AS (
              SELECT doc_id,
                REGEXP_REPLACE(
                  REGEXP_REPLACE(
                    REGEXP_REPLACE(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    'https?://[^ ]+', '<URL>', 'g'),
                  '\+[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g') AS stext
              FROM qf WHERE doc_id IN (SELECT doc_id FROM picks)),
            spl AS (
              SELECT doc_id, stext,
                CASE WHEN SUBSTR(MD5(TRIM(REGEXP_REPLACE(LOWER(stext), '\s+', ' ', 'g'))), 1, 2) < 'cd' THEN 'train'
                     WHEN SUBSTR(MD5(TRIM(REGEXP_REPLACE(LOWER(stext), '\s+', ' ', 'g'))), 1, 2) < 'e6' THEN 'valid'
                     ELSE 'test' END AS split
              FROM scr),
            stoks AS (
              SELECT doc_id, split,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(stext), '\s+', ' ', 'g')), ' ') AS t
              FROM spl),
            starts AS (
              SELECT doc_id, split, t, UNNEST(RANGE(0, LEN(t), 24)) AS s
              FROM stoks WHERE LEN(t) > 0)
            SELECT doc_id, split,
              CAST(s // 24 + 1 AS INTEGER) AS chunk_id,
              CAST(LEN(t[s + 1 : s + 32]) AS INTEGER) AS n_tokens,
              ARRAY_TO_STRING(t[s + 1 : s + 32], ' ') AS chunk_text
            FROM starts
            ORDER BY doc_id, chunk_id"""
  }

  /** Top-3 TF-IDF terms per document (tf · ln(N/df), ties to the smaller
    * term). tfidf rounds to 6 decimals for the cross-engine hash AND for
    * the rank key — the one transcendental (ln) is not bit-specified
    * across libm implementations, and ranking on the raw double could
    * let two near-equal scores swap order between engines; rounding in
    * both engines pins the rank key, and the term tie-break pins ties.
    */
  val textTfidf = Q("q_text_tfidf",
    (s, dir) =>
      Corpus.tfIdfTopTerms(Tables.documents(s, dir), "text", "doc_id", k = 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id", "rank"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     UNNEST(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ')) AS term
              FROM documents),
            tf AS (
              SELECT doc_id, term, COUNT(*) AS tf
              FROM toks WHERE term <> '' GROUP BY doc_id, term),
            dft AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term),
            n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     CAST(tf.tf AS DOUBLE) * LN(CAST(n.n AS DOUBLE) / CAST(dft.df_t AS DOUBLE)) AS tfidf
              FROM tf JOIN dft USING (term) CROSS JOIN n),
            ranked AS (
              SELECT doc_id, term, tf, tfidf,
                     ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ROUND(tfidf, 6) DESC, term ASC) AS rank
              FROM scored)
            SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, ROUND(tfidf, 6) AS tfidf
            FROM ranked WHERE rank <= 3
            ORDER BY doc_id, rank"""))

  /** Greedy sequence packing of the (32, 24) context chunks into 128-token
    * training packs, 8 shards, hash-split labels — integer-exact, so the
    * oracle reproduces it bit-for-bit with a window cumsum.
    */
  /** Length-bucketed packing twin of [[curatePack]]: chunks bin by token
    * length before the cumsum, so a pack holds near-equal-length
    * sequences (pad-waste reduction). Bounds (17, 32) split the 32/24
    * chunking's lengths into tails (<17), mids (17..31) and full chunks.
    */
  val curatePackBucketed = Q("q_curate_pack_bucketed",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val chunks = d.select(col("doc_id"),
          Text.hashSplit(Text.normalize(col("text")),
            Seq("train" -> "cd", "valid" -> "e6"), "test").as("split"),
          posexplode(Text.tokenChunks(Text.tokens(col("text")), 32, 24))
            .as(Seq("__pos", "c")))
        .select(col("doc_id"), col("split"), (col("__pos") + 1).as("chunk_id"),
          col("c.n_tokens").as("n_tokens"))
      Corpus.packChunksBucketed(chunks, "doc_id", "chunk_id", "n_tokens", "split",
        seqLen = 128, nShards = 8, bucketBounds = Seq(17, 32))
        .select(col("doc_id"), col("chunk_id"), col("split"), col("shard"),
          col("len_bucket"), col("pack_id"), col("pack_offset"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH base AS (
              SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS ntext
              FROM documents),
            toks AS (SELECT doc_id, ntext,
                            LIST_FILTER(STRING_SPLIT(ntext, ' '), x -> x <> '') AS t
                     FROM base),
            starts AS (
              SELECT doc_id, ntext, t, UNNEST(RANGE(0, LEN(t), 24)) AS s
              FROM toks WHERE LEN(t) > 0),
            ch AS (
              SELECT doc_id,
                     CASE WHEN SUBSTR(MD5(ntext), 1, 2) < 'cd' THEN 'train'
                          WHEN SUBSTR(MD5(ntext), 1, 2) < 'e6' THEN 'valid'
                          ELSE 'test' END AS split,
                     CAST(s // 24 + 1 AS INTEGER) AS chunk_id,
                     CAST(LEN(t[s + 1 : s + 32]) AS BIGINT) AS n_tokens
              FROM starts),
            bk AS (
              SELECT *, (CASE WHEN n_tokens >= 17 THEN 1 ELSE 0 END +
                         CASE WHEN n_tokens >= 32 THEN 1 ELSE 0 END) AS len_bucket
              FROM ch),
            pk AS (
              SELECT doc_id, chunk_id, split, doc_id % 8 AS shard, len_bucket,
                     SUM(n_tokens) OVER (
                       PARTITION BY split, len_bucket, doc_id % 8
                       ORDER BY doc_id, chunk_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS pos
              FROM bk)
            SELECT doc_id, chunk_id, split, shard, len_bucket,
                   CAST(pos // 128 AS BIGINT) AS pack_id,
                   CAST(pos % 128 AS BIGINT) AS pack_offset
            FROM pk
            ORDER BY doc_id, chunk_id"""))

  /** Pack materialization — the consumer-facing emit step: the greedy
    * pack layout joined back to chunk text, one row per (split, shard,
    * pack) with the chunks concatenated in offset order. At scale this is
    * the last aggregation before training shards hit disk; the groupBy
    * shuffles (pack key, chunk text) once and each pack's payload is
    * bounded by seqLen tokens.
    */
  val curatePackEmit = Q("q_curate_pack_emit",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val chunks = d.select(col("doc_id"),
          Text.hashSplit(Text.normalize(col("text")),
            Seq("train" -> "cd", "valid" -> "e6"), "test").as("split"),
          posexplode(Text.tokenChunks(Text.tokens(col("text")), 32, 24))
            .as(Seq("__pos", "c")))
        .select(col("doc_id"), col("split"), (col("__pos") + 1).as("chunk_id"),
          col("c.n_tokens").as("n_tokens"), col("c.chunk_text").as("chunk_text"))
      Corpus.packChunks(chunks, "doc_id", "chunk_id", "n_tokens", "split",
        seqLen = 128, nShards = 8)
        .groupBy("split", "shard", "pack_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).cast(LongType).as("n_tokens"),
          array_join(transform(
            array_sort(collect_list(struct(col("pack_offset"), col("chunk_text")))),
            c => c.getField("chunk_text")), " ").as("pack_text"))
        .orderBy("split", "shard", "pack_id")
    },
    Some("""WITH base AS (
              SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS ntext
              FROM documents),
            toks AS (SELECT doc_id, ntext,
                            LIST_FILTER(STRING_SPLIT(ntext, ' '), x -> x <> '') AS t
                     FROM base),
            starts AS (
              SELECT doc_id, ntext, t, UNNEST(RANGE(0, LEN(t), 24)) AS s
              FROM toks WHERE LEN(t) > 0),
            ch AS (
              SELECT doc_id,
                     CASE WHEN SUBSTR(MD5(ntext), 1, 2) < 'cd' THEN 'train'
                          WHEN SUBSTR(MD5(ntext), 1, 2) < 'e6' THEN 'valid'
                          ELSE 'test' END AS split,
                     CAST(s // 24 + 1 AS INTEGER) AS chunk_id,
                     CAST(LEN(t[s + 1 : s + 32]) AS BIGINT) AS n_tokens,
                     ARRAY_TO_STRING(t[s + 1 : s + 32], ' ') AS chunk_text
              FROM starts),
            pk AS (
              SELECT doc_id, chunk_id, split, doc_id % 8 AS shard, chunk_text, n_tokens,
                     SUM(n_tokens) OVER (
                       PARTITION BY split, doc_id % 8
                       ORDER BY doc_id, chunk_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS pos
              FROM ch)
            SELECT split, shard, CAST(pos // 128 AS BIGINT) AS pack_id,
                   COUNT(*) AS n_chunks,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   STRING_AGG(chunk_text, ' ' ORDER BY pos) AS pack_text
            FROM pk
            GROUP BY split, shard, pos // 128
            ORDER BY split, shard, pack_id"""))

  /** FFD packing twin — approximate-optimal pad waste, per-group
    * imperative (flatMapGroups) on the Spark side, and FULLY oracled
    * despite the sequential bin state: at gate scale the state machine
    * fits a DuckDB RECURSIVE CTE that advances every (split, shard)
    * group one item per recursion step, carrying the open-pack fill
    * levels as a BIGINT[] column — `fit` is the first list index with
    * room (the first-fit probe in creation order), a miss appends a new
    * pack. Items rank by (n_tokens DESC, doc_id, chunk_id), exactly the
    * Spark sort. Pack-count superiority over boundary-respecting
    * next-fit and the capacity invariants stay gated in
    * CorpusSpec/GraftProps.
    */
  val curatePackFFD = Q("q_curate_pack_ffd",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val chunks = d.select(col("doc_id"),
          Text.hashSplit(Text.normalize(col("text")),
            Seq("train" -> "cd", "valid" -> "e6"), "test").as("split"),
          posexplode(Text.tokenChunks(Text.tokens(col("text")), 32, 24))
            .as(Seq("__pos", "c")))
        .select(col("doc_id"), col("split"), (col("__pos") + 1).as("chunk_id"),
          col("c.n_tokens").as("n_tokens"))
      Corpus.packChunksFFD(chunks, "doc_id", "chunk_id", "n_tokens", "split",
        seqLen = 128, nShards = 8)
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH RECURSIVE base AS (
              SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS ntext
              FROM documents),
            toks AS (SELECT doc_id, ntext,
                            LIST_FILTER(STRING_SPLIT(ntext, ' '), x -> x <> '') AS t
                     FROM base),
            starts AS (
              SELECT doc_id, ntext, t, UNNEST(RANGE(0, LEN(t), 24)) AS s
              FROM toks WHERE LEN(t) > 0),
            ch AS (
              SELECT doc_id,
                     CASE WHEN SUBSTR(MD5(ntext), 1, 2) < 'cd' THEN 'train'
                          WHEN SUBSTR(MD5(ntext), 1, 2) < 'e6' THEN 'valid'
                          ELSE 'test' END AS split,
                     CAST(s // 24 + 1 AS INTEGER) AS chunk_id,
                     CAST(LEN(t[s + 1 : s + 32]) AS BIGINT) AS n_tokens
              FROM starts),
            items AS (
              SELECT doc_id, chunk_id, split,
                     CAST(doc_id % 8 AS INTEGER) AS shard, n_tokens,
                     ROW_NUMBER() OVER (PARTITION BY split, doc_id % 8
                       ORDER BY n_tokens DESC, doc_id, chunk_id) AS rn
              FROM ch),
            ffd AS (
              SELECT split, shard, CAST(0 AS BIGINT) AS rn,
                     CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS INTEGER) AS chunk_id,
                     CAST(NULL AS BIGINT) AS pack_id, CAST(NULL AS BIGINT) AS pack_offset,
                     CAST([] AS BIGINT[]) AS sums
              FROM (SELECT DISTINCT split, shard FROM items)
              UNION ALL
              SELECT split, shard, rn, doc_id, chunk_id,
                     CAST(CASE WHEN fit IS NULL THEN LEN(sums) ELSE fit - 1 END AS BIGINT),
                     CAST(CASE WHEN fit IS NULL THEN 0 ELSE sums[fit] END AS BIGINT),
                     CASE WHEN fit IS NULL THEN LIST_APPEND(sums, n)
                          ELSE LIST_TRANSFORM(GENERATE_SERIES(1, LEN(sums)),
                                 j -> CASE WHEN j = fit THEN sums[j] + n ELSE sums[j] END)
                     END
              FROM (
                SELECT i.split, i.shard, i.rn, i.doc_id, i.chunk_id,
                       i.n_tokens AS n, r.sums,
                       LIST_FILTER(GENERATE_SERIES(1, LEN(r.sums)),
                         j -> r.sums[j] + i.n_tokens <= 128)[1] AS fit
                FROM ffd r
                JOIN items i ON i.split = r.split AND i.shard = r.shard
                            AND i.rn = r.rn + 1))
            SELECT doc_id, chunk_id, split, shard, pack_id, pack_offset
            FROM ffd WHERE rn > 0
            ORDER BY doc_id, chunk_id"""))

  val curatePack = Q("q_curate_pack",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val chunks = d.select(col("doc_id"),
          Text.hashSplit(Text.normalize(col("text")),
            Seq("train" -> "cd", "valid" -> "e6"), "test").as("split"),
          posexplode(Text.tokenChunks(Text.tokens(col("text")), 32, 24))
            .as(Seq("__pos", "c")))
        .select(col("doc_id"), col("split"), (col("__pos") + 1).as("chunk_id"),
          col("c.n_tokens").as("n_tokens"))
      Corpus.packChunks(chunks, "doc_id", "chunk_id", "n_tokens", "split",
        seqLen = 128, nShards = 8)
        .select(col("doc_id"), col("chunk_id"), col("split"), col("shard"),
          col("pack_id"), col("pack_offset"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH base AS (
              SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS ntext
              FROM documents),
            toks AS (SELECT doc_id, ntext,
                            LIST_FILTER(STRING_SPLIT(ntext, ' '), x -> x <> '') AS t
                     FROM base),
            starts AS (
              SELECT doc_id, ntext, t, UNNEST(RANGE(0, LEN(t), 24)) AS s
              FROM toks WHERE LEN(t) > 0),
            ch AS (
              SELECT doc_id,
                     CASE WHEN SUBSTR(MD5(ntext), 1, 2) < 'cd' THEN 'train'
                          WHEN SUBSTR(MD5(ntext), 1, 2) < 'e6' THEN 'valid'
                          ELSE 'test' END AS split,
                     CAST(s // 24 + 1 AS INTEGER) AS chunk_id,
                     CAST(LEN(t[s + 1 : s + 32]) AS BIGINT) AS n_tokens
              FROM starts),
            pk AS (
              SELECT doc_id, chunk_id, split, doc_id % 8 AS shard,
                     SUM(n_tokens) OVER (
                       PARTITION BY split, doc_id % 8
                       ORDER BY doc_id, chunk_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS pos
              FROM ch)
            SELECT doc_id, chunk_id, split, shard,
                   CAST(pos // 128 AS BIGINT) AS pack_id,
                   CAST(pos % 128 AS BIGINT) AS pack_offset
            FROM pk
            ORDER BY doc_id, chunk_id"""))

  /** Deterministic stratified sample over `lang`: md5-prefix threshold per
    * stratum (en 50%, zh 100%, es 25%, rest 12.5%) — content-keyed, so
    * the kept set is stable across engines and runs. Bounds are the
    * 4-hex-digit literals of [[Corpus.fractionBound]]; 1.0 maps to "g",
    * which sorts above every hex prefix.
    */
  val sampleStratified = Q("q_sample_stratified",
    (s, dir) =>
      Corpus.stratifiedSample(Tables.documents(s, dir), "lang", "text",
        Map("en" -> 0.5, "zh" -> 1.0, "es" -> 0.25), defaultFraction = 0.125)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, lang FROM documents
            WHERE SUBSTR(MD5(text), 1, 4) < CASE lang
              WHEN 'en' THEN '8000'
              WHEN 'zh' THEN 'g'
              WHEN 'es' THEN '4000'
              ELSE '2000' END
            ORDER BY doc_id"""))

  /** Per-language token-budget selection: an independent 3k-token budget
    * per lang, same bucket-cumsum cut — the "best N tokens per language"
    * retargeting shape. Oracle partitions the window by lang.
    */
  val selectBudgetPerLang = Q("q_select_budget_per_lang",
    (s, dir) => {
      val scored = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), Text.qualityStruct(col("text")).as("q"))
        .select(col("doc_id"), col("lang"),
          col("q.stopword_hit_ratio").as("score"),
          col("q.n_tokens").cast(LongType).as("n_tokens"))
      Corpus.selectByQualityBudgetPerStratum(scored, "lang", "score",
        "n_tokens", tokenBudgetPerStratum = 3000L, decimals = 3)
        .select("doc_id", "lang", "score_bucket", "n_tokens")
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT doc_id, lang,
                LEN(LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '), x -> x <> '')) AS n_tokens,
                LEN(LIST_INTERSECT(
                  LIST_DISTINCT(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ')),
                  ['the','a','of','and','to','in','is','that','it','for'])) AS n_stop
              FROM documents),
            b AS (
              SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
                ROUND(CASE WHEN n_tokens > 0
                           THEN CAST(n_stop AS DOUBLE) / n_tokens
                           ELSE 0.0 END, 3) AS score_bucket
              FROM t),
            cum AS (
              SELECT lang, score_bucket, SUM(SUM(n_tokens)) OVER (
                       PARTITION BY lang
                       ORDER BY score_bucket DESC
                       ROWS UNBOUNDED PRECEDING) AS cum_toks
              FROM b GROUP BY lang, score_bucket),
            keep AS (SELECT lang, score_bucket FROM cum WHERE cum_toks <= 3000)
            SELECT doc_id, lang, score_bucket, n_tokens
            FROM b SEMI JOIN keep USING (lang, score_bucket)
            ORDER BY doc_id"""))

  /** Unicode NFC canonicalization (native codegen'd expression): the
    * corpus text is ASCII, so a decomposed-form suffix (e + combining
    * acute, twice) is appended inside the query to make normalization
    * observable — NFC composes it, shortening the string by exactly two
    * code points, and both engines must agree on every output byte.
    */
  val textNfc = Q("q_text_nfc",
    (s, dir) => {
      val suffix = " café légume"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.TextExprs.nfcNormalize(
            concat(col("text"), lit(suffix))).as("ntext"))
        .select(col("doc_id"), col("ntext"),
          length(col("ntext")).cast(LongType).as("n_chars"))
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, NFC_NORMALIZE(text || ' café légume') AS ntext, " +
      "CAST(LENGTH(NFC_NORMALIZE(text || ' café légume')) AS BIGINT) AS n_chars " +
      "FROM documents ORDER BY doc_id"))

  /** Planted suffix for `q_text_strip_accents` — composed forms,
    * \u-escaped so the source encoding can't silently decompose them:
    * " caf\u00e9 M\u00fcller S\u00e3o \u00c5re \u00f1and\u00fa \u00d8rsted \ud55c\uad6d". One literal shared by the
    * Spark column and the oracle SQL so both engines fold the same bytes.
    */
  private val StripSuffix: String =
    " caf\u00e9 M\u00fcller S\u00e3o \u00c5re \u00f1and\u00fa \u00d8rsted \ud55c\uad6d"

  /** Diacritic fold ([[graft.functions.TextExprs.stripAccents]] =
    * NFC∘drop-Mn∘NFD, DuckDB `strip_accents` parity): the match-key
    * normalization that keeps "café"/"cafe" in one dedup bucket. The
    * planted suffix (composed forms, \u-escaped to pin the encoding)
    * exercises the strip path (é/ü/ã/Å/ñ), the non-decomposable
    * survivor (ø), and the NFC-recompose path (한 decomposes to
    * markless Jamo and must come back composed); the corpus text
    * exercises the no-alloc ASCII/zh fast path.
    */
  val textStripAccents = Q("q_text_strip_accents",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.TextExprs.stripAccents(
            concat(col("text"), lit(StripSuffix))).as("folded"))
        .select(col("doc_id"), col("folded"),
          length(col("folded")).cast(LongType).as("n_chars"))
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, STRIP_ACCENTS(text || '" + StripSuffix + "') AS folded, " +
      "CAST(LENGTH(STRIP_ACCENTS(text || '" + StripSuffix + "')) AS BIGINT) AS n_chars " +
      "FROM documents ORDER BY doc_id"))

  /** Jaro-Winkler similarity ([[graft.functions.TextExprs.jaroWinkler]]
    * vs DuckDB's built-in `jaro_winkler_similarity`) — the fuzzy
    * record-linkage score [[graft.ops.Dedup.editDistancePairs]]'
    * unit-cost counting can't express (JW weights early-prefix agreement,
    * the name/title-matching prior). The planted pair matrix covers the
    * textbook cases: transpositions (martha/marhta), prefix boost
    * (dixon/dicksonx), sub-0.7-jaro no-boost, identical → 1, and
    * disjoint → 0; 9-decimal rounding absorbs last-ulp division-order
    * differences between engines.
    */
  val textJaroWinkler = Q("q_text_jaro_winkler",
    (s, dir) => {
      val names = Seq("martha", "marhta", "dwayne", "duane",
        "dixon", "dicksonx", "jellyfish", "smellyfish")
      def pick(e: Column): Column =
        names.zipWithIndex.foldLeft(lit(names.head)) { case (acc, (n, i)) =>
          when(e === i, lit(n)).otherwise(acc)
        }
      val s1 = pick(pmod(col("doc_id"), lit(8)))
      val s2 = pick(pmod(floor(col("doc_id") / lit(3)).cast(LongType), lit(8)))
      Tables.documents(s, dir).select(col("doc_id"),
        s1.as("s1"), s2.as("s2"),
        round(graft.functions.TextExprs.jaroWinkler(s1, s2), 9).as("jw"))
        .orderBy("doc_id")
    },
    Some {
      val names = Seq("martha", "marhta", "dwayne", "duane",
        "dixon", "dicksonx", "jellyfish", "smellyfish")
      def pick(e: String): String =
        "CASE " + names.zipWithIndex.map { case (n, i) =>
          s"WHEN $e = $i THEN '$n'" }.mkString(" ") + s" ELSE '${names.head}' END"
      val s1 = pick("doc_id % 8")
      val s2 = pick("CAST(FLOOR(doc_id / 3) AS BIGINT) % 8")
      s"""SELECT doc_id, $s1 AS s1, $s2 AS s2,
            ROUND(JARO_WINKLER_SIMILARITY($s1, $s2), 9) AS jw
          FROM documents ORDER BY doc_id"""
    })

  /** Aho–Corasick multi-pattern screen ([[graft.functions.TextExprs
    * .multiMatch]]): which lexicon terms occur in each doc, one automaton
    * walk per row — the thousand-term blocklist screen a regex
    * alternation or per-term contains loop can't afford. The pattern
    * set mixes single tokens, multi-word phrases, overlapping patterns
    * (one a substring of another — both must report), and absent terms;
    * the oracle is the semantic definition (substring containment per
    * term), deliberately not an automaton.
    */
  val textMultiMatch = Q("q_text_multi_match",
    (s, dir) => {
      val terms = Seq("spark", "join", "merge batch", "window", "windowed",
        "hash", "quantum", "zzz never present", "att", "batch")
      Tables.documents(s, dir).select(col("doc_id"),
        graft.functions.TextExprs.multiMatch(col("text"), terms).as("__m"))
        .select(col("doc_id"),
          array_join(col("__m"), ",").as("matched"),
          size(col("__m")).cast(LongType).as("n_matched"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              -- LIST_SORT([]) is NULL in DuckDB; matchless docs must
              -- compare equal to Spark's empty string
              COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
                ['spark', 'join', 'merge batch', 'window', 'windowed',
                 'hash', 'quantum', 'zzz never present', 'att', 'batch'],
                t -> CONTAINS(text, t))), ','), '') AS matched,
              CAST(LEN(LIST_FILTER(
                ['spark', 'join', 'merge batch', 'window', 'windowed',
                 'hash', 'quantum', 'zzz never present', 'att', 'batch'],
                t -> CONTAINS(text, t))) AS BIGINT) AS n_matched
            FROM documents ORDER BY doc_id"""))

  /** Corpus-wide top-50 bigrams by occurrence — boilerplate mining.
    * Oracle recomputes the identical count + deterministic tie-break.
    */
  val corpusTopNgrams = Q("q_corpus_top_ngrams",
    (s, dir) =>
      Corpus.topNgrams(Tables.documents(s, dir), "text", n = 2, k = 50)
        .orderBy(col("occurrences").desc, col("ngram").asc),
    Some("""WITH toks AS (
              SELECT LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents)
            SELECT ngram, CAST(COUNT(*) AS BIGINT) AS occurrences
            FROM (SELECT ARRAY_TO_STRING(t[i : i + 1], ' ') AS ngram
                  FROM (SELECT t, UNNEST(RANGE(1, LEN(t))) AS i
                        FROM toks WHERE LEN(t) >= 2))
            GROUP BY ngram
            ORDER BY occurrences DESC, ngram
            LIMIT 50"""))

  /** Top-40 PMI collocations ([[graft.ops.Corpus.topPmiBigrams]],
    * minCount=5): adjacent pairs beating independence. Oracle refits
    * both count tables, the totals, the rounded PMI and the
    * (pmi desc, w1, w2) cut.
    */
  val corpusPmi = Q("q_corpus_pmi_collocations",
    (s, dir) =>
      Corpus.topPmiBigrams(Tables.documents(s, dir), "text", "doc_id",
        minCount = 5, k = 40)
        .orderBy(col("pmi").desc, col("w1"), col("w2")),
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            uni AS (SELECT term, COUNT(*) AS cu FROM
                      (SELECT UNNEST(t) AS term FROM toks) GROUP BY term),
            bi AS (SELECT t[i + 1] AS w1, t[i + 2] AS w2
                   FROM (SELECT t, UNNEST(RANGE(0, LEN(t) - 1)) AS i
                         FROM toks WHERE LEN(t) >= 2)),
            cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2
                   HAVING COUNT(*) >= 5),
            tot AS (SELECT (SELECT SUM(cu) FROM uni) AS t,
                           (SELECT COUNT(*) FROM bi) AS bt)
            SELECT w1, w2, c12 AS pair_count,
              ROUND(LN((CAST(c12 AS DOUBLE) / CAST(bt AS DOUBLE)) /
                ((CAST(u1.cu AS DOUBLE) / CAST(t AS DOUBLE)) *
                 (CAST(u2.cu AS DOUBLE) / CAST(t AS DOUBLE)))), 6) AS pmi
            FROM cb JOIN uni u1 ON u1.term = w1
                    JOIN uni u2 ON u2.term = w2
                    CROSS JOIN tot
            ORDER BY pmi DESC, w1, w2
            LIMIT 40"""))

  /** Per-source mixture report with language-distribution entropy.
    * Entropy via the algebraic form ln N - Σ n ln n / N so both engines
    * evaluate the same expression tree; rounded to 6 decimals.
    */
  val corpusSourceReport = Q("q_corpus_source_report",
    (s, dir) =>
      Corpus.sourceMixtureReport(Tables.documents(s, dir), "source", "lang", "text")
        .orderBy("source"),
    Some("""WITH pl AS (
              SELECT source, lang, COUNT(*) AS n, SUM(ntoks) AS t
              FROM (SELECT source, lang,
                      LEN(LIST_FILTER(
                        STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                        x -> x <> '')) AS ntoks
                    FROM documents)
              GROUP BY source, lang)
            SELECT source,
              CAST(SUM(n) AS BIGINT) AS n_docs,
              CAST(SUM(t) AS BIGINT) AS n_tokens,
              CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
              ROUND(-SUM(n * LN(CAST(n AS DOUBLE))) / CAST(SUM(n) AS DOUBLE)
                    + LN(CAST(SUM(n) AS DOUBLE)), 6) AS lang_entropy
            FROM pl GROUP BY source ORDER BY source"""))

  /** Per-source vocabulary growth — the Heaps'-law diagnostic. */
  val corpusVocab = Q("q_corpus_vocab",
    (s, dir) =>
      Corpus.vocabReport(Tables.documents(s, dir), "source", "text")
        .orderBy("source"),
    Some("""WITH tk AS (
              SELECT source,
                     UNNEST(LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '')) AS t
              FROM documents)
            SELECT source,
                   COUNT(*) AS n_tokens,
                   COUNT(DISTINCT t) AS n_terms,
                   ROUND(CAST(COUNT(DISTINCT t) AS DOUBLE) / COUNT(*), 6) AS type_token_ratio
            FROM tk GROUP BY source ORDER BY source"""))

  /** Per-source exact-dup rate — the mixing-decision diagnostic. */
  val corpusDupRate = Q("q_corpus_dup_rate",
    (s, dir) =>
      Corpus.dupRateReport(Tables.documents(s, dir), "source", "text")
        .orderBy("source"),
    Some("""WITH d AS (
              SELECT source,
                     MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))) AS dg
              FROM documents)
            SELECT source,
                   COUNT(*) AS n_docs,
                   COUNT(DISTINCT dg) AS n_distinct,
                   ROUND(1 - CAST(COUNT(DISTINCT dg) AS DOUBLE) / COUNT(*), 6) AS dup_rate
            FROM d GROUP BY source ORDER BY source"""))

  /** Corpus length-distribution diagnostic: token-count histogram per
    * source, 16-token buckets, tail absorbed at bucket 8.
    */
  val corpusLengthHist = Q("q_corpus_length_hist",
    (s, dir) =>
      Corpus.lengthHistogram(Tables.documents(s, dir), "text", "source",
        bucketWidth = 16, maxBucket = 8)
        .orderBy("source", "len_bucket"),
    Some("""WITH n AS (
              SELECT source,
                     LEN(LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '')) AS nt
              FROM documents)
            SELECT source,
                   CAST(LEAST(nt // 16, 8) AS BIGINT) AS len_bucket,
                   COUNT(*) AS n_docs,
                   CAST(SUM(nt) AS BIGINT) AS total_tokens
            FROM n GROUP BY source, LEAST(nt // 16, 8)
            ORDER BY source, len_bucket"""))

  /** Vocabulary encoding under a frequency-ranked top-24 vocab (small
    * enough that the synthetic corpus' 31-word vocabulary has real OOV
    * positions). Oracle recomputes the identical rank and join.
    */
  val curateTokenIds = Q("q_curate_token_ids",
    (s, dir) =>
      Corpus.encodeTokens(Tables.documents(s, dir), "text", "doc_id",
        vocabSize = 24)
        .orderBy("doc_id", "pos"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            pt AS (
              SELECT doc_id, pos, t[pos + 1] AS term
              FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t))) AS pos FROM toks)),
            vocab AS (
              SELECT term,
                     CAST(ROW_NUMBER() OVER (ORDER BY c DESC, term) AS INTEGER) AS token_id
              FROM (SELECT term, COUNT(*) AS c FROM pt GROUP BY term
                    ORDER BY c DESC, term LIMIT 24))
            SELECT pt.doc_id, CAST(pt.pos AS INTEGER) AS pos, pt.term,
                   COALESCE(vocab.token_id, 0) AS token_id
            FROM pt LEFT JOIN vocab USING (term)
            ORDER BY doc_id, pos"""))

  /** Distributed BPE trainer (`ops/Bpe.scala`): 8 merge rounds over
    * the word-type frequency table, each round one bounded shuffle +
    * one TakeOrdered argmax. The DuckDB oracle REPLAYS training — every
    * round re-derives its pair counts, argmax (same tiebreak) and
    * merge application via a recursive-CTE fixpoint REPLACE — so a
    * tiebreak slip, a greedy-overlap error, or a count drift in any
    * round changes that round's rule and the gate hash.
    */
  val bpeTrain = Q("q_bpe_train",
    (s, dir) =>
      Bpe.trainTable(Tables.documents(s, dir), "text", nMerges = 8)
        .orderBy("step"),
    Some(Bpe.trainOracle(8)))

  /** BPE encoder under the 8 trained rules: one row per word position
    * with its greedy subword segmentation. The oracle re-derives the
    * rules AND re-segments every token through the same fixpoint
    * machinery, in rank order — encoder and trainer share one
    * definition of "greedy merge" across both engines.
    */
  val bpeEncode = Q("q_bpe_encode",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val rules = Bpe.train(docs, "text", nMerges = 8)
      Bpe.encode(docs, "text", "doc_id", rules)
        .orderBy("doc_id", "pos")
    },
    Some(Bpe.encodeOracle(8)))

  /** Unigram-LM tokenizer trainer (`ops/Unigram.scala`) — the
    * SentencePiece-family sibling of `q_bpe_train`: substring seeding,
    * two Viterbi hard-EM rounds, a prune to vocabSize (characters
    * always survive), one post-prune round. The DuckDB oracle REPLAYS
    * the whole run — seed top-k, each round's integer micro-nat weight
    * quantization, the Viterbi DP unrolled as per-position CTEs with
    * the pinned (score desc, pieces asc, last-piece-len desc) tie rule,
    * the keep/floor rule, the prune cut — so a tie slip or count drift
    * in ANY phase changes the final vocabulary and the gate hash.
    * vocabSize 40 against 24 corpus characters leaves 16 multi-char
    * slots, so the prune genuinely cuts (seed keeps 60 multi-char
    * pieces); maxWordLen 12 covers the corpus max of 8 with margin.
    */
  val unigramTrain = Q("q_unigram_train",
    (s, dir) =>
      Unigram.trainTable(Tables.documents(s, dir), "text", vocabSize = 40,
        maxPieceLen = 4, seedSize = 60, emIters = 2, postIters = 1)
        .orderBy("piece"),
    Some(Unigram.trainOracle(40, maxPieceLen = 4, seedSize = 60,
      emIters = 2, postIters = 1)))

  /** Unigram Viterbi encoder under the trained vocabulary: one row per
    * word position with its best segmentation, scored in exact integer
    * micro-nats by the native codegen'd expression. The oracle
    * re-derives the vocabulary through the same phases and runs one
    * more unrolled DP under the final weights — encoder and trainer
    * share one definition of "best segmentation" across both engines.
    */
  val unigramEncode = Q("q_unigram_encode",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = Unigram.train(docs, "text", vocabSize = 40,
        maxPieceLen = 4, seedSize = 60, emIters = 2, postIters = 1)
      Unigram.encode(docs, "text", "doc_id", vocab)
        .orderBy("doc_id", "pos")
    },
    Some(Unigram.encodeOracle(40, maxPieceLen = 4, seedSize = 60,
      emIters = 2, postIters = 1)))

  /** HTML → text extraction: each document rides inside a synthetic
    * page with a style block, a comment, a script whose body contains a
    * bare '<' (so block removal MUST precede tag-stripping), and
    * entities. Both engines run the byte-identical RE2-compatible
    * pattern chain.
    */
  val textHtmlStrip = Q("q_text_html_strip",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Text.stripHtml(concat(
            lit("<html><head><style>p{color:red}</style><!-- nav --></head><body><p class=\"x\">"),
            col("text"),
            lit("</p><script type=\"text/javascript\">var x = 1 < 2;</script>&nbsp;&amp; more</body></html>")))
            .as("clean"))
        .select(col("doc_id"), col("clean"),
          length(col("clean")).cast(LongType).as("n_chars"))
        .orderBy("doc_id"),
    Some("""WITH page AS (
              SELECT doc_id,
                '<html><head><style>p{color:red}</style><!-- nav --></head><body><p class="x">' ||
                text ||
                '</p><script type="text/javascript">var x = 1 < 2;</script>&nbsp;&amp; more</body></html>' AS h
              FROM documents),
            stripped AS (
              SELECT doc_id,
                TRIM(REGEXP_REPLACE(
                  REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                  REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                  REGEXP_REPLACE(REGEXP_REPLACE(h,
                    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                    '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                    '(?s)<!--.*?-->', ' ', 'g'),
                    '<[^>]+>', ' ', 'g'),
                    '&nbsp;', ' ', 'g'),
                    '&lt;', '<', 'g'),
                    '&gt;', '>', 'g'),
                    '&quot;', '"', 'g'),
                    '&#39;', '''', 'g'),
                    '&amp;', '&', 'g'),
                  '\s+', ' ', 'g')) AS clean
              FROM page)
            SELECT doc_id, clean, CAST(LENGTH(clean) AS BIGINT) AS n_chars
            FROM stripped ORDER BY doc_id"""))

  /** Token-budget quality selection: rank docs by stopword-hit ratio
    * (bucketed to 3 decimals), keep the best buckets whose cumulative
    * token count fits a 12k budget. Oracle recomputes the identical
    * bucket-cumsum threshold.
    */
  val selectBudget = Q("q_select_token_budget",
    (s, dir) => {
      val scored = Tables.documents(s, dir)
        .select(col("doc_id"), Text.qualityStruct(col("text")).as("q"))
        .select(col("doc_id"),
          col("q.stopword_hit_ratio").as("score"),
          col("q.n_tokens").cast(LongType).as("n_tokens"))
      Corpus.selectByQualityBudget(scored, "score", "n_tokens",
        tokenBudget = 12000L, decimals = 3)
        .select("doc_id", "score_bucket", "n_tokens")
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT doc_id,
                LEN(LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '), x -> x <> '')) AS n_tokens,
                LEN(LIST_INTERSECT(
                  LIST_DISTINCT(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ')),
                  ['the','a','of','and','to','in','is','that','it','for'])) AS n_stop
              FROM documents),
            b AS (
              SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                ROUND(CASE WHEN n_tokens > 0
                           THEN CAST(n_stop AS DOUBLE) / n_tokens
                           ELSE 0.0 END, 3) AS score_bucket
              FROM t),
            cum AS (
              SELECT score_bucket, SUM(SUM(n_tokens)) OVER (
                       ORDER BY score_bucket DESC
                       ROWS UNBOUNDED PRECEDING) AS cum_toks
              FROM b GROUP BY score_bucket),
            keep AS (SELECT score_bucket FROM cum WHERE cum_toks <= 12000)
            SELECT doc_id, score_bucket, n_tokens
            FROM b SEMI JOIN keep USING (score_bucket)
            ORDER BY doc_id"""))

  /** Exact-k deterministic sample: the 25 docs per language whose
    * (md5(text), doc_id) sorts smallest — a stratum with fewer than 25
    * docs is kept whole. Oracle recomputes the identical window rank.
    */
  val sampleExactK = Q("q_sample_exact_k",
    (s, dir) =>
      Corpus.sampleExactKPerStratum(Tables.documents(s, dir), "lang", "text",
        "doc_id", k = 25)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY MD5(text), doc_id) AS rn
              FROM documents)
            WHERE rn <= 25 ORDER BY doc_id"""))

  /** BM25 retrieval scoring ([[graft.ops.Corpus.bm25Scores]]) against a
    * four-term seed query over corpus vocabulary — the topical-selection
    * primitive. The oracle refits df/N/avgdl and replays the
    * idf·tf-normalization chain term for term; k1=1.2 is written
    * CAST(1.2 AS DOUBLE) so DuckDB's decimal literal converts to the
    * identical binary double Scala parses.
    */
  val textBm25 = Q("q_text_bm25",
    (s, dir) =>
      Corpus.bm25Scores(Tables.documents(s, dir), "text", "doc_id",
        Seq("spark", "join", "data", "query"))
        .orderBy("doc_id"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            dl AS (SELECT doc_id, LEN(t) AS dl FROM toks),
            nd AS (SELECT COUNT(*) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf
                   FROM (SELECT doc_id, UNNEST(t) AS term FROM toks)
                   WHERE term IN ('spark', 'join', 'data', 'query')
                   GROUP BY doc_id, term),
            dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            per AS (
              SELECT tf.doc_id,
                ROUND(SUM(
                  LN(1.0 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                  * (CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)
                     / (CAST(tf AS DOUBLE)
                        + CAST(1.2 AS DOUBLE)
                          * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)))
                ), 6) AS bm25
              FROM tf JOIN dl USING (doc_id) JOIN dft USING (term) CROSS JOIN nd
              GROUP BY tf.doc_id)
            SELECT d.doc_id, COALESCE(per.bm25, 0.0) AS bm25
            FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
            ORDER BY d.doc_id"""))

  /** Reciprocal-rank fusion ([[graft.ops.Corpus.rrfFuse]]): BM25
    * seed-term relevance fused with a document-length prior — the
    * calibration-free hybrid combiner. Ranks derive through
    * [[graft.ops.Corpus.globalRowNumber]] (never a single-reducer
    * sort); the oracle re-derives BM25, ranks both signals with the
    * identical (-score, id) order, and sums the same 1/(60+rank)
    * chain in the same term order.
    */
  val selectRrf = Q("q_select_rrf_fusion",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Corpus.rrfFuse(Seq(
        (Corpus.bm25Scores(d, "text", "doc_id",
          Seq("spark", "join", "data", "query")), "bm25"),
        (d.select(col("doc_id"), col("n_chars").cast(DoubleType).as("len_score")),
          "len_score")), "doc_id")
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            dl AS (SELECT doc_id, LEN(t) AS dl FROM toks),
            nd AS (SELECT COUNT(*) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf
                   FROM (SELECT doc_id, UNNEST(t) AS term FROM toks)
                   WHERE term IN ('spark', 'join', 'data', 'query')
                   GROUP BY doc_id, term),
            dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            per AS (
              SELECT tf.doc_id,
                ROUND(SUM(
                  LN(1.0 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                  * (CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)
                     / (CAST(tf AS DOUBLE)
                        + CAST(1.2 AS DOUBLE)
                          * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)))
                ), 6) AS bm25
              FROM tf JOIN dl USING (doc_id) JOIN dft USING (term) CROSS JOIN nd
              GROUP BY tf.doc_id),
            s1 AS (SELECT d.doc_id, COALESCE(per.bm25, 0.0) AS sc
                   FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id),
            r1 AS (SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY -sc, doc_id) AS rk FROM s1),
            r2 AS (SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY -CAST(n_chars AS DOUBLE), doc_id) AS rk
                   FROM documents)
            SELECT r1.doc_id,
              ROUND(1.0 / CAST(60 + r1.rk AS DOUBLE)
                    + 1.0 / CAST(60 + r2.rk AS DOUBLE), 9) AS rrf
            FROM r1 JOIN r2 ON r1.doc_id = r2.doc_id
            ORDER BY r1.doc_id"""))

  /** Weighted sampling without replacement ([[graft.ops.Corpus
    * .weightedSampleK]], Efraimidis–Spirakis exponential keys, weight =
    * n_chars so longer docs draw proportionally more): 10 per language.
    * The oracle replays the exact (seed, id)-keyed u, the rounded
    * −ln(u)/w rank key, and the (skey, id) cut.
    */
  val sampleWeighted = Q("q_sample_weighted",
    (s, dir) =>
      Corpus.weightedSampleK(Tables.documents(s, dir), "lang", "doc_id",
        "n_chars", k = 10)
        .select(col("doc_id"), col("lang"),
          col("n_chars"), col("sample_rank").cast(LongType).as("sample_rank"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, n_chars, CAST(rn AS BIGINT) AS sample_rank
            FROM (
              SELECT doc_id, lang, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
                       ROUND(-LN(
                         (('0x' || SUBSTR(MD5('es1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                         / POWER(2, 60)) / CAST(n_chars AS DOUBLE), 6),
                       doc_id) AS rn
              FROM documents WHERE n_chars > 0)
            WHERE rn <= 10 ORDER BY doc_id"""))

  /** Unigram-LM quality score: p(term) trained on the corpus itself,
    * docs scored by mean -ln p. Oracle recomputes the identical two-agg
    * + vocab-join definition; both engines round to 6 decimals (ln and
    * mean-summation order are engine-dependent at ~1e-13).
    */
  val textUnigramPpl = Q("q_text_unigram_ppl",
    (s, dir) =>
      Corpus.unigramNegLogProb(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     UNNEST(LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '')) AS term
              FROM documents),
            cnt AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
            tot AS (SELECT COUNT(*) AS n FROM toks),
            per AS (
              SELECT doc_id, COUNT(*) AS n_tokens,
                     AVG(-LN(CAST(c AS DOUBLE) / n)) AS m
              FROM toks JOIN cnt USING (term) CROSS JOIN tot
              GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
              ROUND(COALESCE(per.m, 0.0), 6) AS neg_logp
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id"""))

  /** Bigram-LM quality score with Laplace smoothing:
    * p(cur|prev) = (c(prev,cur)+1)/(c(prev)+V). Oracle recomputes the
    * identical counts and smoothing; 6-decimal rounding on both sides.
    */
  val textBigramPpl = Q("q_text_bigram_ppl",
    (s, dir) =>
      Corpus.bigramNegLogProb(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            bi AS (
              SELECT doc_id, t[i + 1] AS prev, t[i + 2] AS cur
              FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t) - 1)) AS i
                    FROM toks WHERE LEN(t) >= 2)),
            cb AS (SELECT prev, cur, COUNT(*) AS c FROM bi GROUP BY prev, cur),
            cp AS (SELECT prev, SUM(c) AS p FROM cb GROUP BY prev),
            v AS (SELECT COUNT(DISTINCT term) AS n FROM
                    (SELECT UNNEST(t) AS term FROM toks)),
            per AS (
              SELECT doc_id, COUNT(*) AS n_bigrams,
                     AVG(-LN(CAST(c + 1 AS DOUBLE) / (p + n))) AS m
              FROM bi JOIN cb USING (prev, cur) JOIN cp USING (prev) CROSS JOIN v
              GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
              ROUND(COALESCE(per.m, 0.0), 6) AS neg_logp
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id"""))

  /** Interpolated Kneser-Ney bigram score ([[graft.ops.Corpus
    * .kneserNeyNegLogProb]], D = 0.75 — exactly representable, so both
    * engines agree bit-for-bit up to the final ln). The oracle replays
    * all four count tables (bigram types, context totals + distinct
    * right-continuations, distinct left-contexts, B/V totals) and the
    * identical discount/backoff arithmetic.
    */
  val textKneserNey = Q("q_text_kneser_ney",
    (s, dir) =>
      Corpus.kneserNeyNegLogProb(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '') AS t
              FROM documents),
            bi AS (
              SELECT doc_id, t[i + 1] AS prev, t[i + 2] AS cur
              FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t) - 1)) AS i
                    FROM toks WHERE LEN(t) >= 2)),
            cb AS (SELECT prev, cur, COUNT(*) AS c FROM bi GROUP BY prev, cur),
            cp AS (SELECT prev, SUM(c) AS p, COUNT(*) AS n1r FROM cb GROUP BY prev),
            nl AS (SELECT cur, COUNT(*) AS n1l FROM cb GROUP BY cur),
            tot AS (SELECT (SELECT COUNT(*) FROM cb) AS bt,
                           (SELECT COUNT(DISTINCT term) FROM
                              (SELECT UNNEST(t) AS term FROM toks)) AS v),
            per AS (
              SELECT doc_id, COUNT(*) AS n_bigrams,
                     AVG(-LN(
                       GREATEST(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(p AS DOUBLE)
                       + (0.75 * CAST(n1r AS DOUBLE) / CAST(p AS DOUBLE))
                         * (CAST(n1l + 1 AS DOUBLE) / CAST(bt + v AS DOUBLE))
                     )) AS m
              FROM bi JOIN cb USING (prev, cur) JOIN cp USING (prev)
                      JOIN nl USING (cur) CROSS JOIN tot
              GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
              ROUND(COALESCE(per.m, 0.0), 6) AS neg_logp
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id"""))

  /** CCNet head/middle/tail perplexity bucketing: the unigram-LM score
    * plus per-language exact tertile cuts. The oracle replays the LM
    * chain, ranks per language (value-at-rank is multiset-determined, so
    * ties are safe), picks the ceil(n/3)/ceil(2n/3) cut values, and
    * re-derives every label; zero-token docs bucket to NULL on both
    * sides.
    */
  val textPplBuckets = Q("q_text_ppl_buckets",
    (s, dir) =>
      Corpus.pplBuckets(Tables.documents(s, dir), "text", "doc_id", "lang")
        .orderBy("doc_id"),
    Some("""WITH toks AS (
              SELECT doc_id,
                     UNNEST(LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '')) AS term
              FROM documents),
            cnt AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
            tot AS (SELECT COUNT(*) AS n FROM toks),
            per AS (
              SELECT doc_id, COUNT(*) AS n_tokens,
                     AVG(-LN(CAST(c AS DOUBLE) / n)) AS m
              FROM toks JOIN cnt USING (term) CROSS JOIN tot
              GROUP BY doc_id),
            scored AS (
              SELECT d.doc_id, d.lang,
                CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                ROUND(COALESCE(per.m, 0.0), 6) AS neg_logp
              FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id),
            ranked AS (
              SELECT lang, neg_logp,
                     ROW_NUMBER() OVER (PARTITION BY lang ORDER BY neg_logp) AS rn,
                     COUNT(*) OVER (PARTITION BY lang) AS n
              FROM scored WHERE n_tokens > 0),
            cuts AS (
              SELECT lang,
                     MAX(CASE WHEN rn = CEIL(n * (1.0/3)) THEN neg_logp END) AS p33,
                     MAX(CASE WHEN rn = CEIL(n * (2.0/3)) THEN neg_logp END) AS p67
              FROM ranked GROUP BY lang)
            SELECT s.doc_id, s.lang, s.n_tokens, s.neg_logp,
              CASE WHEN s.n_tokens = 0 THEN NULL
                   WHEN s.neg_logp <= c.p33 THEN 'head'
                   WHEN s.neg_logp <= c.p67 THEN 'middle'
                   ELSE 'tail' END AS ppl_bucket
            FROM scored s LEFT JOIN cuts c USING (lang)
            ORDER BY s.doc_id"""))

  /** Multinomial Naive Bayes quality log-odds — the CCNet/GPT-3
    * Wikipedia-vs-crawl filter shape. Train labels: sources src0–src3
    * are the "reference-quality" class, everything else is crawl; every
    * document is then scored. The oracle RE-TRAINS the classifier
    * relationally: per-(term, class) counts, Laplace smoothing over the
    * joint vocabulary, and the per-doc log-odds sum plus the doc-count
    * prior, 6-decimal rounding on both sides.
    */
  val textNbQuality = Q("q_text_nb_quality",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Corpus.nbQualityScore(
        d.withColumn("is_ref",
          col("source").isin("src0", "src1", "src2", "src3")),
        "is_ref", d, "text", "doc_id")
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     source IN ('src0','src1','src2','src3') AS pos,
                     UNNEST(LIST_FILTER(
                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '')) AS term
              FROM documents),
            tt AS (
              SELECT term,
                     SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
                     SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cn
              FROM toks GROUP BY term),
            tot AS (
              SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS tp,
                     SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS tn,
                     COUNT(DISTINCT term) AS v
              FROM toks),
            pri AS (
              SELECT SUM(CASE WHEN source IN ('src0','src1','src2','src3')
                              THEN 1 ELSE 0 END) AS dp,
                     SUM(CASE WHEN source IN ('src0','src1','src2','src3')
                              THEN 0 ELSE 1 END) AS dn
              FROM documents),
            per AS (
              SELECT doc_id, COUNT(*) AS n_tokens,
                     SUM(LN(CAST(COALESCE(cp, 0) + 1 AS DOUBLE) / (tp + v)) -
                         LN(CAST(COALESCE(cn, 0) + 1 AS DOUBLE) / (tn + v))) AS s
              FROM toks LEFT JOIN tt USING (term) CROSS JOIN tot
              GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
              ROUND(COALESCE(per.s, 0.0) +
                    LN(CAST(dp AS DOUBLE) / dn), 6) AS log_odds
            FROM documents d CROSS JOIN pri
            LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id"""))

  /** Deterministic mixture reweighting: en down-sampled to 0.5, zh
    * up-sampled to 2.25, es passthrough, everything else 1.5. Hex bounds
    * are [[Corpus.fractionBound]] literals of the fractional parts
    * (0.5 → '8000', 0.25 → '4000', 0.0 → '0000').
    */
  val sampleMixture = Q("q_sample_mixture",
    (s, dir) =>
      Corpus.reweightMixture(Tables.documents(s, dir), "lang", "text",
        Map("en" -> 0.5, "zh" -> 2.25, "es" -> 1.0), defaultWeight = 1.5)
        .select("doc_id", "lang", "copy")
        .orderBy("doc_id", "copy"),
    Some("""WITH c AS (
              SELECT doc_id, lang,
                CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 2
                          WHEN 'es' THEN 1 ELSE 1 END
                + CASE WHEN SUBSTR(MD5(text), 1, 4) <
                         CASE lang WHEN 'en' THEN '8000' WHEN 'zh' THEN '4000'
                                   WHEN 'es' THEN '0000' ELSE '8000' END
                       THEN 1 ELSE 0 END AS copies
              FROM documents)
            SELECT doc_id, lang, CAST(copy AS BIGINT) AS copy
            FROM (SELECT doc_id, lang, UNNEST(RANGE(1, copies + 1)) AS copy
                  FROM c WHERE copies > 0)
            ORDER BY doc_id, copy"""))

  def all: Seq[Q] = Seq(dedupExact, dedupIncremental, dedupIncrementalBloom,
    dedupIncrementalReuseBloom, dedupIncrementalReusePlain,
    dedupIncrementalNear, dedupIncrementalMinhash,
    dedupDecontaminate, dedupDecontaminateEmbed,
    dedupContainment, dedupSubstring, dedupSubstringStrip,
    dedupLineStats, dedupLineStrip, dedupJaccard, dedupEditDist,
    dedupEditDistKeep,
    dedupMinhash, dedupMinhashAuto, dedupSimhash,
    dedupClusters, dedupCosine, dedupCosineLsh, dedupCosineLshAuto,
    dedupSemdedup,
    knnBrute, knnLsh, knnIvf, knnSq8, knnPq, knnIvfPq, knnRp, knnRecallReport, embedCenter,
    textQuality, textLangid, textFingerprint, textTfidf, textHashingTf,
    knnTextHashTf, curateFilter,
    curateGopher, selectDomainCap, selectDsir, graphPagerank, graphCC,
    graphHits, graphTriangles,
    curateSplit, curateShuffle, layoutZorder, curateDomainFilter,
    curateUrlCanon, textWinnow, dedupWinnowPairs, curateScrub,
    curateRepetition, curateChunk,
    curatePack, curatePackBucketed, curatePackFFD, curatePackEmit,
    curateAnnotate,
    sampleStratified, sampleExactK, sampleWeighted, sampleMixture,
    selectRrf,
    textUnigramPpl,
    textBigramPpl, textKneserNey, textBm25, textPplBuckets, textNbQuality,
    selectBudget, selectBudgetPerLang, textNfc, textStripAccents,
    textJaroWinkler, textMultiMatch, textHtmlStrip, curateTokenIds,
    bpeTrain, bpeEncode, unigramTrain, unigramEncode,
    corpusTopNgrams, corpusPmi, corpusSourceReport, corpusLengthHist, corpusDupRate,
    corpusVocab, corpusHll, corpusKmv, corpusKmvOverlap, corpusCms,
    corpusQuantiles, corpusQuantileSketch, corpusWinsorize, corpusProfile,
    mmBinary, mmWav, mmMp3, mmMp4, mmMp4Samples, mmFlac, mmWebp,
    mmPngPixels, mmJpegPixels, mmGifPixels, mmBmpPixels, mmPngResize, mmJpegResize,
    mmFlacPcm, mmWavPcm, mmAudioResample, mmAudioFeatures, mmImageDhash, mmImageNearDup,
    curateE2E, curateE2EScale, curateE2EScreens, curateE2EMinhash)
}
