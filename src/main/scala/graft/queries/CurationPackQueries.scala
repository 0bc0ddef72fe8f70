package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{Bpe, Corpus, Dedup, Graph, Layout, Multimodal, Similarity, Text, Unigram, Wordpiece}

/** Packing/sampling/selection/LM gates: TF-IDF, sequence packing (greedy/bucketed/FFD/emit), samplers, token budgets, RRF, tokenizers (BPE/unigram), n-gram LMs and perplexity screens, corpus reports.
  *
  * Split from CurationQueries (round 13) for navigation only — gate
  * bodies are verbatim; the aggregator preserves the original catalog
  * order.
  */
private[graft] object CurationPackQueries {
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

  /** WordPiece trainer ([[graft.ops.Wordpiece]] — the BERT-family
    * tokenizer completing the triple beside BPE and unigram-LM): eight
    * likelihood-scored merges over continuation-marked symbols. The
    * oracle replays every round's pair counts, symbol-count
    * denominators, the one-division score, the (score desc, l, r)
    * argmax and the payload-stripping merge — decision-for-decision.
    */
  val wordpieceTrain = Q("q_wordpiece_train",
    (s, dir) =>
      Wordpiece.trainTable(Tables.documents(s, dir), "text", nMerges = 8)
        .orderBy("step"),
    Some(Wordpiece.trainOracle(8)))

  /** WordPiece encoder under the vocabulary the 8-merge training run
    * induces (corpus alphabet + merge results): greedy
    * longest-match-first per word position, continuations
    * `##`-prefixed. The oracle re-derives the rules, rebuilds the same
    * vocabulary, greedy-matches every DISTINCT word through a
    * recursive CTE whose every step consumes the longest matching
    * piece, and joins segmentations back to all (doc, pos) tokens —
    * encoder and trainer share one definition of the vocabulary across
    * both engines. (The unknown-token path is structurally unreachable
    * on the training corpus — every code unit is in the alphabet — and
    * is pinned by WordpieceSpec instead.)
    */
  val wordpieceEncode = Q("q_wordpiece_encode",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val rules = Wordpiece.train(docs, "text", nMerges = 8)
      Wordpiece.encode(docs, "text", "doc_id",
        Wordpiece.vocabulary(docs, "text", rules))
        .orderBy("doc_id", "pos")
    },
    Some(Wordpiece.encodeOracle(8)))

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

  val all: Seq[Q] = Seq(textTfidf, curatePackBucketed, curatePackEmit, curatePackFFD, curatePack, sampleStratified, selectBudgetPerLang, textNfc, textStripAccents, textJaroWinkler, textMultiMatch, corpusTopNgrams, corpusPmi, corpusSourceReport, corpusVocab, corpusDupRate, corpusLengthHist, curateTokenIds, bpeTrain, bpeEncode, unigramTrain, unigramEncode, textHtmlStrip, selectBudget, sampleExactK, textBm25, selectRrf, sampleWeighted, textUnigramPpl, textBigramPpl, textKneserNey, textPplBuckets, textNbQuality, sampleMixture)
}
