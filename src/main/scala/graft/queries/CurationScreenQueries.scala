package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{Bpe, Classifier, Corpus, Dedup, Graph, Layout, Multimodal, Similarity, Text, Unigram}

/** Text-screen gates: quality/langid/Gopher, PII scrub, repetition, URL canon, winnowing, near-dup clustering, hash split/shuffle/z-order.
  *
  * Split from CurationQueries (round 13) for navigation only — gate
  * bodies are verbatim; the aggregator preserves the original catalog
  * order.
  */
private[graft] object CurationScreenQueries {
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

  /** Shared feature frame for the LR-classifier gates: label = "is
    * English" (a deterministic, plausibly-learnable stand-in for a
    * keep/drop quality label), features = the [[Text.qualityStruct]]
    * ratios whose bit-identity against the SQL derivation below is
    * already proven on this channel by `q_text_quality`.
    */
  private def lrFeats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"),
      Text.qualityStruct(col("text")).as("q"))
      .select(col("doc_id"), col("y"),
        col("q.mean_token_len").as("mtl"),
        col("q.punct_ratio").as("punct"),
        col("q.upper_ratio").as("upper"),
        col("q.stopword_hit_ratio").as("stop"))

  private val lrFeatureCols = Seq("mtl", "punct", "upper", "stop")

  /** The same derivation in DuckDB — `q_text_quality`'s oracle CTE with
    * the label and positional feature names (x1..x4 in the Spark call's
    * featureCols order) the [[Classifier]] oracle chain expects.
    */
  private val lrFeatsSql =
    """SELECT doc_id,
      |  CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
      |  1.0 AS x0,
      |  CASE WHEN n_tokens > 0 THEN CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens ELSE 0.0 END AS x1,
      |  CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS x2,
      |  CASE WHEN n_chars > 0 THEN CAST(n_upper AS DOUBLE) / n_chars ELSE 0.0 END AS x3,
      |  CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS x4
      |FROM (SELECT doc_id, lang,
      |        LEN(text) AS n_chars,
      |        LEN(LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '), x -> x <> '')) AS n_tokens,
      |        LEN(REGEXP_EXTRACT_ALL(text, '[\.,;:!\?"'']')) AS n_punct,
      |        LEN(REGEXP_EXTRACT_ALL(text, '[A-Z]')) AS n_upper,
      |        LEN(LIST_INTERSECT(
      |          LIST_DISTINCT(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' ')),
      |          ['the','a','of','and','to','in','is','that','it','for'])) AS n_stop
      |      FROM documents)""".stripMargin

  /** Distributed quality-classifier TRAINING ([[Classifier.lrTrain]]):
    * 6 full-batch GD iterations on the softsign-link linear model over
    * the quality features, the whole coefficient trajectory on the
    * hash channel — DuckDB replays every iteration's quantized
    * gradient sums and weight updates decision-for-decision (the
    * Lloyd/BPE/WordPiece replay discipline applied to a trainable
    * model).
    */
  val textLrTrain = Q("q_text_lr_train",
    (s, dir) => Classifier.lrTrainTable(
      lrFeats(s, dir), lrFeatureCols, "y", nIters = 6)
      .orderBy("iter", "feature"),
    Some(Classifier.lrTrainOracle(lrFeatsSql, lrFeatureCols, nIters = 6)))

  /** Scoring with the trained classifier ([[Classifier.lrScore]]): the
    * final iteration's weights ride the plan as literals and every
    * document gets an exact softsign score + ½-threshold class — one
    * narrow codegen'd scan, oracle re-deriving the identical weights
    * and scores.
    */
  val textLrScore = Q("q_text_lr_score",
    (s, dir) => {
      val f = lrFeats(s, dir)
      val w = Classifier.lrTrain(f, lrFeatureCols, "y", nIters = 6)
        .last.weights
      Classifier.lrScore(f, lrFeatureCols, w, "doc_id").orderBy("doc_id")
    },
    Some(Classifier.lrScoreOracle(lrFeatsSql, "doc_id",
      nFeatures = lrFeatureCols.size, nIters = 6)))

  val all: Seq[Q] = Seq(textQuality, textLangid, curateAnnotate, dedupClusters, curateFilter, curateSplit, curateDomainFilter, textWinnow, dedupWinnowPairs, curateUrlCanon, layoutZorder, curateShuffle, curateScrub, curateRepetition, curateGopher, textLrTrain, textLrScore)
}
