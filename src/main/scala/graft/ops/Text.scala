package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data curation:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All pure column expressions (codegen'd, no UDFs) so they fuse into the
  * scan's WholeStageCodegen span — at 100 TB these run at parquet-read
  * speed with zero shuffles.
  */
object Text {

  /** Canonical normalization used before fingerprinting/dedup:
    * lowercase, collapse whitespace runs, trim.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text (empty input → empty array). */
  def tokens(c: Column): Column =
    filter(split(normalize(c), " "), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: letter runs, single digits, and isolated
    * punctuation each count as one token (a cheap proxy for GPT-style BPE
    * pre-tokenization — word pieces upper-bounded by letter runs).
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct whitespace tokens. */
  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** Character n-gram shingles of the normalized text. Texts shorter than
    * `n` chars yield a single shingle (the whole text), so every document
    * participates in shingle-based dedup.
    */
  def charShingles(c: Column, n: Int): Column = {
    val norm = normalize(c)
    when(length(norm) <= n, array(norm)).otherwise(
      array_distinct(transform(
        sequence(lit(1), length(norm) - lit(n - 1)),
        i => norm.substr(i, lit(n)))))
  }

  /** Word n-gram shingles (arrays of n consecutive tokens joined by " ").
    *
    * Hot paths must pass a MATERIALIZED token array column (own projection)
    * to [[wordShinglesFromTokens]]: inlining `tokens(c)` here makes every
    * `slice` inside the per-shingle lambda re-run the whole
    * regex/split/filter chain — O(shingles × tokens) regex work per row
    * (observed 10× on the dedup queries).
    */
  def wordShingles(c: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(c), n)

  def wordShinglesFromTokens(t: Column, n: Int): Column =
    when(size(t) <= n, array(concat_ws(" ", t))).otherwise(
      array_distinct(transform(
        sequence(lit(0), size(t) - lit(n)),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))

  /** Non-distinct word n-grams (all occurrences, for frequency metrics —
    * the dedup shingle sets above deliberately dedupe). Fewer than n
    * tokens → empty array.
    */
  def wordNgramsAll(t: Column, n: Int): Column =
    when(size(t) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(t) - lit(n)),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))

  // PII/noise scrub patterns — RE2-compatible (no backrefs/lookaround) so
  // the same pattern strings run identically in Spark (java.util.regex)
  // and DuckDB (RE2); order matters: emails before the generic URL eater.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val PhoneRe = "\\+[0-9][0-9 -]{7,}[0-9]"

  /** C4-style PII/noise scrub: emails, URLs and international-format
    * phone numbers replaced by typed placeholder tokens. Pure codegen'd
    * regexp_replace chain — runs at scan speed, no shuffle.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      PhoneRe, "<PHONE>")

  /** Registrable domain of a URL: the host (up to port/path/query/
    * fragment), lowercased, leading `www.` stripped; empty string for
    * non-URLs. RE2-compatible pattern — runs byte-identically in an SQL
    * oracle. Pure codegen'd expressions, zero shuffle.
    */
  val DomainRe = "https?://([^/:?#]+)"
  def urlDomain(url: Column): Column =
    regexp_replace(regexp_extract(lower(url), DomainRe, 1), "^www\\.", "")

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS local fingerprinting algorithm): hash every char `k`-gram of
    * the normalized text, slide a window of `w` consecutive gram hashes,
    * select each window's MINIMUM (ties → rightmost position — the
    * paper's rule), emit the distinct (fingerprint, pos) selections.
    * The guarantee: any verbatim match of length ≥ w + k − 1 chars
    * between two documents shares at least one fingerprint — which makes
    * a fingerprint equi-join a copy-detection screen with bounded miss
    * length, unlike fixed-stride sampling. Density ≈ 2/(w+1) of gram
    * count, so the index is a fraction of the text size.
    *
    * Hashes are md5-prefix int64s — the cross-engine idiom every
    * hash-keyed gate uses — so the SQL oracle replays gram hashing,
    * window argmin (`ORDER BY h, i DESC`) and the distinct, decision for
    * decision. The selection runs as the fused
    * [[graft.functions.TextExprs.Winnow]] kernel — O(grams) via a
    * monotonic-deque sliding minimum with one reused digest (the HOF
    * twin below, kept spec-pinned bit-identical, allocated a struct per
    * (window, gram) comparison in interpreted lambdas: 16.1 s → ~1 s at
    * sf0.1). The only exchange is whatever the caller joins the
    * fingerprints on. Texts shorter than `k` chars yield one whole-text
    * gram (every doc fingerprints); fewer grams than `w` yield one
    * window over them all.
    */
  def winnowingFingerprints(df: org.apache.spark.sql.DataFrame,
                            idCol: String, textCol: String,
                            k: Int = 5, w: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w must be >= 1")
    df.select(col(idCol),
        explode(graft.functions.TextExprs.winnow(
          normalize(col(textCol)), k, w)).as("__fp"))
      .select(col(idCol),
        col("__fp.pos").as("pos"), col("__fp.h").as("fingerprint"))
  }

  /** Builtin-HOF twin of [[winnowingFingerprints]], kept for bit-parity
    * testing of the fused kernel (the same convention as cosineHof /
    * hyperplaneBucketHof).
    */
  def winnowingFingerprintsHof(df: org.apache.spark.sql.DataFrame,
                               idCol: String, textCol: String,
                               k: Int = 5, w: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w must be >= 1")
    // each stage materializes its column so the next stage's lambdas
    // slice an attribute instead of re-running the whole chain per
    // element (the tokens-materialization trap, same as wordShingles)
    val norm = df.select(col(idCol), normalize(col(textCol)).as("__s"))
    norm.select(col(idCol),
      transform(
        sequence(lit(1), greatest(length(col("__s")) - lit(k - 1), lit(1))),
        i => struct(
          conv(substring(md5(col("__s").substr(i, lit(k))), 1, 15), 16, 10)
            .cast(LongType).as("h"),
          i.cast(IntegerType).as("pos"))).as("__grams"))
      .select(col(idCol),
        transform(
          sequence(lit(1), greatest(size(col("__grams")) - lit(w - 1), lit(1))),
          widx => aggregate(
            slice(col("__grams"), widx, lit(w)),
            struct(lit(Long.MaxValue).as("h"), lit(-1).as("pos")),
            (acc, g) => when(
              g.getField("h") < acc.getField("h") ||
                (g.getField("h") === acc.getField("h") &&
                  g.getField("pos") > acc.getField("pos")),
              g).otherwise(acc))).as("__sel"))
      .select(col(idCol), explode(array_distinct(col("__sel"))).as("__fp"))
      .select(col(idCol),
        col("__fp.pos").as("pos"), col("__fp.h").as("fingerprint"))
  }

  /** Tracking query parameters stripped by [[canonicalUrl]] — the
    * click-attribution noise (utm_*, gclid, fbclid, ref) that makes one
    * page look like thousands of distinct URLs to a crawl frontier.
    */
  val TrackingParamRe = "(?:utm_[a-z0-9]+|gclid|fbclid|ref)"

  /** URL canonicalization for URL-keyed dedup — the screen a crawl
    * corpus applies BEFORE content dedup, collapsing the same page's
    * aliases to one key: scheme and host lowercase, leading `www.` and
    * scheme-default port dropped, fragment dropped, tracking params
    * ([[TrackingParamRe]]) removed from the QUERY STRING only, one
    * trailing slash stripped from a non-root query-less path, empty path
    * normalized to `/`. Query parameter ORDER is preserved (sorting
    * needs a split+re-join; callers that want order-insensitive keys
    * should hash the sorted param list instead). Tracking-param matching
    * is LOWERCASE-only, deliberately: scheme and host are case-folded
    * per RFC 3986, but query parameter names are case-sensitive — an
    * `UTM_SOURCE=x` param is a different (rare) key and is kept.
    * Non-URLs (no `scheme://`) canonicalize to null so they drop out of
    * URL-keyed groupings. RE2-compatible regex chain, pure codegen'd
    * expressions — scan speed, zero shuffle, and the identical patterns
    * replay in the SQL oracle.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)", 1)
    val host0 = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    // split BEFORE stripping: the tracking-param patterns must only ever
    // see the query string — a literal '&ref=…' is legal inside a PATH
    // segment (RFC 3986 pchar includes '&' and '='), and a strip running
    // over path+query would cut it out of the path and mangle the URL
    val pathPart = regexp_extract(rest, "^([^?]*)", 1)
    val queryPart = regexp_extract(rest, "(\\?.*)$", 1)
    // tracking params in three positions: mid-query (&p=v), leading with
    // a successor (?p=v& → ?), leading at end (?p=v → gone)
    val s1 = regexp_replace(queryPart, s"&$TrackingParamRe=[^&]*", "")
    val s2 = regexp_replace(s1, s"\\?$TrackingParamRe=[^&]*&", "?")
    val s3 = regexp_replace(s2, s"\\?$TrackingParamRe=[^&]*$$", "")
    // one trailing slash off a non-root path — only when no query
    // SURVIVES the strip ("(.+)" keeps bare "/"; a query's values may
    // legitimately end in "/", so a surviving query blocks the strip)
    val p1 = when(length(s3) === 0, regexp_replace(pathPart, "^(.+)/$", "$1"))
      .otherwise(pathPart)
    val q4 = concat(p1, s3)
    val path = when(length(q4) === 0, lit("/")).otherwise(q4)
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path))
  }

  // HTML boilerplate patterns — RE2-compatible ((?s) inline flag +
  // non-greedy, no backrefs/lookaround) so the identical strings run in
  // Spark (java.util.regex) and DuckDB (RE2). Order matters: script/
  // style/comment BLOCKS must go before the generic tag eater, or their
  // inner text would survive tag removal.
  val ScriptBlockRe = "(?s)<script[^>]*>.*?</script>"
  val StyleBlockRe = "(?s)<style[^>]*>.*?</style>"
  val HtmlCommentRe = "(?s)<!--.*?-->"
  val HtmlTagRe = "<[^>]+>"

  /** HTML → text extraction, the first screen of any web-corpus
    * pipeline: drop script/style/comment blocks wholesale, strip the
    * remaining tags, decode the common entities, collapse whitespace.
    * A trafilatura-grade extractor needs a DOM; this is the
    * regex-complete subset that is deterministic, engine-portable, and
    * pure codegen'd expressions — zero shuffle, scan-speed.
    */
  def stripHtml(c: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(c, ScriptBlockRe, " "),
        StyleBlockRe, " "),
      HtmlCommentRe, " ")
    val noTags = regexp_replace(noBlocks, HtmlTagRe, " ")
    // &amp; decodes LAST (standard entity-decode order): doing it first
    // would double-decode doubly-escaped text — an author's literal
    // "&amp;lt;" must extract as "&lt;", not "<"
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    // entity strings contain no regex metacharacters — used verbatim so
    // the oracle's RE2 runs the byte-identical pattern (\Q...\E quoting
    // would be java.util.regex-only)
    val decoded = entities.foldLeft(noTags) { case (col0, (e, r)) =>
      regexp_replace(col0, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // Tiny per-language stopword profiles (public common-word lists) for the
  // n-gram/stopword language-ID heuristic.
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Per-language stopword hit count over the document's token set. */
  def langScore(c: Column, stopwords: Seq[String]): Column =
    size(array_intersect(distinctTokens(c),
      array(stopwords.map(lit): _*)))

  /** Heuristic language ID: argmax of stopword-profile hits; zero-hit
    * documents resolve to "und" (undetermined). Deterministic tie-break:
    * a strictly-greater score is required to beat earlier profiles, so a
    * tie resolves to the FIRST (earlier) profile in [[langProfiles]] —
    * an en/es tie returns "en" (the DuckDB oracle mirrors this).
    */
  def langId(c: Column): Column = {
    // Argmax via ONE array_max over (score, -index) structs — struct
    // comparison is lexicographic, so the max carries the highest score
    // and, on ties, the smallest index (earliest profile wins, same
    // strictly-greater semantics as a left fold). The previous foldLeft
    // accumulator re-referenced every earlier score per step, inlining
    // ~k²/2 copies of the tokenize+intersect subtree into one projection
    // — past the codegen size limit the whole stage falls back to
    // interpreted evaluation, which (unlike codegen) has no common-
    // subexpression elimination, so every copy re-ran its regex split
    // per row (measured 3-4× slower on the langid gate).
    val scored = langProfiles.zipWithIndex.map { case ((_, words), i) =>
      struct(langScore(c, words).as("s"), lit(-i).as("ni"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0,
      element_at(array(langProfiles.map(p => lit(p._1)): _*),
        -best.getField("ni") + 1))
      .otherwise(lit("und"))
  }

  /** Quality metrics: chars, tokens, mean token length, punctuation ratio,
    * stopword ratio, uppercase ratio — the standard cheap text-quality
    * signals (cf. C4/Gopher-style filters).
    */
  def qualityStruct(c: Column): Column = {
    val toks = tokens(c)
    val nTok = size(toks)
    val nChar = length(c)
    val punct = size(regexp_extract_all(c, lit("[\\.,;:!\\?\"']"), lit(0)))
    val upper = size(regexp_extract_all(c, lit("[A-Z]"), lit(0)))
    val stop = langScore(c, langProfiles.head._2)
    struct(
      nChar.cast(LongType).as("n_chars"),
      nTok.cast(LongType).as("n_tokens"),
      when(nTok > 0, (nChar - nTok + 1).cast(DoubleType) / nTok).otherwise(lit(0.0)).as("mean_token_len"),
      when(nChar > 0, punct.cast(DoubleType) / nChar).otherwise(lit(0.0)).as("punct_ratio"),
      when(nChar > 0, upper.cast(DoubleType) / nChar).otherwise(lit(0.0)).as("upper_ratio"),
      when(nTok > 0, stop.cast(DoubleType) / nTok).otherwise(lit(0.0)).as("stopword_hit_ratio"))
  }

  /** Feature-hashing ("hashing trick") term-frequency buckets: one row
    * per (doc, bucket) with the count of tokens hashing there — bucket =
    * md5(token) mod `dim`, the same 15-hex-char engine-parity hash every
    * md5-keyed op uses. The long format IS the scale representation
    * (shuffle rows = tokens, bucket space fixed at `dim` regardless of
    * vocabulary); [[hashingTfVector]] densifies it when a fixed-width
    * vector column is needed.
    */
  def hashingTfBuckets(df: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, dim: Int): org.apache.spark.sql.DataFrame = {
    require(dim >= 1, s"dim=$dim must be >= 1")
    df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .select(col(idCol),
        (conv(substring(md5(col("__t")), 1, 15), 16, 10).cast(LongType) % dim).as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Dense `dim`-wide TF vector per document from [[hashingTfBuckets]]:
    * the model-free text vectorizer — identical token multisets map to
    * identical vectors, so the whole vector-similarity family
    * (brute-force/LSH/IVF/PQ top-k, cosine dedup) runs on plain text
    * with no embedding model in the loop. Token-less documents get the
    * zero vector (cosine against it is null — ranked last, never
    * crashed). Counts are exact small ints in double — bit-identical
    * across engines by construction.
    */
  def hashingTfVector(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, dim: Int): org.apache.spark.sql.DataFrame = {
    val dense = hashingTfBuckets(df, idCol, textCol, dim)
      .groupBy(idCol)
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("bucket"), col("cnt").cast(DoubleType))))).as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i.cast(LongType)), lit(0.0))).as("tf"))
    // shuffle_hash: `dense` is corpus-sized, but Catalyst sizes it from
    // the aggregate estimate and would broadcast it — the driver-OOM
    // trap every corpus-sized join in this codebase pins away
    df.select(col(idCol)).distinct()
      .join(dense.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tf"), array_repeat(lit(0.0), dim)).as("tf"))
  }

  /** Gopher-style per-document rule bank (Rae et al. 2021 §A1.1 — the
    * published heuristics, applied verbatim where the signal exists in a
    * plain-text column): token-count band, alphabetic-word fraction,
    * symbol-to-word ratio (# and ellipsis), bullet-started and
    * ellipsis-ended line fractions, and a distinct-stopword floor.
    * Everything is a pure codegen'd expression over one projection — the
    * rule bank fuses into the scan and costs zero shuffles at any scale.
    * Complements [[qualityStruct]] (chars/tokens/punct/case ratios):
    * together they cover the standard quality-filter battery.
    */
  def gopherStruct(c: Column): Column = {
    val toks = tokens(c)
    val nTok = size(toks)
    // a "word" is alphabetic if it contains at least one letter after
    // lowercasing — pure-symbol/numeric tokens fail
    val alphaWords = size(filter(toks, x => x.rlike("[a-z]")))
    val nSym = size(regexp_extract_all(c, lit("#|\\.\\.\\."), lit(0)))
    val lines = split(c, "\n")
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$")))
    val stopHits = langScore(c, langProfiles.head._2)
    struct(
      nTok.cast(LongType).as("n_tokens"),
      when(nTok > 0, alphaWords.cast(DoubleType) / nTok).as("alpha_word_frac"),
      when(nTok > 0, nSym.cast(DoubleType) / nTok).as("symbol_word_ratio"),
      when(nLines > 0, bulletLines.cast(DoubleType) / nLines).as("bullet_line_frac"),
      when(nLines > 0, ellipsisLines.cast(DoubleType) / nLines).as("ellipsis_line_frac"),
      stopHits.cast(LongType).as("n_stopword_hits"))
  }

  /** The published Gopher keep-decision over [[gopherStruct]]'s signals:
    * 50–100k tokens, >80% alphabetic words, <10% symbol-word ratio,
    * <90% bullet lines, <30% ellipsis lines, ≥2 distinct stopwords.
    * Null-safe: a null ratio (empty doc) fails its rule.
    */
  def gopherKeep(g: Column): Column =
    g.getField("n_tokens").between(50L, 100000L) &&
      coalesce(g.getField("alpha_word_frac") > 0.8, lit(false)) &&
      coalesce(g.getField("symbol_word_ratio") < 0.1, lit(false)) &&
      coalesce(g.getField("bullet_line_frac") < 0.9, lit(false)) &&
      coalesce(g.getField("ellipsis_line_frac") < 0.3, lit(false)) &&
      g.getField("n_stopword_hits") >= 2L

  /** Token-window chunking — the context-window packing primitive of a
    * training-data pipeline: split a document into windows of
    * `size` tokens starting every `stride` tokens (overlap =
    * size - stride). Returns array<struct<chunk_text, n_tokens>>; empty
    * docs produce no chunks; the last window may be short (never empty).
    * Pure expressions — chunking fuses into the scan, and the row
    * explosion (posexplode at the call site) is narrow: no shuffle.
    */
  def tokenChunks(t: Column, size: Int, stride: Int): Column = {
    require(size >= 1 && stride >= 1, s"size=$size stride=$stride must be >= 1")
    val n = org.apache.spark.sql.functions.size(t)
    when(n > 0,
      transform(sequence(lit(0), n - 1, lit(stride)), start => struct(
        concat_ws(" ", slice(t, start + 1, lit(size))).as("chunk_text"),
        org.apache.spark.sql.functions.size(slice(t, start + 1, lit(size))).as("n_tokens"))))
      .otherwise(array().cast("array<struct<chunk_text:string,n_tokens:int>>"))
  }

  /** Type-token ratio (distinct tokens / tokens): the cheap repetition
    * signal — heavily repetitive machine-generated text scores low
    * (Gopher-style repetition filters). Null on empty docs.
    */
  def typeTokenRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0, size(array_distinct(t)).cast(DoubleType) / size(t))
  }

  /** Content fingerprint: md5 of the normalized text — stable across
    * engines (DuckDB md5 produces identical hex).
    */
  def fingerprintMd5(c: Column): Column = md5(normalize(c))

  /** Deterministic content-hash dataset split (train/valid/test …):
    * assignment depends only on the key's md5, so it is stable across
    * runs, engines, partitionings, and scale — the property a held-out
    * split must have in a training-data pipeline (resampling per run
    * would leak test data into training).
    *
    * `boundaries` are (label, upperHexBound) pairs over the md5's first
    * two lowercase hex chars compared lexicographically (256 uniform
    * buckets): a row gets the first label whose bound exceeds its prefix,
    * else `defaultLabel`. E.g. ("train","cd"),("valid","e6") ≈ 80/10/10.
    * Pure codegen'd expressions, zero shuffle, trivially portable SQL
    * (DuckDB md5 produces identical hex).
    */
  def hashSplit(key: Column, boundaries: Seq[(String, String)],
                defaultLabel: String): Column = {
    val prefix = substring(md5(key), 1, 2)
    boundaries.foldRight(lit(defaultLabel): Column) { case ((label, bound), rest) =>
      when(prefix < lit(bound), lit(label)).otherwise(rest)
    }
  }

  /** 64-bit rolling fingerprint over the normalized text's tokens: a
    * left fold chaining each token into the running hash (order-sensitive,
    * like a polynomial rolling hash, but expressed as an xxhash64 chain —
    * plain `acc * p + h` would trip ANSI overflow checking).
    */
  def fingerprintRolling(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => xxhash64(acc, t))
}
