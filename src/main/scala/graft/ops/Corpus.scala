package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Materialize.ForkOps

/** Corpus-level text analytics — the ops that need a shuffle, as opposed
  * to the pure per-row expressions in [[Text]]: TF-IDF term weighting,
  * training-sequence packing, and deterministic stratified sampling.
  */
object Corpus {

  /** Top-`k` TF-IDF terms per document. tf = term count within the doc,
    * idf = ln(N / df) with df = number of docs containing the term and
    * N = total docs; ties on the score break to the lexicographically
    * smaller term.
    *
    * Scale shape: tokenize+explode is narrow; (doc, term) tf and per-term
    * df are two hash aggregations; the df attach is a shuffle join on
    * `term` (the df side is |vocab|-sized — NOT broadcast, vocabulary at
    * corpus scale is billions of terms); N attaches as a broadcast 1-row
    * cross join; top-k compiles to WindowGroupLimit, so only ~k rows per
    * doc survive the final window sort's map side.
    */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val tf = df
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("__n"))
    // shuffle_hash: docFreq is |vocab|-sized and, per Heaps' law, grows
    // with the corpus — without the hint the planner's undersized
    // aggregate estimate picks a driver-built broadcast of the whole
    // vocabulary (plan-shape-tested in CorpusSpec)
    val scored = tf
      .join(docFreq.hint("shuffle_hash"), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast(DoubleType) *
          log(col("__n").cast(DoubleType) / col("df_t").cast(DoubleType)))
    // Rank on the 6-decimal-rounded score, not the raw double: ln() is
    // not bit-specified across libm implementations, and two distinct
    // scores within ~1 ulp of each other could swap rank order between
    // engines, flipping which term survives the top-k cut. Rounding
    // makes the rank key identical everywhere; the term tie-break pins
    // the resulting ties deterministically.
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(col("tfidf"), 6).desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("tfidf"))
  }

  /** Greedy training-sequence packing ("concat-and-chunk"): lay the
    * chunks of each (split, shard) end to end in (`idCol`, `chunkIdCol`)
    * order and cut every `seqLen` tokens; a chunk's pack is
    * floor(tokens-before-it / seqLen). The classic LLM pre-training
    * packing discipline — deterministic, order-stable, and integer-exact
    * (no float arithmetic), so any engine reproduces it bit-for-bit.
    *
    * Scale shape: the running total is a window cumsum, which sorts each
    * (split, shard) partition on one reducer — `nShards` is the scale
    * knob (shard = id mod nShards keeps assignment deterministic; at
    * 100 TB pick nShards so a shard's chunk list fits one executor's
    * spillable sort, e.g. thousands). Packs never span shards, which is
    * the standard trade: global packing order would serialize the corpus
    * through one sorter for zero training benefit.
    *
    * Output: input keys + (shard, pack_id, pack_offset) where
    * `pack_offset` is the chunk's first-token position within its pack.
    * A chunk longer than `seqLen` still packs (its tail bleeds into the
    * following positions — callers chunking with size <= seqLen never
    * hit this).
    */
  def packChunks(chunks: DataFrame, idCol: String, chunkIdCol: String,
                 nTokensCol: String, splitCol: String,
                 seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen >= 1 && nShards >= 1, s"seqLen=$seqLen nShards=$nShards must be >= 1")
    val w = Window.partitionBy(col(splitCol), col("shard"))
      .orderBy(col(idCol), col(chunkIdCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("shard", col(idCol) % nShards)
      .withColumn("__pos",
        sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .withColumn("pack_id", expr(s"__pos div $seqLen"))
      .withColumn("pack_offset", col("__pos") % seqLen)
      .drop("__pos")
  }

  /** [[packChunks]] with sequence-length bucketing: chunks are first
    * binned by `bucketBounds` (bucket = number of bounds <= n_tokens, so
    * bounds (17, 32) give buckets len<17 / 17..31 / 32) and packs are cut
    * within (split, len_bucket, shard). Batches built from one pack then
    * hold near-equal-length sequences — the standard pad-waste reduction:
    * without bucketing a 5-token tail chunk lands between two full
    * chunks and the whole batch pads to the longest member.
    *
    * Same scale shape as [[packChunks]] (window cumsum per partition;
    * bucketing only splits the partitions finer, it adds no shuffle —
    * the bucket is a pure expression on n_tokens).
    */
  def packChunksBucketed(chunks: DataFrame, idCol: String, chunkIdCol: String,
                         nTokensCol: String, splitCol: String,
                         seqLen: Int, nShards: Int,
                         bucketBounds: Seq[Int]): DataFrame = {
    require(seqLen >= 1 && nShards >= 1, s"seqLen=$seqLen nShards=$nShards must be >= 1")
    require(bucketBounds.nonEmpty && bucketBounds == bucketBounds.sorted,
      s"bucketBounds=$bucketBounds must be non-empty and ascending")
    val bucket = bucketBounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(nTokensCol) >= b, 1).otherwise(0)
    }
    val w = Window.partitionBy(col(splitCol), col("len_bucket"), col("shard"))
      .orderBy(col(idCol), col(chunkIdCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("shard", col(idCol) % nShards)
      .withColumn("len_bucket", bucket)
      .withColumn("__pos", sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .withColumn("pack_id", expr(s"__pos div $seqLen"))
      .withColumn("pack_offset", col("__pos") % seqLen)
      .drop("__pos")
  }

  /** First-fit-decreasing bin packing within (split, shard) — the
    * pad-waste optimum chaser where [[packChunks]] is the streaming
    * greedy: chunks sort by length descending and each drops into the
    * first pack with room, so packs close near-full (FFD uses at most
    * 11/9·OPT + 1 packs). Costs a real sort + random access per group,
    * which is exactly the shape Spark's relational layer can't express —
    * this is the codebase's one deliberate `flatMapGroups` (typed
    * per-group imperative logic), and `nShards` bounds the group that
    * must fit one executor's memory, same knob as the window variant.
    * An oversize chunk (n_tokens > seqLen) closes its own pack.
    *
    * Deterministic: items order by (n_tokens desc, id, chunk_id), packs
    * probe in creation order — no RNG, no partition-order dependence.
    * Output: (idCol, chunkIdCol, split, shard, pack_id, pack_offset) like
    * [[packChunks]]; approximate-optimal rather than order-preserving, so
    * it registers rows-only (FFD is not reasonably expressible in SQL).
    */
  def packChunksFFD(chunks: DataFrame, idCol: String, chunkIdCol: String,
                    nTokensCol: String, splitCol: String,
                    seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen >= 1 && nShards >= 1, s"seqLen=$seqLen nShards=$nShards must be >= 1")
    val sp = chunks.sparkSession
    import sp.implicits._
    val base = chunks.select(
      col(idCol).cast(LongType),
      col(chunkIdCol).cast(IntegerType),
      col(nTokensCol).cast(LongType),
      col(splitCol).cast(StringType))
      .as[(Long, Int, Long, String)]
    base.groupByKey { case (id, _, _, split) => (split, (id % nShards).toInt) }
      .flatMapGroups { (key: (String, Int), it: Iterator[(Long, Int, Long, String)]) =>
        val (split, shard) = key
        val items = it.toArray.sortBy { case (id, cid, n, _) => (-n, id, cid) }
        val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (id, cid, n, _) =>
          val fit = sums.indexWhere(_ + n <= seqLen)
          val (pack, offset) =
            if (fit >= 0) { val o = sums(fit); sums(fit) += n; (fit, o) }
            else { sums += n; (sums.length - 1, 0L) }
          (id, cid, split, shard, pack.toLong, offset)
        }
      }
      .toDF(idCol, chunkIdCol, "split", "shard", "pack_id", "pack_offset")
  }

  /** Hex upper bound for a keep-fraction over 16^4 = 65536 uniform
    * md5-prefix buckets (granularity 1/65536 ≈ 0.0015%).
    */
  private[ops] def fractionBound(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction=$fraction out of [0,1]")
    val b = math.round(fraction * 65536).toInt
    // fraction 1.0 needs a bound ABOVE every 4-hex prefix; "10000" would
    // sort lexicographically below "2***".."f***", so use "g" (> 'f').
    if (b >= 65536) "g" else f"$b%04x"
  }

  /** Deterministic stratified sample: keep a row iff the first 4 hex
    * chars of md5(`keyCol`) sort below the stratum's fraction bound.
    * Content-keyed like [[Text.hashSplit]] — the sample is stable across
    * runs, engines, partitionings and scale, and identical keys co-sample
    * (no leakage between a kept row and a dropped duplicate). Fractions
    * quantize to 1/65536. Pure codegen'd expressions, zero shuffle.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    val bound = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(fractionBound(defaultFraction)): org.apache.spark.sql.Column) {
        case ((stratum, f), rest) =>
          when(col(stratumCol) === stratum, lit(fractionBound(f))).otherwise(rest)
      }
    df.filter(substring(md5(col(keyCol)), 1, 4) < bound)
  }

  /** Deterministic EXACT-k sample per stratum: the `k` rows whose
    * (md5(`keyCol`), `idCol`) sorts smallest within each stratum — the
    * eval-set construction shape ("exactly 5k held-out docs per
    * language"), where [[stratifiedSample]]'s per-row fraction test can
    * only hit a target count in expectation. Content-keyed ordering makes
    * the kept set stable across runs, engines and partitionings; `idCol`
    * breaks md5 ties (duplicate keys) deterministically.
    *
    * Scale shape: one shuffle on the stratum. The rank filter compiles to
    * WindowGroupLimit, so each map task pre-prunes to its local top-k per
    * stratum before the exchange — a hot stratum ships k rows per map
    * partition, never its full population, and the reducer-side sort is
    * over ≤ k × maps rows.
    */
  def sampleExactKPerStratum(df: DataFrame, stratumCol: String,
                             keyCol: String, idCol: String,
                             k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    Matching.topKPerGroup(df, Seq(col(stratumCol)),
      Seq(md5(col(keyCol)).asc, col(idCol).asc), k)
  }

  /** Weighted sampling without replacement, k per stratum — the
    * Efraimidis–Spirakis exponential-key scheme made DETERMINISTIC: each
    * row draws u ∈ (0,1] from its md5 ((h+1)/2⁶⁰ — exact: +1 dodges
    * ln(0), the power-of-two division is lossless) keyed on (seed, id),
    * and the k rows with smallest −ln(u)/w win. That ordering samples
    * exactly proportional-to-weight-without-replacement (ES'06), which
    * uniform-hash threshold sampling ([[stratifiedSample]]) and plain
    * md5-rank k-min ([[sampleExactKPerStratum]]) cannot do — the
    * quality-weighted eval-set draw ("pick 1000 docs per language,
    * favoring high quality score") with full reproducibility: same seed
    * → same sample across runs, engines, partitionings; new seed →
    * fresh draw.
    *
    * Cross-engine discipline: −ln(u)/w rounds to 6 decimals BEFORE the
    * rank (libm ln differs in the last ulp between engines — ~1e-15
    * against a 5e-7 rounding grain — and the id tiebreak resolves the
    * collisions rounding creates, so the selected set is
    * engine-identical). Rows with weight ≤ 0 are excluded (a zero
    * weight cannot be drawn). Scale shape: pure expressions + one
    * window, map-side-pruned by WindowGroupLimit like every top-k here.
    * Output: input columns + `sample_rank` (1..k within stratum).
    */
  def weightedSampleK(df: DataFrame, stratumCol: String, idCol: String,
                      weightCol: String, k: Int,
                      seed: String = "es1"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val h = conv(substring(md5(
      concat_ws(":", lit(seed), col(idCol).cast(StringType))), 1, 15), 16, 10)
      .cast(LongType)
    val u = (h + 1).cast(DoubleType) / pow(lit(2.0), lit(60))
    val skey = round(-log(u) / col(weightCol).cast(DoubleType), 6)
    val w = Window.partitionBy(col(stratumCol)).orderBy(skey.asc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Unigram language-model score per document (the CCNet quality-filter
    * shape reduced to its unigram case): train p(term) = count / total on
    * the corpus ITSELF, then score each doc by the mean negative
    * log-probability of its tokens. High scores mark documents whose
    * vocabulary is unusual for the corpus — wrong-language fragments,
    * spam, encoding garbage — the standard "perplexity bucket" signal
    * for keep/drop/review routing.
    *
    * Scale shape: tokenize+explode is narrow; term counts are one hash
    * aggregation; the probability attach is a shuffle join on `term`
    * (vocab-sized — never broadcast, same contract as [[tfIdfTopTerms]]);
    * the corpus total attaches as a broadcast 1-row cross join; the
    * per-doc mean is a second hash aggregation. Token-less docs surface
    * with n_tokens = 0 and score 0.0 rather than dropping out.
    *
    * Output: (idCol, n_tokens, neg_logp) with neg_logp rounded to 6
    * decimals — ln() is not bit-specified across libm implementations
    * and the summation order of the mean is engine-dependent; both
    * effects sit at ~1e-13 while the rank-relevant signal is O(1).
    */
  def unigramNegLogProb(df: DataFrame, textCol: String,
                        idCol: String): DataFrame = {
    // checkpoint: the exploded token stream feeds three consumers (term
    // counts, corpus total, per-doc probe) — unmaterialized, the regex
    // tokenize of the whole corpus would re-run per consumer (the same
    // trap topNgrams' projection-materialization comment documents)
    val toks = df.select(col(idCol), explode(Text.tokens(col(textCol))).as("term"))
      .forkMaterialize()
    val termCounts = toks.groupBy("term").agg(count(lit(1)).as("__c"))
    val total = toks.agg(count(lit(1)).as("__n"))
    val perDoc = toks
      .join(termCounts.hint("shuffle_hash"), Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log(col("__c").cast(DoubleType) / col("__n").cast(DoubleType)))
          .as("__m"))
    // shuffle_hash: perDoc is corpus-sized (one row per doc with tokens);
    // the planner's post-aggregate estimate would otherwise broadcast it
    df.select(col(idCol)).join(perDoc.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("__m"), lit(0.0)), 6).as("neg_logp"))
  }

  /** DSIR scores — Data Selection via Importance Resampling (Xie et
    * al., NeurIPS 2023): every corpus document scored by the
    * hashed-feature importance log-ratio
    * `log p̂_target(x) − log p̂_source(x)`, where both distributions are
    * Laplace-smoothed unigram models over `dim` hash buckets (the
    * hashing trick caps the feature space at a constant regardless of
    * vocabulary — the paper's hashed n-gram construction at n=1; the
    * source model is fit on the corpus being scored itself, per the
    * paper). Positive log-ratio = looks more like the target (e.g. a
    * curated reference set) than like the raw crawl.
    *
    * Scale shape: per-doc bucket counts are [[graft.ops.Text
    * .hashingTfBuckets]] (shuffle rows = tokens, bucket space fixed);
    * the weight table is ≤ `dim` rows — a training-time constant like
    * `encodeTokens`' vocab — and BROADCASTS legitimately; totals ride
    * 1-row broadcasts; the per-doc re-attach is shuffle_hash-pinned like
    * every corpus-sized aggregate side. Zero-token documents score 0
    * (the empty-product convention every per-doc LM op here uses).
    * `log_ratio` rounds to 6 decimals — same cross-engine discipline as
    * the NB/LM gates — so downstream rank cuts are engine-reproducible.
    */
  def dsirScores(corpus: DataFrame, target: DataFrame, textCol: String,
                 idCol: String, dim: Int = 1024): DataFrame = {
    require(dim >= 1, s"dim=$dim must be >= 1")
    // checkpoint: the per-doc bucket frame feeds the source distribution
    // AND the per-doc probe — unmaterialized, the whole tokenize+hash
    // pipeline would run twice
    val docBuckets = Text.hashingTfBuckets(corpus, idCol, textCol, dim)
      .forkMaterialize()
    val srcBuckets = docBuckets.groupBy("bucket").agg(sum("cnt").as("__sc"))
    val srcTotal = srcBuckets.agg(coalesce(sum("__sc"), lit(0L)).as("__st"))
    val tgtBuckets = Text.hashingTfBuckets(target, idCol, textCol, dim)
      .groupBy("bucket").agg(sum("cnt").as("__tc"))
    val tgtTotal = tgtBuckets.agg(coalesce(sum("__tc"), lit(0L)).as("__tt"))
    // a bucket in the target but absent from the source cannot appear in
    // any corpus document, so the source-side bucket list is complete
    // for scoring and a left join suffices
    val weights = srcBuckets
      .join(tgtBuckets, Seq("bucket"), "left")
      .crossJoin(broadcast(srcTotal)).crossJoin(broadcast(tgtTotal))
      .select(col("bucket"),
        (log((coalesce(col("__tc"), lit(0L)) + 1).cast(DoubleType) /
             (col("__tt") + dim).cast(DoubleType)) -
         log((col("__sc") + 1).cast(DoubleType) /
             (col("__st") + dim).cast(DoubleType))).as("__w"))
    val perDoc = docBuckets.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum("cnt").as("n_tokens"),
        sum(col("cnt") * col("__w")).as("__s"))
    corpus.select(col(idCol)).join(perDoc.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("__s"), lit(0.0)), 6).as("log_ratio"))
  }

  /** DSIR selection: the top `k` corpus documents by [[dsirScores]]
    * log-ratio with a deterministic (score desc, id asc) tie-break on
    * the ROUNDED score — the paper's Gumbel-noise resampling trades
    * reproducibility for diversity; the noiseless top-k is the
    * deterministic member of the family and the one an oracle can
    * replay decision-for-decision. Compiles to TakeOrderedAndProject
    * (per-partition heaps of k, k-row driver merge — no global sort).
    */
  def dsirSelect(corpus: DataFrame, target: DataFrame, textCol: String,
                 idCol: String, k: Int, dim: Int = 1024): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    dsirScores(corpus, target, textCol, idCol, dim)
      .orderBy(col("log_ratio").desc, col(idCol))
      .limit(k)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per-document
    * unigram-LM score ([[unigramNegLogProb]]), then PER-LANGUAGE exact
    * tertile cuts label each document `head` (lowest third by neg_logp —
    * most fluent under the LM), `middle`, or `tail` — the split CCNet
    * uses to stage training-data quality. Zero-token documents, which
    * the LM cannot score, bucket to null instead of polluting a tertile.
    *
    * Scale shape: the score is the unigram chain (vocab-keyed hash
    * aggregates, shuffle_hash-pinned corpus-side probe); the lang attach
    * is one corpus-sized equi-join (shuffle_hash-pinned, same rationale);
    * the cuts reuse [[exactQuantiles]]' deterministic integer-rank pick
    * PER LANGUAGE — the CCNet design, which also keeps the rank window a
    * per-group sort instead of a global one — and the cut table is
    * |langs| rows, broadcast. Bucket decisions compare two 6-decimal
    * doubles produced by identical arithmetic on both engines, so the
    * labels are engine-reproducible (ties inside a rank pick don't
    * matter: the value AT a rank is multiset-determined).
    */
  def pplBuckets(df: DataFrame, textCol: String, idCol: String,
                 langCol: String): DataFrame = {
    // `scored` feeds BOTH the tertile-cut aggregate and the final
    // bucket join. Deliberately LAZY: the duplicated subtrees are
    // identical up to the shuffle_hash join's exchanges, which
    // Catalyst's exchange reuse dedupes (docs/SCALING.md §9 — the
    // measured rule; a checkpoint here also cuts the plan that
    // CorpusSpec's no-corpus-broadcast shape test inspects). Callers
    // whose INPUT is an expensive chain checkpoint before calling
    // (Curate does, at the screen fork).
    val scored = unigramNegLogProb(df, textCol, idCol)
      .join(df.select(col(idCol), col(langCol)).hint("shuffle_hash"), Seq(idCol))
    val cuts = exactQuantiles(
      scored.filter(col("n_tokens") > 0), langCol, "neg_logp",
      Seq(1.0 / 3, 2.0 / 3))
    scored.join(broadcast(cuts), Seq(langCol), "left")
      .select(col(idCol), col(langCol), col("n_tokens"), col("neg_logp"),
        when(col("n_tokens") === 0, lit(null).cast(StringType))
          .when(col("neg_logp") <= col("p33"), lit("head"))
          .when(col("neg_logp") <= col("p67"), lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /** Corpus-wide top-`k` word n-grams by occurrence count — boilerplate
    * mining: the n-grams that dominate a crawl (navigation chrome,
    * license blocks, templated headers) surface here first, and their
    * doc-frequencies are what calibrate the near-dup index's
    * `maxShingleDocFreq` cutoff. Ties break to the lexicographically
    * smaller n-gram so the cut is deterministic across engines.
    *
    * Scale shape: explode is narrow; the count is one vocab-keyed hash
    * aggregate; the global top-k compiles to TakeOrderedAndProject
    * (per-partition heaps of k, then a k-row merge on the driver) — no
    * global sort of the n-gram vocabulary ever materializes.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, s"n=$n k=$k must be >= 1")
    // tokens materialized in their own projection (same reason as
    // Dedup.wordShingled): inlined into the n-gram lambda, the whole
    // regex/split/filter chain re-runs per n-gram — measured 4.0 s →
    // 0.6 s at sf0.1 for this query
    df.select(Text.tokens(col(textCol)).as("__toks"))
      .select(explode(Text.wordNgramsAll(col("__toks"), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Per-source corpus mixture report: document count, token total, mean
    * document length, and the Shannon entropy (nats) of the source's
    * language distribution — the at-a-glance diagnostic for "what is
    * actually in this crawl slice" before mixture weights are chosen.
    * Entropy 0 = monolingual source; ln(#langs) = uniform mix.
    *
    * Scale shape: two stacked hash aggregations ((source, lang) → then
    * source); both shuffle only aggregate rows, bounded by
    * |sources| × |langs|, not the corpus.
    */
  def sourceMixtureReport(df: DataFrame, sourceCol: String, langCol: String,
                          textCol: String): DataFrame = {
    val perLang = df
      .select(col(sourceCol), col(langCol),
        Text.tokenCount(col(textCol)).cast(LongType).as("__toks"))
      .groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("__n"), sum(col("__toks")).as("__t"))
    perLang.groupBy(col(sourceCol))
      .agg(sum(col("__n")).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        round(-sum(col("__n") * log(col("__n").cast(DoubleType))).cast(DoubleType) /
          sum(col("__n")) + log(sum(col("__n")).cast(DoubleType)), 6)
          .as("lang_entropy"))
  }

  /** Vocabulary encoding: map every token position to an integer id
    * under a frequency-ranked top-`vocabSize` vocabulary (rank 1 = most
    * frequent; ties break to the lexicographically smaller term), with
    * out-of-vocabulary positions encoded as 0 — the tokenize-to-ids step
    * between chunking and sequence packing. Word-level here; a BPE vocab
    * would slot into the same join shape.
    *
    * Scale shape: the top-K cut compiles to TakeOrderedAndProject (no
    * global sort of the term space); the id attach is a BROADCAST join —
    * deliberately, and unlike the tf-idf/unigram vocab joins, legitimate:
    * the broadcast side is bounded by `vocabSize` (a training-time
    * constant, ≤ a few 100k), not by the corpus. One narrow
    * explode-with-position, zero non-aggregate shuffles.
    *
    * Output: one row per token position (idCol, pos, term, token_id),
    * pos 0-based within the document.
    */
  def encodeTokens(df: DataFrame, textCol: String, idCol: String,
                   vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize must be >= 1")
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "term")))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("term").asc)
      .limit(vocabSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("__c").desc, col("term").asc)))
      .select(col("term"), col("token_id"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .select(col(idCol), col("pos"), col("term"),
        coalesce(col("token_id"), lit(0)).as("token_id"))
  }

  /** Token-budget corpus selection: keep the highest-quality documents
    * whose cumulative token count fits `tokenBudget` — the data-selection
    * step of quality-ranked pre-training corpus construction ("train on
    * the best N tokens"). Selection is at SCORE-BUCKET granularity:
    * scores round to `decimals` places, per-bucket token totals
    * cumulative-sum from the best bucket down, and a bucket is kept iff
    * everything down to and including it fits the budget. Bucket
    * granularity is the scale trade made explicit: a global sort +
    * running sum would serialize the corpus through one reducer for an
    * exact cut, while bucketing needs only a bucket-sized aggregate
    * (≤ 10^decimals × score-range rows) and a broadcast threshold — the
    * budget lands within one boundary bucket of exact, and `decimals`
    * dials that bucket's width.
    *
    * Output: the input rows that survive, plus the bucket key
    * (`score_bucket`) for auditability. Deterministic: same corpus, same
    * budget → same kept set, independent of partitioning.
    */
  def selectByQualityBudget(df: DataFrame, scoreCol: String,
                            nTokensCol: String, tokenBudget: Long,
                            decimals: Int = 3): DataFrame = {
    require(tokenBudget >= 0, s"tokenBudget=$tokenBudget")
    val bucketed = df.withColumn("score_bucket", round(col(scoreCol), decimals))
    val perBucket = bucketed.groupBy("score_bucket")
      .agg(sum(col(nTokensCol)).as("__btoks"))
    // running total from the best bucket down: the bucket list is tiny
    // (bounded by score granularity, not corpus size), so the
    // single-partition window is a deliberate non-issue — flag it as
    // such rather than partitioning by a dummy key
    val cum = perBucket.withColumn("__cum",
      sum(col("__btoks")).over(
        Window.orderBy(col("score_bucket").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val keepBuckets = cum.filter(col("__cum") <= tokenBudget)
      .select(col("score_bucket"))
    bucketed.join(broadcast(keepBuckets), Seq("score_bucket"), "left_semi")
  }

  /** Per-stratum [[selectByQualityBudget]]: an independent token budget
    * per stratum ("the best 2B tokens per language"), cut at the same
    * score-bucket granularity. The cumulative window partitions by the
    * stratum, so the coordination frame stays |strata| × |buckets| —
    * still no corpus-wide sort anywhere.
    */
  def selectByQualityBudgetPerStratum(df: DataFrame, stratumCol: String,
                                      scoreCol: String, nTokensCol: String,
                                      tokenBudgetPerStratum: Long,
                                      decimals: Int = 3): DataFrame = {
    require(tokenBudgetPerStratum >= 0, s"budget=$tokenBudgetPerStratum")
    val bucketed = df.withColumn("score_bucket", round(col(scoreCol), decimals))
    val cum = bucketed.groupBy(col(stratumCol), col("score_bucket"))
      .agg(sum(col(nTokensCol)).as("__btoks"))
      .withColumn("__cum",
        sum(col("__btoks")).over(
          Window.partitionBy(col(stratumCol)).orderBy(col("score_bucket").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val keep = cum.filter(col("__cum") <= tokenBudgetPerStratum)
      .select(col(stratumCol), col("score_bucket"))
    bucketed.join(broadcast(keep), Seq(stratumCol, "score_bucket"), "left_semi")
  }

  /** Bigram language-model score per document, Laplace-smoothed:
    * p(cur | prev) = (c(prev, cur) + 1) / (c(prev) + V) with counts
    * trained on the corpus itself and V the corpus vocabulary size; each
    * doc scores the mean -ln p over its bigram positions. One rung up
    * the CCNet fidelity ladder from [[unigramNegLogProb]] — bigram
    * perplexity separates "right words, scrambled order" from fluent
    * text, which unigram scoring cannot.
    *
    * Scale shape: the bigram count table is corpus-sized (Heaps'-law
    * superlinear in vocab) — both count attaches are shuffle joins,
    * never broadcast (same contract as tf-idf's df attach); V rides a
    * 1-row broadcast. Docs with fewer than 2 tokens surface with
    * n_bigrams = 0 and score 0.0.
    *
    * Output: (idCol, n_bigrams, neg_logp) — neg_logp rounded to 6
    * decimals (ln/mean-order engine divergence sits at ~1e-13).
    */
  def bigramNegLogProb(df: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
    // checkpoint: the bigram stream feeds three consumers (bigram counts,
    // prefix counts via them, per-doc probe) and the vocab agg re-reads
    // toks — materialize once instead of re-tokenizing per consumer
    val bi = toks.filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("prev"),
          element_at(col("__toks"), i + 2).as("cur")))).as("__b"))
      .select(col(idCol), col("__b.prev").as("prev"), col("__b.cur").as("cur"))
      .forkMaterialize()
    val cb = bi.groupBy("prev", "cur").agg(count(lit(1)).as("__cb"))
    val cp = cb.groupBy("prev").agg(sum(col("__cb")).as("__cp"))
    val vocab = toks.select(explode(col("__toks")).as("t"))
      .agg(countDistinct(col("t")).as("__v"))
    val perDoc = bi
      .join(cb.hint("shuffle_hash"), Seq("prev", "cur"))
      .join(cp.hint("shuffle_hash"), Seq("prev"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log((col("__cb") + 1).cast(DoubleType) /
          (col("__cp") + col("__v")).cast(DoubleType))).as("__m"))
    df.select(col(idCol)).join(perDoc.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("__m"), lit(0.0)), 6).as("neg_logp"))
  }

  /** Top-k PMI collocations: adjacent word pairs whose co-occurrence
    * beats the independence baseline — the standard collocation miner
    * ("new york", "machine learning") whose output seeds phrase-aware
    * tokenization and boilerplate phrase lists. PMI(w₁,w₂) =
    * ln((c₁₂/B) / ((c₁/T)·(c₂/T))) over adjacent bigrams; `minCount`
    * floors the bigram count (hapax pairs otherwise dominate — two
    * singletons co-occurring once get the maximal score, a pure
    * noise artifact).
    *
    * Scale shape: two hash aggregations (bigram + unigram counts), the
    * probability attach joins on term (vocab-sized, shuffle_hash-pinned
    * like every LM table here), totals broadcast as 1 row, and the
    * top-k compiles to TakeOrderedAndProject (per-partition heaps — no
    * vocab²-sized sort). Rank key is the 6-decimal-rounded PMI with a
    * (w₁, w₂) tiebreak, the cross-engine cut discipline.
    */
  def topPmiBigrams(df: DataFrame, textCol: String, idCol: String,
                    minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, s"bad params minCount=$minCount k=$k")
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .forkMaterialize()
    val uni = toks.select(explode(col("__toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("__cu"))
    val bi = toks.filter(size(col("__toks")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("w1"),
          element_at(col("__toks"), i + 2).as("w2")))).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("__cb"))
      .filter(col("__cb") >= minCount)
      .forkMaterialize()
    val totals = uni.agg(sum(col("__cu")).as("__t"))
      .crossJoin(bi.agg(count(lit(1)).as("__bt")))
    val pmi = round(log(
      (col("__cb").cast(DoubleType) / col("__bt").cast(DoubleType)) /
        ((col("__c1").cast(DoubleType) / col("__t").cast(DoubleType)) *
          (col("__c2").cast(DoubleType) / col("__t").cast(DoubleType)))), 6)
    cb
      .join(uni.select(col("t").as("w1"), col("__cu").as("__c1")).hint("shuffle_hash"), Seq("w1"))
      .join(uni.select(col("t").as("w2"), col("__cu").as("__c2")).hint("shuffle_hash"), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("__cb").as("pair_count"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Interpolated Kneser-Ney bigram score (mean −ln P_KN(cur|prev) per
    * doc) — the standard LM smoothing Laplace ([[bigramNegLogProb]])
    * only approximates: instead of flattening every context equally, KN
    * discounts observed bigrams by an absolute `discount` D and backs
    * the freed mass off to the CONTINUATION probability — how many
    * distinct contexts a word follows, not how often it occurs ("San
    * Francisco" makes "Francisco" frequent but nearly single-context,
    * so KN correctly scores bare "Francisco" low where raw-frequency
    * backoff overrates it).
    *
    *   P(w|v) = max(c(vw) − D, 0)/c(v) + (D·N1+(v·)/c(v)) · Pc(w)
    *   Pc(w)  = (N1+(·w) + 1) / (B + V)      (with B = bigram types,
    *            V = unigram vocab — the +1/(B+V) floor keeps rare
    *            continuations finite-scored, vanishing as B grows)
    *
    * Self-scoring like [[bigramNegLogProb]]: the model trains on the
    * same corpus it scores, so every probed bigram is observed and the
    * c(v)=0 backoff-to-Pc branch never arises (the probe join is inner
    * by construction, not by accident).
    *
    * D defaults to 0.75 (the textbook value — and exactly representable
    * in binary, so both engines' arithmetic agrees bit-for-bit before
    * the one transcendental ln, which rounds at 6 decimals like every
    * LM gate).
    *
    * Scale shape: count tables are corpus-derived and probe via
    * shuffle_hash-pinned joins (never broadcast — same contract as the
    * other LM operators); only the 1-row (B, V) totals broadcast. The
    * bigram frame materializes once and feeds all four consumers.
    */
  def kneserNeyNegLogProb(df: DataFrame, textCol: String, idCol: String,
                          discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount=$discount must be in (0,1)")
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
    val bi = toks.filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("prev"),
          element_at(col("__toks"), i + 2).as("cur")))).as("__b"))
      .select(col(idCol), col("__b.prev").as("prev"), col("__b.cur").as("cur"))
      .forkMaterialize()
    // bigram types feed four consumers (context totals, left-context
    // counts, the B total, the probe join) — materialize once
    val cb = bi.groupBy("prev", "cur").agg(count(lit(1)).as("__cb"))
      .forkMaterialize()
    val cp = cb.groupBy("prev")
      .agg(sum(col("__cb")).as("__cp"), count(lit(1)).as("__n1r"))
    val nl = cb.groupBy("cur").agg(count(lit(1)).as("__n1l"))
    val totals = cb.agg(count(lit(1)).as("__bt")).crossJoin(
      toks.select(explode(col("__toks")).as("t"))
        .agg(countDistinct(col("t")).as("__v")))
    val pCont = (col("__n1l") + 1).cast(DoubleType) /
      (col("__bt") + col("__v")).cast(DoubleType)
    val p = greatest(col("__cb").cast(DoubleType) - lit(discount), lit(0.0)) /
      col("__cp").cast(DoubleType) +
      (lit(discount) * col("__n1r").cast(DoubleType) / col("__cp").cast(DoubleType)) *
        pCont
    val perDoc = bi
      .join(cb.hint("shuffle_hash"), Seq("prev", "cur"))
      .join(cp.hint("shuffle_hash"), Seq("prev"))
      .join(nl.hint("shuffle_hash"), Seq("cur"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(-log(p)).as("__m"))
    df.select(col(idCol)).join(perDoc.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("__m"), lit(0.0)), 6).as("neg_logp"))
  }

  /** Deterministic mixture reweighting: replicate each row `floor(w)`
    * times plus one extra copy iff its md5 bucket falls below the
    * fractional part of `w`, where `w` is the row's stratum weight — the
    * up-/down-sampling step that retargets a corpus at trained mixture
    * weights (one weight per source/domain/language). Weight 0 drops the
    * stratum; weight 1 passes it through; weight 2.25 emits 2 copies
    * always and a 3rd for ~25% of rows. Content-keyed like
    * [[stratifiedSample]]: identical keys replicate identically, so the
    * realized mixture is stable across runs, engines and partitionings.
    *
    * Scale shape: pure narrow expressions + one explode — zero shuffle,
    * no aggregation; output row count is exactly Σ copies. The `copy`
    * column (1-based) keeps replicated rows distinguishable downstream
    * (e.g. for a later global shuffle-by-hash(id, copy)).
    */
  def reweightMixture(df: DataFrame, stratumCol: String, keyCol: String,
                      weights: Map[String, Double],
                      defaultWeight: Double = 1.0,
                      maxWeight: Double = 100.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "mixture weights must be >= 0")
    // upper sanity bound: output rows scale LINEARLY with each weight
    // (sequence(1, copies) replication), so a typo'd weight — 225 for
    // 2.25 — silently amplifies a stratum 100×. Raise maxWeight
    // explicitly when a three-digit upsample is actually intended.
    require((weights.values ++ Seq(defaultWeight)).forall(_ <= maxWeight),
      s"mixture weight exceeds maxWeight=$maxWeight — output rows grow " +
        "linearly with the weight; raise maxWeight explicitly if intended")
    def copiesFor(w: Double): Column = {
      val base = math.floor(w).toLong
      val frac = w - base
      lit(base) +
        when(substring(md5(col(keyCol)), 1, 4) < lit(fractionBound(frac)), 1L)
          .otherwise(0L)
    }
    val copies = weights.toSeq.sortBy(_._1)
      .foldRight(copiesFor(defaultWeight)) { case ((stratum, w), rest) =>
        when(col(stratumCol) === stratum, copiesFor(w)).otherwise(rest)
      }
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Per-group vocabulary report: token volume, distinct-term count and
    * the corpus-level type/token ratio — the Heaps'-law growth diagnostic
    * (a source whose vocabulary stops growing is repeating itself; one
    * that grows linearly is noise/UUID-like). Scale shape: explode is
    * narrow, the distinct-aggregate shuffles (group, term) pairs — the
    * same |vocab|-bounded frame tfIdfTopTerms builds, never broadcast.
    */
  def vocabReport(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol), explode(Text.tokens(col(textCol))).as("__t"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("__t")).as("n_terms"),
        round(countDistinct(col("__t")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("type_token_ratio"))

  /** Per-group duplication report: how much of each source is exact-dup
    * (by the normalized-content digest [[graft.ops.Dedup.exactDedup]]
    * keys on). Drives mixing decisions — a crawl slice at 40% dup rate
    * gets downweighted or re-deduped before it ships. Scale shape: one
    * distinct-aggregate over (group, 16-byte digest) — text never
    * shuffles, and the result is |groups| rows.
    */
  def dupRateReport(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol), md5(Text.normalize(col(textCol))).as("__d"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("__d")).as("n_distinct"),
        round(lit(1.0) - countDistinct(col("__d")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("dup_rate"))

  /** Token-length histogram per group — the corpus length-distribution
    * diagnostic (where do my source's documents sit relative to the
    * context window?). Bucket = min(n_tokens div bucketWidth, maxBucket);
    * the last bucket absorbs the long tail. One hash aggregation with
    * map-side partial combine — the coordination frame is
    * groups × (maxBucket + 1), never corpus-sized.
    */
  def lengthHistogram(df: DataFrame, textCol: String, groupCol: String,
                      bucketWidth: Int, maxBucket: Int): DataFrame = {
    require(bucketWidth >= 1 && maxBucket >= 0,
      s"bucketWidth=$bucketWidth maxBucket=$maxBucket")
    df.select(col(groupCol),
        Text.tokenCount(col(textCol)).cast(LongType).as("__n"))
      .withColumn("len_bucket", least(expr(s"__n div $bucketWidth"), lit(maxBucket.toLong)))
      .groupBy(col(groupCol), col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("total_tokens"))
  }

  /** URL/domain blocklist filter — the C4/RefinedWeb-style source screen:
    * drop every row whose URL's domain ([[Text.urlDomain]]) appears in
    * `blocked`. The blocklist is a DataFrame, not an in-memory set: real
    * blocklists run to millions of domains, so the filter is an anti-join
    * (Spark broadcasts it automatically below the threshold; above, it
    * degrades gracefully to a shuffle anti-join on the domain key —
    * either way the document text never shuffles, only (domain, id)).
    */
  def filterByDomainBlocklist(df: DataFrame, urlCol: String,
                              blocked: DataFrame, blockedCol: String): DataFrame = {
    // lower() on the blocklist side: Text.urlDomain lowercases extracted
    // domains, so an uppercase blocklist entry would otherwise never
    // match anything — silently dropping nothing
    val b = blocked.select(lower(col(blockedCol)).as("__blocked_domain")).distinct()
    df.withColumn("__domain", Text.urlDomain(col(urlCol)))
      .join(b, col("__domain") === col("__blocked_domain"), "left_anti")
      .drop("__domain")
  }

  /** Exact per-group quantiles by rank: the q-quantile is the value at
    * row ⌈q·n⌉ of the group's value-sorted order — pure integer rank
    * arithmetic, so (unlike `percentile_approx`'s sketch) the answer is
    * deterministic and engine-reproducible; ties on the value can't
    * move the SELECTED value, so no tie-break column is needed. One
    * window sort per group (partition-parallel, never a global sort);
    * the conditional-max collapse reads each group once.
    *
    * At 100 TB this is the per-GROUP quantile tool (each group must fit
    * a spillable sort); for whole-corpus quantiles at that scale compose
    * [[lengthHistogram]]'s bucket counts instead — rank-exactness is
    * rarely worth a global sort.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad quantiles: $qs")
    require(qs.map(q => (q * 100).round).distinct.length == qs.length,
      s"quantile labels collide after integer-percent rounding: $qs")
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol))
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val picks = qs.map { q =>
      max(when(col("__rn") === ceil(lit(q) * col("__n")), col(valueCol)))
        .as(s"p${(q * 100).round}")
    }
    ranked.groupBy(groupCol).agg(picks.head, picks.tail: _*)
  }

  /** Global consecutive row numbering (1..N in (orderCol, idCol) order)
    * WITHOUT a global sort — the exhibit for "what looks like it needs
    * one reducer doesn't": a bare `row_number() OVER (ORDER BY …)`
    * funnels 100 TB through a single partition. Two-phase instead:
    *
    *   1. RANGE-BUCKET by value: `buckets−1` quantile cuts of `orderCol`
    *      split the value domain into ordered ranges; the |cuts|-row
    *      table broadcasts and a CASE chain assigns each row its bucket.
    *      The cuts come from [[exactQuantiles]] over a DETERMINISTIC
    *      md5-hash SAMPLE capped at ~200k rows — Spark's own
    *      RangePartitioner move: quantiles of the full column would
    *      themselves need a per-value global rank (a single-partition
    *      window — the funnel this operator exists to avoid, and exactly
    *      what the first cut of this code shipped before its own plan
    *      audit caught it), while bucket boundaries only need to be
    *      value-respecting and roughly balanced, which a sample gives.
    *      The only single-partition pass left is the sample's own sort,
    *      bounded by the cap whatever the corpus size. Ties at a cut
    *      land in one bucket by the ≤ rule, so bucket ranges respect the
    *      global order — and the OUTPUT is cut-independent: any
    *      deterministic value-respecting split yields the identical
    *      numbering, so sampling costs balance, never correctness.
    *   2. RANK-AND-OFFSET: row_number within each bucket (parallel
    *      window sorts over (orderCol, idCol)) plus the cumulative count
    *      of all lower buckets (a buckets-row frame, windowed on itself
    *      and broadcast back).
    *
    * The result is EXACTLY `row_number() OVER (ORDER BY orderCol, id)`
    * under Spark's null ordering (nulls FIRST ascending — null orderCol
    * rows get a dedicated bucket below every value bucket and number
    * 1..|nulls| by idCol; a DuckDB/Postgres oracle must say NULLS FIRST
    * to agree) — which is what the oracle computes — at the cost of two
    * small broadcasts and per-bucket sorts. Skewed value domains degrade
    * gracefully: a constant column puts everything in one bucket (the
    * sort you asked for), anything else splits ~evenly because the cuts
    * are exact quantiles of the actual data.
    */
  def globalRowNumber(df: DataFrame, orderCol: String, idCol: String,
                      buckets: Int = 32, sampleCap: Long = 200000L): DataFrame = {
    require(buckets >= 2 && buckets <= 100,
      s"buckets=$buckets must be in [2,100] (quantile labels are integer percents)")
    require(sampleCap >= 100, s"sampleCap=$sampleCap too small to cut on")
    val qs = (1 until buckets).map(_.toDouble / buckets)
    // deterministic hash sample for the cut table (content-keyed on
    // (orderCol, idCol) so it is stable across runs/partitionings); the
    // count is one columnar pass — cheap next to the window phase.
    // Null orderCol rows are EXCLUDED from the sample (their md5 key
    // would silently drop the value through concat_ws anyway, and a
    // null-heavy sample could make exactQuantiles emit null cuts) —
    // they get their own dedicated bucket below instead.
    val cap = sampleCap.toDouble
    val nonNull = df.filter(col(orderCol).isNotNull)
    // the sample fraction must come from the NON-NULL count: computing it
    // from the total row count would under-sample (to emptiness, on a
    // mostly-null column at scale) the only rows the cut table can use
    val nn = nonNull.count()
    val sampled =
      if (nn <= cap) nonNull
      else nonNull.filter(
        substring(md5(concat_ws(":",
          col(orderCol).cast(StringType), col(idCol).cast(StringType))), 1, 4)
          < lit(fractionBound(cap / nn)))
    val cuts = exactQuantiles(sampled.withColumn("__g", lit(1)), "__g", orderCol, qs)
      .drop("__g")
    val cutCols = qs.map(q => s"p${(q * 100).round}")
    // degenerate input — no non-null order values at all: the cut frame
    // is EMPTY and the crossJoin below would silently drop every row.
    // Every row is null-keyed, so one bucket suffices and the numbering
    // contract (nulls 1..|nulls| by idCol) is preserved verbatim.
    val noCuts = nn == 0L
    // Null orderCol → bucket -1, BELOW every value bucket: Spark sorts
    // nulls FIRST ascending, so `row_number() OVER (ORDER BY orderCol,
    // idCol)` numbers the null rows 1..|nulls| (by idCol) before any
    // non-null row — the CASE chain must not let them fall through the
    // `<= cut` tests (every comparison with null is null, i.e. false-ish)
    // into the LAST bucket, which would place them at the top instead.
    // NOTE the SQL-dialect caveat: DuckDB/Postgres default to NULLS LAST
    // ascending, so an oracle replaying this on nullable order keys must
    // spell ORDER BY orderCol NULLS FIRST to match.
    val bucket = cutCols.zipWithIndex.foldRight(lit(buckets - 1)) {
      case ((c, i), rest) => when(col(orderCol) <= col(c), lit(i)).otherwise(rest)
    }
    val bucketWithNull = when(col(orderCol).isNull, lit(-1)).otherwise(bucket)
    val wb = Window.partitionBy("__bucket").orderBy(col(orderCol), col(idCol))
    val bucketed =
      if (noCuts) df.withColumn("__bucket",
        when(col(orderCol).isNull, lit(-1)).otherwise(lit(0)))
      else df.crossJoin(broadcast(cuts))
        .withColumn("__bucket", bucketWithNull)
        .drop(cutCols: _*)
    val ranked = bucketed.withColumn("__rn", row_number().over(wb))
    val offsets = ranked.groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bucket", "__offset")
    ranked.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("global_row", col("__offset") + col("__rn"))
      .drop("__bucket", "__rn", "__offset")
  }

  /** BM25 relevance of every document against a fixed query-term set
    * (Robertson–Spärck Jones idf, k1/b tf–length normalization) — the
    * retrieval-scoring primitive a curation pipeline uses to SELECT
    * topically-relevant training data ("rank the crawl against these
    * domain seed terms") where TF-IDF top-terms only DESCRIBES documents:
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *
    * Scale shape: the token explode filters to the query-term set
    * IMMEDIATELY (narrow — only query-term occurrences survive into the
    * (doc, term) aggregate), the df table is ≤ |terms| rows and the
    * (N, avgdl) totals 1 row — both broadcast; one hash agg per side.
    * avgdl is an exact-integer sum/count division, deterministic; the
    * per-doc Σ over ≤ |terms| products rounds at 6 decimals (the ln +
    * sum-order discipline every LM gate uses). Docs matching no query
    * term score 0.0 rather than dropping out.
    */
  def bm25Scores(df: DataFrame, textCol: String, idCol: String,
                 queryTerms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Scores needs at least one query term")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val terms = queryTerms.distinct
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
      .forkMaterialize() // feeds totals + the tf stream
    val nd = toks.agg(count(lit(1)).as("__n"),
      avg(col("__dl").cast(DoubleType)).as("__avgdl"))
    val tf = toks.select(col(idCol), col("__dl"), explode(col("__toks")).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy(col(idCol), col("__dl"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
    val dft = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val norm = col("__tf").cast(DoubleType) * (lit(k1) + lit(1.0)) /
      (col("__tf").cast(DoubleType) +
        lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("__dl").cast(DoubleType) / col("__avgdl")))
    val perDoc = tf
      .join(broadcast(dft), Seq("__t"))
      .crossJoin(broadcast(nd))
      .groupBy(col(idCol))
      .agg(round(sum(idf * norm), 6).as("bm25"))
    df.select(col(idCol)).join(perDoc.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("bm25"), lit(0.0)).as("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09): combine
    * N independent rankings of the same id space into one score,
    * Σᵢ 1/(k + rankᵢ) — the standard hybrid-retrieval combiner (BM25 ⊕
    * embedding similarity ⊕ quality prior) that needs no score
    * calibration because only RANKS enter. Each input is (frame,
    * scoreCol) with HIGHER-IS-BETTER scores; negate on the way in for
    * ascending signals.
    *
    * Ranks come from [[globalRowNumber]] (score desc, id tiebreak), so
    * the global ranking never funnels through one reducer — the
    * composition is the point: a bare `row_number() OVER (ORDER BY
    * score)` per ranking would be N single-partition sorts of the
    * corpus. Ids absent from a ranking contribute 0 (full-outer
    * fusion); the per-doc sum folds in FIXED input order, so the
    * float result is engine-reproducible, rounded at 9.
    */
  def rrfFuse(rankings: Seq[(DataFrame, String)], idCol: String,
              kRrf: Int = 60, buckets: Int = 32): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(kRrf >= 1, s"kRrf=$kRrf must be >= 1")
    val contribs = rankings.zipWithIndex.map { case ((df, sc), i) =>
      globalRowNumber(
        df.select(col(idCol), negate(col(sc).cast(DoubleType)).as("__negs")),
        "__negs", idCol, buckets)
        .select(col(idCol),
          (lit(1.0) / (lit(kRrf.toDouble) + col("global_row").cast(DoubleType)))
            .as(s"__c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val fused = contribs.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol), round(fused, 9).as("rrf"))
  }

  /** Per-group winsorization: clamp `valueCol` into its group's
    * [pLo, pHi] exact-quantile band — the robust-preprocessing twin of
    * the validators' LocScaleB bounds (those NULL outliers; this CLIPS
    * them, the right semantics for downstream aggregates that must keep
    * every row — mean token counts, length-normalized scores — without a
    * single pathological document dragging them). Quantile picks are
    * [[exactQuantiles]]' deterministic integer-rank values (actual data
    * values, never interpolated), so the clamp decisions are
    * engine-reproducible with zero float discipline.
    *
    * Scale shape: one [[exactQuantiles]] pass (partition-parallel window
    * sorts) produces a |groups|-row cut table, joined back broadcast —
    * the input never shuffles. Output: input columns +
    * `<valueCol>_clipped`.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, s"pLo=$pLo must be < pHi=$pHi")
    val loName = s"p${(pLo * 100).round}"
    val hiName = s"p${(pHi * 100).round}"
    val cuts = exactQuantiles(df, groupCol, valueCol, Seq(pLo, pHi))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn(s"${valueCol}_clipped",
        least(greatest(col(valueCol), col(loName)), col(hiName)))
      .drop(loName, hiName)
  }

  /** HyperLogLog register count (m = 2^4) and its bias constant α₁₆
    * (Flajolet et al. 2007, Fig. 3 — the published small-m constant).
    * m=16 keeps the relative error ≈ 1.04/√16 ≈ 26%: a smoke-scale
    * parameterization chosen so a unit test can exercise BOTH the
    * linear-counting and the raw-estimate branch on small corpora; a
    * production p would be 12–16. Every piece of the pipeline is
    * p-generic except the two constants.
    */
  val HllM = 16
  val HllAlpha = 0.673

  /** Per-(group, register) max leading-zero rank — the HLL SKETCH state.
    * Register = first md5 hex digit; rank ρ = leading-zero bits of the
    * next 32 hash bits + 1 (33 when all zero), computed with pure string
    * and integer ops (regexp `^0*` + a hex-digit CASE) so the decision
    * carries NO floating point — `floor(log2)` at a power-of-two
    * boundary is exactly the cross-engine trap this avoids.
    *
    * This frame IS the mergeable sketch: max per register is
    * associative/commutative/idempotent, so partial aggregation combines
    * map-side, re-partitioning can't change it, and sketches from
    * different days/shards/engines union by the same `max` — the
    * property that makes distinct-counting feasible at 100 TB (the
    * shuffle carries ≤ m rows per group, never the keys).
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    // null keys are EXCLUDED, matching COUNT(DISTINCT) semantics: md5 of
    // a null key would otherwise land a (group, null, null) register row
    // that hllEstimate counts in __nreg but not in the harmonic sum —
    // null silently inflating the estimate like an extra distinct key
    val keyed = df.filter(col(keyCol).isNotNull)
    val h = md5(col(keyCol).cast(StringType))
    val reg = conv(substring(col("__h"), 1, 1), 16, 10).cast(IntegerType)
    val win = substring(col("__h"), 2, 8)
    val lz = length(regexp_extract(win, "^0*", 0))
    // value of the first nonzero hex digit in the window ('' → 0 when
    // the window is all zeros; that branch resolves to ρ = 33 anyway)
    val fd = when(lz === 8, lit(0))
      .otherwise(conv(win.substr(lz + 1, lit(1)), 16, 10).cast(IntegerType))
    val lzBits = when(fd >= 8, lit(0)).when(fd >= 4, lit(1))
      .when(fd >= 2, lit(2)).otherwise(lit(3))
    val rho = when(lz === 8, lit(33)).otherwise(lz * 4 + lzBits + 1)
    keyed.select(col(groupCol).as("__g"), h.as("__h"))
      .select(col("__g"), reg.as("__reg"), rho.as("__rho"))
      .groupBy("__g", "__reg").agg(max("__rho").as("__mr"))
  }

  /** HLL estimate from a register frame: harmonic mean of 2^-ρ over all
    * m registers (absent registers contribute 2⁰ = 1), α·m²/harmonic,
    * with the published linear-counting correction (E ≤ 2.5m and empty
    * registers present → m·ln(m/V)). The harmonic sum is a sum of exact
    * powers of two spanning < 53 bits, so it is EXACT in double and
    * order-independent — the one place HLL needs a float sum, made
    * engine-reproducible by construction.
    */
  def hllEstimate(registers: DataFrame, groupCol: String): DataFrame = {
    val agg = registers.groupBy("__g").agg(
      count(lit(1)).as("__nreg"),
      sum(pow(lit(2.0), -col("__mr"))).as("__hp"))
    val harmonic = (lit(HllM) - col("__nreg")).cast(DoubleType) + col("__hp")
    val e = lit(HllAlpha) * HllM * HllM / harmonic
    val v = lit(HllM) - col("__nreg")
    agg.select(col("__g").as(groupCol),
      when(e <= 2.5 * HllM && v > 0,
        lit(HllM.toDouble) * log(lit(HllM).cast(DoubleType) / v))
        .otherwise(e).as("est_distinct"))
  }

  /** Approximate distinct `keyCol` per `groupCol` — [[hllRegisters]]
    * composed with [[hllEstimate]]. Exact distinct shuffles every
    * distinct (group, key) pair; this shuffles ≤ m tiny rows per group
    * regardless of cardinality.
    */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, keyCol), groupCol)

  /** Count-min sketch geometry: depth 4 hash rows × width 1024 counters.
    * Error bound: overestimate ≤ ε·N with probability 1−δ where
    * ε = e/width ≈ 0.27% and δ = e^−depth ≈ 1.8% — Cormode &
    * Muthukrishnan 2005's published parameterization.
    */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Count-min counter frame over a key column — the mergeable
    * frequency-sketch state: (row j, bucket, count) with bucket =
    * md5(j‖'_'‖key) mod width (15 hex chars → 60 bits, the same
    * engine-parity hash the LSH planes use — no RNG, no seed state).
    * Counters SUM across shards/days/engines, and the frame is at most
    * depth·width rows no matter the corpus size — the shuffle carries
    * ≤ 4096 rows, never the keys, which is what bounded-memory frequency
    * estimation over 100 TB of tokens requires.
    */
  def cmsCounters(df: DataFrame, keyCol: String): DataFrame =
    // null keys are excluded (md5 of null hashes to a null bucket no
    // lookup can reach — counting them would break est ≥ true for nulls
    // while helping no real key); same COUNT-semantics as the HLL sketch
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast(StringType).as("__k"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("__j"))
      .select(col("__j"),
        (conv(substring(md5(concat(col("__j").cast(StringType), lit("_"), col("__k"))),
          1, 15), 16, 10).cast(LongType) % CmsWidth).as("__b"))
      .groupBy("__j", "__b").agg(count(lit(1)).as("c"))

  /** Point estimates for `candidates` against a counter frame: min over
    * the depth rows of each candidate's bucket counter (0 when a bucket
    * was never hit). The counter frame is ≤ depth·width rows —
    * broadcast — so estimation is a map-side join however many
    * candidates stream through. CMS never under-counts: estimate ≥ true
    * frequency, with the ε·N overestimate bound above.
    */
  def cmsEstimate(counters: DataFrame, candidates: DataFrame, keyCol: String): DataFrame =
    // null candidates drop (their occurrences were never counted — see
    // [[cmsCounters]]); emitting est = 0 for them would silently violate
    // the never-under-counts contract instead
    candidates.filter(col(keyCol).isNotNull)
      .select(col(keyCol), col(keyCol).cast(StringType).as("__k"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("__j"))
      .select(col(keyCol), col("__j"),
        (conv(substring(md5(concat(col("__j").cast(StringType), lit("_"), col("__k"))),
          1, 15), 16, 10).cast(LongType) % CmsWidth).as("__b"))
      .join(broadcast(counters), Seq("__j", "__b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))

  /** ANALYZE-style column profile: one row per listed column with row
    * count, null count, and HLL-estimated distinct count — the
    * table-stats pass an optimizer or a data-quality dashboard wants,
    * composed from [[hllRegisters]] so the distinct estimate costs ≤ m
    * shuffle rows per column instead of a per-column distinct. The
    * unpivot is a narrow explode (one pass over the table however many
    * columns profile); values are compared as their string casts, which
    * both engines render identically for the integral/string types the
    * gates exercise.
    */
  /** KMV distinct sketch per group — k smallest distinct md5-60-bit
    * hashes via the [[graft.functions.SketchExprs.KmvAgg]] single-pass
    * aggregate (map-side partial buffers already capped at k, so the
    * shuffle carries ≤ k longs per group per input partition — duplicate
    * keys never travel). One frame row per group: (groupCol, kmv).
    */
  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.SketchExprs.kmvSketch(col(keyCol), k).as("kmv"))

  /** Distinct estimate from a KMV sketch: exact when the group yielded
    * fewer than k hashes (the sketch IS its distinct set), else the
    * standard (k−1)/u_k with u_k the k-th smallest hash normalized to
    * [0,1) by the exact power 2⁶⁰ — one division chain, deterministic
    * cross-engine (h/2⁶⁰ is exact: division by a power of two).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame =
    kmvSketch(df, groupCol, keyCol, k).select(
      col(groupCol),
      size(col("kmv")).cast(LongType).as("n_sketch"),
      when(size(col("kmv")) < k, size(col("kmv")).cast(DoubleType))
        .otherwise(lit((k - 1).toDouble) /
          (element_at(col("kmv"), k).cast(DoubleType) / pow(lit(2.0), lit(60))))
        .as("est_distinct"))

  /** Cross-group overlap report from KMV sketches — the composition HLL
    * registers cannot do: for every group pair, the k smallest hashes of
    * the sketch UNION are an unbiased sample of the union's key space,
    * so ρ = |{union-sketch hashes present in BOTH sketches}| / |union
    * sketch| estimates Jaccard directly (Beyer et al., SIGMOD'07), and
    * est_intersection = ρ · est_union. All set arithmetic on ≤ k-long
    * arrays; the pair join carries one sketch row per group — at crawl
    * scale this is a |sources|² join of k·8-byte arrays, trivially
    * broadcastable, after ONE corpus pass built the sketches. Pairs with
    * |union sketch| < k are exact (both sketches are exact sets there).
    */
  def kmvOverlapReport(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    val sk = kmvSketch(df, groupCol, keyCol, k)
    val a = sk.select(col(groupCol).as("group_a"), col("kmv").as("__ka"))
    val b = sk.select(col(groupCol).as("group_b"), col("kmv").as("__kb"))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("__u", slice(array_sort(array_union(col("__ka"), col("__kb"))), 1, k))
      .withColumn("__nu", size(col("__u")))
      .withColumn("__rho",
        size(array_intersect(col("__u"), array_intersect(col("__ka"), col("__kb")))))
      .withColumn("est_union",
        when(col("__nu") < k, col("__nu").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("__u"), k).cast(DoubleType) / pow(lit(2.0), lit(60)))))
      .withColumn("est_jaccard",
        col("__rho").cast(DoubleType) / col("__nu").cast(DoubleType))
      .withColumn("est_intersection", col("est_jaccard") * col("est_union"))
      .select(col("group_a"), col("group_b"), col("__nu").cast(LongType).as("n_union_sketch"),
        col("__rho").cast(LongType).as("n_shared"), col("est_union"),
        col("est_jaccard"), col("est_intersection"))
  }

  /** Log-bucket mergeable quantile-sketch frame — the percentile
    * summary the HLL/CMS/KMV family was missing: each non-negative long
    * value keeps only its top `subBits`+1 significant bits (its low
    * bits zeroed), so the bucket id IS the bucket's lower bound and
    * consecutive buckets have relative width 2^−subBits; the sketch is
    * the per-(group, bucket) COUNT frame. This is the HdrHistogram /
    * DDSketch bucket idea in integer-exact form — and the deliberate
    * alternative to a KLL sketch, whose compaction output depends on
    * insertion/merge ORDER: Spark's partial aggregation merges buffers
    * in nondeterministic partition order and a cross-engine oracle
    * cannot replay a schedule, while this frame is a pure function of
    * the multiset (merge = SUM by bucket — commutative, associative),
    * so shards/days/engines all land on identical state. Values below
    * 2^(subBits+1) are represented EXACTLY.
    *
    * Bucketing is pure integer/string arithmetic both engines share
    * bit-for-bit — bit length via LENGTH(BIN(v)) and two shifts — no
    * log() whose last-ulp could disagree across libm implementations.
    *
    * Scale shape: the shuffle carries ≤ (64−subBits)·2^subBits + 2^subBits
    * bucket rows per group whatever the corpus size (subBits=7 → ≤ ~7.5k,
    * realistic value ranges far fewer), with map-side partial counting;
    * value payloads never shuffle. Frames from independent partitions
    * of a 100 TB corpus, or from days of a stream, merge by one
    * bucket-sized SUM.
    */
  def quantileSketch(df: DataFrame, groupCol: String, valueCol: String,
                     subBits: Int = 7): DataFrame = {
    require(subBits >= 1 && subBits <= 20, s"subBits=$subBits out of [1,20]")
    // negative values would bucket nonsensically (BIN of a negative long
    // is its two's-complement, 64 chars) — fail fast at execution, same
    // discipline as intervalOverlapJoin's inversion assert
    // the null filter runs BEFORE the cast, so a non-null value the cast
    // cannot represent (non-numeric string, overflowing decimal) arrives
    // here as a null __v — the assert condition must name that case too,
    // or the failure reads "negative value" for an input that never was
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast(LongType).as("__v"))
      .filter(assert_true(col("__v").isNotNull && col("__v") >= 0,
        lit(s"quantileSketch($valueCol): negative or long-uncastable value — " +
          "the sketch domain is [0, 2^63)")).isNull)
      .withColumn("__s",
        greatest(lit(0), length(bin(col("__v"))) - lit(subBits + 1)))
      .withColumn("bucket", expr("shiftleft(shiftright(__v, __s), __s)"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Quantile estimates off a [[quantileSketch]] frame: for each q the
    * LOWEST bucket whose cumulative count reaches the exact integer
    * rank ⌈q·n⌉ — the same rank definition as [[exactQuantiles]], so
    * the two are twin-comparable. The reported value is the containing
    * bucket's lower bound: est ≤ true q-quantile < est·(1 + 2^−subBits)
    * (exactly the true value below 2^(subBits+1)). All arithmetic is
    * integer + one ⌈q·n⌉, deterministic cross-engine. The frame is
    * bucket-bounded, so the window sorts are trivial however large the
    * corpus that produced it.
    */
  def quantileSketchEstimate(counters: DataFrame, groupCol: String,
                             qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad quantiles: $qs")
    require(qs.map(q => (q * 100).round).distinct.length == qs.length,
      s"quantile labels collide after integer-percent rounding: $qs")
    val cum = counters
      .withColumn("__cum", sum(col("c")).over(
        Window.partitionBy(groupCol).orderBy(col("bucket"))))
      .withColumn("__n", sum(col("c")).over(Window.partitionBy(groupCol)))
    val picks = qs.map { q =>
      min(when(col("__cum") >= ceil(lit(q) * col("__n")), col("bucket")))
        .as(s"p${(q * 100).round}")
    }
    cum.groupBy(groupCol).agg(picks.head, picks.tail: _*)
  }

  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val long = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast(StringType).as("__v"))): _*)).as("s"))
      .select(col("s.col_name").as("col_name"), col("s.__v").as("__v"))
    val basic = long.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_nulls"))
    val est = hllEstimate(
      hllRegisters(long.filter(col("__v").isNotNull), "col_name", "__v"), "col_name")
    basic.join(est, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        round(col("est_distinct"), 6).as("n_distinct_est"))
  }

  /** RefinedWeb-style per-domain cap: keep at most `cap` documents per
    * domain, chosen by deterministic hash rank (md5(seed ‖ id), id as the
    * total tie-break) — a pseudo-random but engine-reproducible sample,
    * so a dominant domain can't swamp the corpus mixture and reruns keep
    * the SAME representatives. `seed` draws a fresh sample.
    *
    * Scale shape: one shuffle on the domain key; the rank-≤cap filter is
    * a WindowGroupLimit in Spark 3.5+, so each partition keeps only cap
    * rows per domain BEFORE the full sort materializes — a skewed
    * mega-domain costs its partial top-cap per map task, not a full
    * per-domain sort. Document payloads ride the one shuffle; at 100 TB
    * cap on (domain, id) first and semi-join the survivors if rows are
    * wide.
    */
  def capPerDomain(df: DataFrame, domainCol: String, idCol: String,
                   cap: Int, seed: String = ""): DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1")
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col(domainCol))
          .orderBy(md5(concat(lit(seed), col(idCol).cast(StringType))), col(idCol))))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Deterministic epoch shuffle: every row gets a pseudo-random `shard`
    * (one md5-prefix byte mod `nShards` — no RNG, so the permutation is a
    * pure function of (seed, id) and reproduces across runs, engines and
    * partitionings) and a dense 1-based `pos` within its shard (by hash
    * order). Reading shards in (shard, pos) order yields a shuffled epoch;
    * a new `seed` (e.g. the epoch number) draws a fresh permutation.
    *
    * Scale shape: shard assignment is a pure expression; positioning is a
    * row_number over (shard) — `nShards` partition-parallel sorts, never
    * a single global sort. At 100 TB pick nShards so one shard fits an
    * executor's spillable sort (thousands); training readers consume
    * shard files independently, which is exactly the layout they want.
    */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int,
                   seed: String = ""): DataFrame = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards=$nShards out of [1,256] (one md5 byte drives assignment)")
    def nib(i: Int): Column =
      expr(s"instr('0123456789abcdef', substring(__k, $i, 1))") - 1
    df.withColumn("__k", md5(concat(lit(seed), col(idCol).cast(StringType))))
      .withColumn("shard", (nib(1) * 16 + nib(2)) % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("__k"), col(idCol))))
      .drop("__k")
  }

  /** Multinomial Naive Bayes quality classifier — the CCNet/GPT-3-style
    * "looks-like-the-reference-corpus" scorer: train on a labeled corpus
    * (`posCol` true = reference-quality, false = crawl), then score every
    * document in `corpus` with the log-odds
    *
    *   log P(pos) − log P(neg) + Σ_t [ log p(t|pos) − log p(t|neg) ]
    *
    * where p(t|c) = (count(t,c)+1) / (tokens_c + V) is Laplace-smoothed
    * over the TRAINING vocabulary V (distinct terms across both classes).
    * A term the training set never saw contributes the constant
    * log((tokens_neg+V)/(tokens_pos+V)) — both class likelihoods collapse
    * to their smoothing floor, so OOV text drifts toward the prior rather
    * than exploding. Positive log-odds = "keep" under the usual
    * Wikipedia-vs-CommonCrawl filter.
    *
    * Everything is counting and logs of rationals — no SGD, no RNG — so
    * training is ONE hash aggregation and the whole model is
    * reproducible across engines (the correctness oracle re-trains it
    * relationally).
    *
    * Scale shape: the per-class term table is vocab-sized (billions of
    * terms at 100 TB) — the score probe joins the exploded token stream
    * to it ON TERM via shuffle_hash, never broadcast (same contract as
    * [[tfIdfTopTerms]]' df attach); class totals / V / priors ride a
    * 1-row broadcast. Docs with zero tokens score exactly the prior
    * log-odds.
    *
    * Output: (idCol, n_tokens, log_odds) — log_odds rounded to 6
    * decimals (sum-order engine divergence sits at ~1e-12).
    */
  def nbQualityScore(train: DataFrame, posCol: String,
                     corpus: DataFrame, textCol: String,
                     idCol: String): DataFrame = {
    // one boolean label column; count docs + tokens per class, then the
    // (term, class) table pivoted to one row per term so the probe join
    // touches ONE vocab-sized side, not two
    val trainToks = train
      .select(col(posCol).cast(BooleanType).as("__pos"),
        explode(Text.tokens(col(textCol))).as("term"))
      .forkMaterialize()
    val termTable = trainToks.groupBy("term")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__cp"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("__cn"))
    // 1-row constants frame: class token totals, vocab size, doc priors.
    // Computed as two tiny aggs cross-joined — each is a full pass over
    // the (already checkpointed) token stream / train frame, both
    // corpus-bounded single-row reductions.
    val totals = trainToks.agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("__tp"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).as("__tn"),
      countDistinct(col("term")).as("__v"))
    val priors = train.agg(
      sum(when(col(posCol).cast(BooleanType), 1L).otherwise(0L)).as("__dp"),
      sum(when(!col(posCol).cast(BooleanType), 1L).otherwise(0L)).as("__dn"))
    // Precondition: BOTH classes present in the training set — the doc
    // prior log(dp/dn) is undefined otherwise and a silent ±Infinity
    // would poison every log_odds downstream. One tiny eager agg over
    // the (small, labeled) training frame, same require-style contract
    // as winnowCopyPairs/randomProject.
    locally {
      val pr = priors.head()
      val dp = if (pr.isNullAt(0)) 0L else pr.getLong(0)
      val dn = if (pr.isNullAt(1)) 0L else pr.getLong(1)
      require(dp > 0 && dn > 0,
        s"nbQualityScore needs both classes in train: pos=$dp neg=$dn")
    }
    val consts = broadcast(totals.crossJoin(priors))
    // probe: corpus token stream joined LEFT to the term table (OOV terms
    // keep null counts → coalesce to 0 = the smoothing floor), constants
    // broadcast alongside; one hash agg back to doc granularity
    val perDoc = corpus
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("term"))
      .join(termTable.hint("shuffle_hash"), Seq("term"), "left")
      .crossJoin(consts)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(log((coalesce(col("__cp"), lit(0L)) + 1).cast(DoubleType) /
              (col("__tp") + col("__v")).cast(DoubleType)) -
            log((coalesce(col("__cn"), lit(0L)) + 1).cast(DoubleType) /
              (col("__tn") + col("__v")).cast(DoubleType))).as("__s"))
    // shuffle_hash: perDoc is corpus-sized (one row per doc with tokens)
    corpus.select(col(idCol)).join(perDoc.hint("shuffle_hash"), Seq(idCol), "left")
      .crossJoin(consts)
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("__s"), lit(0.0)) +
          log(col("__dp").cast(DoubleType) / col("__dn").cast(DoubleType)), 6)
          .as("log_odds"))
  }
}
