package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Classifier, Corpus, Dedup, Materialize, Text}

/** The composed training-data curation stage: the per-op building blocks
  * (each individually oracle-gated) chained in the order a corpus
  * actually ships through them —
  *
  *   [domain blocklist] → [NFC canonicalize] → exact dedup →
  *   near-dup keep-one → [benchmark decontaminate] → [substring strip] →
  *   [line-level keep-first dedup] → [perplexity-bucket screen] →
  *   [trained LR quality screen] → quality filter → PII scrub →
  *   [DSIR top-k selection] → content-hash split →
  *   context-window chunking
  *
  * (bracketed stages optional, default off — the e2e gates run the
  * default chain so their oracles stay byte-exact)
  *
  * Ordering contracts this stage pins down (per-op gates can't catch a
  * mis-composition):
  *   - DEDUP BEFORE FILTER: near-dup clustering must see the whole
  *     corpus; filtering first could drop a cluster's minimum id and
  *     change every survivor downstream.
  *   - QUALITY ON THE PRE-SCRUB TEXT: quality measures the document as
  *     found; scrubbing first would let `<EMAIL>` placeholder tokens
  *     nudge documents across the token-band cutoffs.
  *   - SPLIT AND CHUNK ON THE SCRUBBED TEXT: the split key must be the
  *     content fingerprint of what is actually shipped to training —
  *     two documents identical after scrubbing (differing only in PII)
  *     co-split, so no train/test leakage through PII variants; chunks
  *     must never contain raw PII.
  *
  * Scale shape: dedup is the only shuffling step (digest/inverted-index
  * joins, see [[graft.ops.Dedup]]); quality/scrub/split/chunk are pure
  * codegen'd expressions fused into one projection over the survivors,
  * and the final explode is narrow — no shuffle after the dedup joins.
  *
  * Fork materialization: every consumption fork routes through
  * [[graft.ops.Materialize.fork]] (strategy knob
  * `spark.graft.forkMaterialize`). In the default `local` mode the
  * checkpointed blocks are NOT unpersisted here — downstream stages
  * consume the forked frames lazily after this function returns, so a
  * long-lived session invoking curate repeatedly accumulates executor
  * storage blocks until it scrubs them (`sparkContext.getPersistentRDDs`
  * + unpersist, as graft.Bench does between samples) or switches to
  * `table` mode, which keeps nothing in executor memory.
  *
  * One row per (surviving doc, chunk):
  * (idCol, split, chunk_id, n_tokens, chunk_text).
  */
object Curate {

  def apply(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
            shingleN: Int = 3, jaccardThreshold: Double = 0.2,
            minTokens: Long = 30, maxTokens: Long = 200,
            minMeanTokenLen: Double = 2.0, maxMeanTokenLen: Double = 12.0,
            splitBoundaries: Seq[(String, String)] = Seq("train" -> "cd", "valid" -> "e6"),
            defaultSplit: String = "test",
            chunkSize: Int = 32, chunkStride: Int = 24,
            prefixFilter: Boolean = true,
            maxShingleDocFreq: Long = 0L,
            benchmark: Option[DataFrame] = None,
            decontaminateN: Int = 8,
            decontaminateMinShared: Long = 1L,
            nfcNormalize: Boolean = false,
            foldAccents: Boolean = false,
            stripSpanK: Int = 0,
            stripLineDups: Boolean = false,
            urlCol: Option[String] = None,
            blockedDomains: Seq[String] = Nil,
            pplKeepBuckets: Seq[String] = Nil,
            pplLangCol: Option[String] = None,
            lrQualityTarget: Option[DataFrame] = None,
            lrQualityMinScore: Double = 0.5,
            lrQualityKeepK: Int = 0,
            lrQualityIters: Int = 6,
            dsirTarget: Option[DataFrame] = None,
            dsirK: Int = 0,
            nearDupFamily: String = "ngram",
            minhashBands: Int = 64,
            minhashRowsPerBand: Int = 2): DataFrame = {
    require(nearDupFamily == "ngram" || nearDupFamily == "minhash",
      s"nearDupFamily='$nearDupFamily' (ngram | minhash)")
    // maxShingleDocFreq CHANGES WHICH PAIRS EXIST (the lossy boilerplate
    // cutoff) and has no minhash equivalent — silently ignoring it would
    // run a different screen than configured, so the conflict fails fast.
    // prefixFilter is strategy-only (identical pairs either way) and is
    // legitimately moot under minhash.
    require(nearDupFamily == "ngram" || maxShingleDocFreq == 0L,
      s"maxShingleDocFreq=$maxShingleDocFreq is an ngram-family knob; " +
        "the minhash family has no doc-frequency cutoff")
    // Optional domain blocklist before everything — the cheapest screen
    // (one metadata predicate, no text touched) precedes any content
    // stage, and a blocked doc must never influence dedup's keep-one
    // choice (as a cluster's min id it would otherwise drop a legitimate
    // survivor).
    val sourceScreened = urlCol match {
      case Some(u) if blockedDomains.nonEmpty =>
        val sp = docs.sparkSession
        import sp.implicits._
        Corpus.filterByDomainBlocklist(docs, u,
          blockedDomains.toDF("__blocked"), "__blocked")
      case _ => docs
    }
    // Optional Unicode canonicalization FIRST: every downstream content
    // hash (exact-dedup digest, shingle hashes, split fingerprint) keys
    // on bytes, so byte-variant spellings of identical text must collapse
    // before any of them run. `foldAccents` is the stronger fold
    // (NFC∘drop-Mn∘NFD — café and cafe share one dedup bucket) and
    // SUBSUMES nfcNormalize: its output is already NFC-composed, so when
    // both flags are set only the fold runs. Default off: the gates'
    // corpora are ASCII and the stage must stay byte-identical to its
    // oracles.
    val canon =
      if (foldAccents)
        sourceScreened.withColumn(textCol,
          graft.functions.TextExprs.stripAccents(col(textCol)))
      else if (nfcNormalize)
        sourceScreened.withColumn(textCol,
          graft.functions.TextExprs.nfcNormalize(col(textCol)))
      else sourceScreened
    val deduped = Dedup.exactDedup(canon, textCol, idCol)
    // prefixFilter default TRUE here, opposite of the standalone near-dup
    // op: a curated corpus is exactly where hot shingles live (boilerplate
    // headers/footers/disclaimers shared across the crawl). On the e2e
    // gate's corpus — every doc carries the same planted contact tail, so
    // ~8 shingles have doc-frequency = |corpus| — the plain inverted index
    // self-joins those hot keys into |corpus|²-shaped candidate floods
    // (measured ~120 s at sf0.1), while the PPJoin prefix bound keeps hot
    // shingles out of every prefix and stays linear (~10 s, same rows).
    // maxShingleDocFreq (default off — gates stay exact) is the scale
    // hatch for boilerplate-saturated corpora: when a shared tail makes
    // short documents GENUINE near-dups of each other, the true pair
    // list is corpus²-shaped at low thresholds and no candidate
    // strategy stays sub-quadratic; capping shingle doc-frequency
    // restores linearity at the cost of missing pairs connected only
    // through boilerplate (usually exactly the pairs one does NOT want
    // clustered — see ngramJaccardPairsPrefix's cutoff contract).
    // `nearDupFamily = "minhash"` swaps the candidate strategy for the
    // banding family (same exact verify, same keep-one closure — the
    // per-op gates pin value equality at matched thresholds); pick it
    // when the corpus is too large for even the prefix-filtered index
    // and a planMinhashLsh-sized banding recall is acceptable.
    // `minhashBands <= 0` sizes (bands, rowsPerBand) from the ACTUAL
    // deduped corpus via planMinhashLsh — the scale path: FIXED banding
    // at a growing corpus is the quadratic trap (rowsPerBand tuned for
    // gate determinism is too short against a big corpus' background
    // similarity; measured: the 64×2 gate config OOMs the planted
    // corpus at sf100 where the planner's sizing runs it in seconds).
    // Costs one count() of the deduped frame, same contract as
    // minhashLshPairsAuto.
    val survivors =
      if (nearDupFamily == "minhash") {
        val (dedupedIn, b, r) =
          if (minhashBands > 0) (deduped, minhashBands, minhashRowsPerBand)
          else {
            // eager-checkpoint BEFORE the planner's count (the Dedup
            // discipline): `deduped` is a lazy exactDedup subtree, and a
            // bare count() would execute its digest/semi-join work once
            // for the plan sizing and AGAIN when minhashSurvivors runs —
            // at exactly the corpus scale this planner path targets
            val cp = Materialize.fork(deduped)
            val plan = Dedup.planMinhashLsh(cp.count(), jaccardThreshold)
            (cp, plan.bands, plan.rowsPerBand)
          }
        Dedup.minhashSurvivors(dedupedIn, textCol, idCol,
          shingleN, b, r, jaccardThreshold)
      } else Dedup.nearDupSurvivors(deduped, textCol, idCol,
        shingleN, jaccardThreshold, prefixFilter = prefixFilter,
        maxShingleDocFreq = maxShingleDocFreq)
    // Optional benchmark decontamination — AFTER dedup (clustering must
    // see the whole corpus; the keep-one choice is independent of the
    // benchmark) and BEFORE the quality/scrub/split tail (a contaminated
    // doc must never reach a training split). Long shingles
    // (decontaminateN default 8) per decontamination convention.
    val screened = benchmark.fold(survivors) { bench =>
      // fork: the contamination index and the anti-join left side both
      // consume survivors — checkpoint or the dedup upstream runs twice
      // (same discipline as the PPL/DSIR forks below)
      val mat = Materialize.fork(survivors)
      val flagged = Dedup.contaminatedIds(mat, bench, textCol, idCol,
        decontaminateN, decontaminateMinShared)
        .select(col(idCol))
      mat.join(flagged.hint("shuffle_hash"), Seq(idCol), "left_anti")
    }
    // Optional duplicated-substring removal — AFTER document-level dedup
    // (exact dup docs would otherwise strip each other to nothing; see
    // stripDuplicatedSpans' scaladoc) and BEFORE quality: unlike the PII
    // scrub, stripping can remove a large fraction of a document, and the
    // token-band filter must judge the text that actually ships.
    // SEMANTICS NOTE: the stripped text is rebuilt from normalized
    // tokens (lowercased, whitespace-collapsed) for EVERY doc, not just
    // stripped ones. Downstream this is invisible — chunk_text is built
    // from Text.tokens and ships normalized in the default chain too,
    // and the quality band/scrub/split operate identically on normalized
    // text — but a caller tapping intermediate stages should know the
    // original casing is gone once this stage is on.
    // When the line screen runs AFTER the span strip (the CCNet-style
    // span-then-line stack), the strip rebuilds with the ORIGINAL line
    // structure — the default token re-join collapses every doc to one
    // line and would turn the line screen into a no-op. Span-only mode
    // keeps the default byte-exact rebuild its gates pin.
    val stripped =
      if (stripSpanK > 0) {
        val mat = Materialize.fork(screened) // fork: strip + join left side
        mat.drop(textCol).join(
          Dedup.stripDuplicatedSpans(mat, textCol, idCol, stripSpanK,
            preserveNewlines = stripLineDups)
            .select(col(idCol), col("clean_text").as(textCol))
            .hint("shuffle_hash"),
          Seq(idCol))
      } else screened
    // Optional line-level keep-first dedup (CCNet paragraph screen) —
    // same slot-reasoning as the span strip: after document-level dedup
    // (exact-dup docs would strip each other's every line), before
    // quality (the token band must judge the text that ships).
    val lineStripped =
      if (stripLineDups) {
        val mat = Materialize.fork(stripped) // fork: strip + join left side
        mat.drop(textCol).join(
          Dedup.stripDuplicatedLines(mat, textCol, idCol)
            .select(col(idCol), col("clean_text").as(textCol))
            .hint("shuffle_hash"),
          Seq(idCol))
      } else stripped
    // Optional CCNet perplexity-bucket screen — the LM and its
    // per-language tertile cuts are fit on the DEDUPED, DECONTAMINATED
    // survivors (duplicates would weight the unigram model and drag the
    // cuts toward the duplicated text), and the screen precedes the
    // token-band filter so quality judges only documents that will ship.
    val pplScreened = pplLangCol match {
      case Some(lc) if pplKeepBuckets.nonEmpty =>
        // materialize the survivor chain BEFORE the screen: pplBuckets
        // consumes it several times (LM vocab pass, per-doc scores, the
        // lang attach) and the semi-join left side is a fourth consumer
        // — unmaterialized, the exact-dedup + near-dup upstream
        // re-executes per consumer (measured: the screens gate's tail
        // carried whole repeated dedup subtrees; same checkpoint-at-the-
        // fork discipline as Dedup)
        val mat = Materialize.fork(lineStripped)
        val keep = Corpus.pplBuckets(mat, textCol, idCol, lc)
          .filter(col("ppl_bucket").isin(pplKeepBuckets: _*))
          .select(col(idCol))
        mat.join(keep.hint("shuffle_hash"), Seq(idCol), "left_semi")
      case _ => lineStripped
    }
    // Optional TRAINED quality screen (round 17) — the CCNet posture
    // with a fitted model instead of fixed heuristics: positives = the
    // reference corpus (`lrQualityTarget`), negatives = this corpus's
    // own deduped survivors ("reference vs crawl"; class overlap is
    // expected and harmless — the boundary learns "more reference-like
    // than not"), features = the oracled [[Text.qualityStruct]] ratios
    // on both sides, trainer = [[Classifier.lrTrain]]'s exactly-
    // replayable full-batch GD. Same slot as the perplexity screen for
    // the same two reasons: fitting on DEDUPED survivors keeps
    // duplicates from weighting the gradient, and the screen precedes
    // the token band so quality judges only documents that ship.
    // Deterministic end-to-end, so the e2e gate's oracle replays the
    // TRAINING inside the pipeline replay.
    val lrScreened = lrQualityTarget match {
      case Some(target) if lrQualityIters > 0 =>
        // fork: negative examples, the scoring scan and the semi-join
        // left side all consume the survivor chain
        val mat = Materialize.fork(pplScreened)
        val featCols = Seq("__mtl", "__punct", "__upper", "__stop")
        def feats(df: DataFrame): DataFrame =
          df.withColumn("__q", Text.qualityStruct(col(textCol)))
            .withColumn("__mtl", col("__q.mean_token_len"))
            .withColumn("__punct", col("__q.punct_ratio"))
            .withColumn("__upper", col("__q.upper_ratio"))
            .withColumn("__stop", col("__q.stopword_hit_ratio"))
        val train = feats(target.select(col(textCol))).withColumn("__y", lit(1.0))
          .select((featCols.map(col) :+ col("__y")): _*)
          .unionByName(feats(mat.select(col(textCol))).withColumn("__y", lit(0.0))
            .select((featCols.map(col) :+ col("__y")): _*))
        val w = Classifier.lrTrain(train, featCols, "__y", lrQualityIters)
          .last.weights
        val scored = Classifier.lrScore(feats(mat), featCols, w, idCol)
        // two operating modes, DSIR's posture: `lrQualityKeepK > 0`
        // keeps the k MOST reference-like documents (score desc, id
        // tiebreak — a TakeOrdered, the right cut when classes overlap
        // and absolute calibration is meaningless: a reference slice
        // drawn from the corpus itself pushes every score below ½,
        // which is a prior statement, not a quality one); otherwise
        // the absolute `lrQualityMinScore` threshold (the calibrated-
        // classifier mode — a genuinely held-out reference corpus).
        if (lrQualityKeepK > 0) {
          // k rows — the planner's broadcast is right for the semi join
          val keep = scored.orderBy(col("score").desc, col(idCol))
            .limit(lrQualityKeepK).select(col(idCol))
          mat.join(keep, Seq(idCol), "left_semi")
        } else {
          // corpus-sized keep list — pin the shuffle side
          val keep = scored.filter(col("score") >= lrQualityMinScore)
            .select(col(idCol))
          mat.join(keep.hint("shuffle_hash"), Seq(idCol), "left_semi")
        }
      case _ => pplScreened
    }
    val kept = lrScreened
      .withColumn("__q", Text.qualityStruct(col(textCol)))
      .filter(col("__q.n_tokens").between(minTokens, maxTokens) &&
        col("__q.mean_token_len").between(minMeanTokenLen, maxMeanTokenLen))
      .withColumn("__scrubbed", Text.scrubPii(col(textCol)))
      .withColumn("split",
        Text.hashSplit(Text.normalize(col("__scrubbed")), splitBoundaries, defaultSplit))
    // Optional DSIR top-k selection — LAST of the document-level stages:
    // importance resampling picks from what survived every screen (its
    // source model must describe the shippable corpus, not raw crawl),
    // and the k-cut must not be diluted by documents a screen would
    // have dropped anyway. The pick list is k rows — planner's choice
    // (broadcast) is right for the semi join.
    val selected = dsirTarget match {
      case Some(t) if dsirK > 0 =>
        // same fork discipline: DSIR's importance pass and the semi-join
        // left side both consume `kept`, whose quality/scrub projections
        // (regex-heavy) and whole upstream would otherwise run twice
        val matKept = Materialize.fork(kept)
        val picks = Corpus.dsirSelect(matKept, t, textCol, idCol, dsirK)
          .select(col(idCol))
        matKept.join(picks, Seq(idCol), "left_semi")
      case _ => kept
    }
    selected
      .select(col(idCol), col("split"),
        posexplode(Text.tokenChunks(Text.tokens(col("__scrubbed")), chunkSize, chunkStride))
          .as(Seq("__pos", "__c")))
      .select(col(idCol), col("split"),
        (col("__pos") + 1).as("chunk_id"),
        col("__c.n_tokens").as("n_tokens"),
        col("__c.chunk_text").as("chunk_text"))
  }
}
