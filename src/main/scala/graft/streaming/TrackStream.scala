package graft.streaming

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming variant of the 10-minute track aggregation
  * (SURVEY.md O-STREAM; batch form at reference R/export.R:165-174).
  *
  * The reference is batch-only (cron every 2 days); the GPS-point stream
  * is the natural streaming candidate: event-time tumbling window +
  * watermark. Policy per SURVEY.md §7: 10-minute tumbling windows,
  * 1-hour watermark (late points beyond it dropped), update output mode.
  *
  * The SAME transform serves batch and streaming — pass a readStream
  * DataFrame and it plans an event-time stateful aggregation; pass a batch
  * frame and it's exactly the export aggregation.
  */
object TrackStream {

  /** points: (Trip, Time, Lat, Lng, ...) → per (Trip, 10-min window) mean
    * position + point count.
    */
  def aggregate(points: DataFrame,
                watermark: String = "1 hour",
                window10: String = "10 minutes"): DataFrame = {
    val withWm =
      if (points.isStreaming) points.withWatermark("Time", watermark) else points
    withWm
      .groupBy(col("Trip"), window(col("Time"), window10).as("w"))
      .agg(
        avg(col("Lat")).as("lat"),
        avg(col("Lng")).as("lon"),
        count(lit(1)).as("n_points"))
      .select(col("Trip"), col("w.start").as("time"), col("lat"), col("lon"), col("n_points"))
  }

  /** Gap-based trip sessionization: consecutive points of a device belong
    * to one session while the inter-point gap stays under `gap` — the
    * op that SEGMENTS a raw point stream into trips (the reference gets
    * trip boundaries from the PDS API; this derives them from points).
    * Same transform batch and streaming (`session_window` is stateful
    * under a watermark; batch twin oracled by q_session_window_gap).
    */
  def sessionize(points: DataFrame,
                 gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame = {
    val withWm =
      if (points.isStreaming) points.withWatermark("Time", watermark) else points
    withWm
      .groupBy(col("Trip"), session_window(col("Time"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_points"),
        avg(col("Lat")).as("lat"),
        avg(col("Lng")).as("lon"))
      .select(col("Trip"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_points"), col("lat"), col("lon"))
  }

  /** Stream-stream time-bounded equi-join — the enrichment shape where
    * BOTH sides arrive continuously (e.g. a landings stream matched to a
    * tracker-event stream per device, or a crawl stream matched to a
    * fetch-log stream per URL): rows join when keys match and the right
    * event time falls within [left − lookback, left + lookahead].
    *
    * The time bound is what makes unbounded-state streaming joins
    * possible at all: with both sides watermarked AND the join condition
    * constraining the two event times, Spark derives a state watermark
    * per side and EVICTS buffered rows that can no longer match — state
    * is (input rate × (watermark + bound)) rather than the whole stream.
    * An unconstrained stream-stream inner join would buffer both streams
    * forever; this operator makes the constraint impossible to forget by
    * taking the bound as parameters and building the condition itself.
    *
    * Same transform batch and streaming (the batch twin is the identical
    * join expression, oracle-able as a plain range join); columns from
    * the right side are prefixed `r_` to keep the output schema
    * collision-free.
    */
  def intervalJoinStreamStream(left: DataFrame, right: DataFrame,
                               key: String, timeCol: String,
                               lookback: String = "10 minutes",
                               lookahead: String = "10 minutes",
                               watermark: String = "1 hour"): DataFrame = {
    val l =
      if (left.isStreaming) left.withWatermark(timeCol, watermark) else left
    val rRenamed = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }
    val r =
      if (rRenamed.isStreaming) rRenamed.withWatermark(s"r_$timeCol", watermark)
      else rRenamed
    l.join(r,
      col(key) === col(s"r_$key") &&
        col(s"r_$timeCol") >= col(timeCol) - expr(s"interval $lookback") &&
        col(s"r_$timeCol") <= col(timeCol) + expr(s"interval $lookahead"))
  }

  /** Streaming exact dedup — the crawl-ingestion screen as a continuous
    * query: keep the first arrival per normalized-content digest, drop
    * every later duplicate. State is the digest set, bounded by the
    * event-time watermark via `dropDuplicatesWithinWatermark`: two
    * arrivals of the same document within the watermark horizon dedup
    * exactly; beyond it the state has been reclaimed (the standard
    * bounded-state trade — a crawl's re-fetches cluster in time, and
    * history-scale dedup belongs to the batch
    * [[graft.ops.Dedup.exactDedupIncremental]] against the ingested
    * corpus).
    *
    * Same transform batch and streaming: the batch path keeps the
    * EARLIEST `timeCol` row per digest (matching the stream's
    * first-arrival semantics), with a content-keyed hash of the full row
    * breaking time ties — plain dropDuplicates would keep a
    * partition-order-dependent survivor, and its id/time columns would
    * then differ run to run, violating the repo's determinism contract.
    *
    * `timeCol` is the event-time column; output carries the input
    * columns plus the digest (so a downstream sink can build the
    * batch-side digest index from the same stream).
    */
  def dedupStream(docs: DataFrame, textCol: String, timeCol: String,
                  watermark: String = "1 hour"): DataFrame = {
    val withDigest = docs.withColumn("__digest",
      md5(graft.ops.Text.normalize(col(textCol))))
    if (docs.isStreaming)
      withDigest
        .withWatermark(timeCol, watermark)
        .dropDuplicatesWithinWatermark("__digest")
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("__digest"))
        .orderBy(col(timeCol).asc,
          xxhash64(struct(docs.columns.map(col): _*)).asc)
      withDigest
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  /** History-scale incremental dedup as a `foreachBatch` sink — the
    * complement of [[dedupStream]]'s watermark-bounded screen: state is
    * UNBOUNDED history, held as the natural pair a production ingester
    * persists anyway — the appended corpus table (`historyDir`, parquet)
    * plus one Bloom filter over its digests (the cross-batch state the
    * bloom was designed to be: built once, `mergeInPlace`-updated with
    * each kept batch, persistable via `BloomFilter.writeTo`). Each
    * micro-batch runs [[graft.ops.Dedup.exactDedupIncrementalBloom]]
    * against them, appends its survivors to both, and hands them to
    * `sink`. A RE-PLAYED batch (crash-retry, at-least-once source)
    * appends and emits ZERO rows — every row bloom-hits and the exact
    * residue check confirms it against the corpus — which is what makes
    * retries idempotent at 100 TB.
    *
    * `expectedItems`/`fpp` size the state filter AND every per-batch
    * merge filter — `mergeInPlace` requires identical geometry, so they
    * are fixed for the query's lifetime (size for the corpus you expect
    * to ingest, not the corpus you have).
    *
    * CRASH-ORDERING INVARIANT: the kept digests are merged into `state`
    * BEFORE the parquet append. The bloom's only safety contract is "no
    * false negatives vs the corpus" — a bloom that is AHEAD of the
    * corpus (merge landed, append didn't) merely turns the replayed
    * rows into suspects that the exact residue check resolves against
    * the real corpus (they're absent → correctly re-emitted and
    * re-appended); a bloom BEHIND the corpus (append landed, merge
    * didn't) makes replayed rows bloom-miss, the all-novel
    * short-circuit skips the history check, and the batch is
    * re-emitted as duplicates.
    *
    * RESTART CONTRACT: `state` is in-memory; on process restart it must
    * be rebuilt from (or at minimum be a superset of) the persisted
    * corpus before the query resumes — [[bloomFromHistory]] does
    * exactly this. Resuming with a fresh empty filter silently breaks
    * the same no-false-negative invariant as the ordering above.
    */
  /** Read a parquet state table, distinguishing ABSENT (first batch /
    * pre-bootstrap — `None`) from FAILED (transient FS error, corrupt
    * footer — the read exception PROPAGATES, failing the micro-batch so
    * the source retries it). A broad catch here would silently
    * substitute an EMPTY history for a read failure, let every
    * historical duplicate in the batch pass as novel, and append the
    * divergence permanently — unrepairable and undetectable.
    */
  private def readState(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(dir)) else None
  }

  def bloomDedupForeachBatch(textCol: String, idCol: String,
                             historyDir: String,
                             state: org.apache.spark.util.sketch.BloomFilter,
                             expectedItems: Long, fpp: Double = 0.01,
                             sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val spark = batch.sparkSession
    val history = readState(spark, historyDir)
      .getOrElse(batch.limit(0)) // first batch: no corpus yet
    // caller-owned broadcast (round 15, advisor item): one per
    // micro-batch is necessary (the filter mutates via mergeInPlace
    // below, so a cached broadcast would go stale and re-emit
    // duplicates) — but it must not OUTLIVE the batch: left to the
    // ContextCleaner, a long-running query pins one ~filter-sized block
    // per batch until GC happens to notice. The eager localCheckpoint
    // truncates the lineage, so nothing references the broadcast after
    // it and the destroy is safe; on a failed batch the destroy still
    // runs and the source retries.
    val bc = spark.sparkContext.broadcast(state)
    val kept =
      try graft.ops.Dedup.exactDedupIncrementalBloomBc(
        batch, history, textCol, idCol, bc).lineageCut()
      finally bc.destroy()
    // fold the kept digests into the state filter FIRST (same (n, fpp) ⇒
    // same geometry, so the merge is a bitset OR): bloom-ahead-of-corpus
    // is safe (false positives resolved by the exact residue check);
    // bloom-behind-corpus would re-emit a replayed batch as novel.
    state.mergeInPlace(graft.ops.Dedup.buildDigestBloom(
      kept, textCol, expectedItems = expectedItems, fpp = fpp))
    kept.write.mode("append").parquet(historyDir)
    sink(kept)
  }

  /** Rebuild [[bloomDedupForeachBatch]]'s state filter from the
    * persisted corpus — the RESTART step: call this before resuming the
    * query so the in-memory bloom is a superset of `historyDir`'s
    * digests (the no-false-negative invariant). Same (expectedItems,
    * fpp) as the running query, so per-batch merges keep identical
    * geometry. An empty/absent corpus yields an empty filter.
    */
  def bloomFromHistory(spark: org.apache.spark.sql.SparkSession,
                       historyDir: String, textCol: String,
                       expectedItems: Long, fpp: Double = 0.01)
      : org.apache.spark.util.sketch.BloomFilter = {
    val history = readState(spark, historyDir).getOrElse(
      return org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp))
    graft.ops.Dedup.buildDigestBloom(
      history, textCol, expectedItems = expectedItems, fpp = fpp)
  }

  /** [[bloomDedupForeachBatch]]'s NEAR-dup sibling: incremental n-gram
    * Jaccard screening as a `foreachBatch` sink. Cross-batch state is
    * the appended corpus table plus the persisted [[graft.ops.Dedup
    * .shingleIndex]] (`indexDir`, plain parquet — one (id, n_shingles,
    * 64-bit shingle hash) row per distinct shingle occurrence). SCALE
    * BOUNDARY: the per-batch probe join RESHUFFLES the history-side
    * index rows it reads — Θ(history shingle occurrences) per batch; at
    * a large history use [[nearDupForeachBatchBucketed]], whose index
    * rides a bucketed table and reaches the join with zero exchange
    * (plan-asserted in TrackStreamSpec). Each micro-batch
    * clusters against itself, probes the index bipartite (the history is
    * never re-tokenized — the 100 TB property), appends its survivors'
    * rows AND shingles, and hands survivors to `sink`. A replayed batch
    * emits zero rows — every doc jaccard-1.0-matches its own ingested
    * copy — so at-least-once retries stay idempotent.
    *
    * RECOVERY CONTRACT: the corpus and index appends are two
    * non-atomic writes, corpus DELIBERATELY first — a crash between
    * them leaves the corpus ahead of the index, which a restart repairs
    * by rebuilding the index from the corpus
    * ([[shingleIndexFromCorpus]]) before resuming; the replayed batch
    * then matches its own ingested copy and emits zero rows. The
    * reverse order would be unrepairable: an index ahead of the corpus
    * makes the replay emit zero rows for documents that were never
    * persisted — silent data loss. So "replayed batch emits zero rows"
    * holds for whole-batch replay after full success, and after
    * crash-recovery once the index is rebuilt.
    */
  def nearDupForeachBatch(textCol: String, idCol: String,
                          corpusDir: String, indexDir: String,
                          n: Int = 3, threshold: Double = 0.2,
                          sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val spark = batch.sparkSession
    val index = readState(spark, indexDir).getOrElse( // first batch
      graft.ops.Dedup.shingleIndex(batch.limit(0), textCol, idCol, n))
    val kept = graft.ops.Dedup.nearDupIncrementalAgainstIndex(
      batch, index, textCol, idCol, n, threshold).lineageCut()
    kept.write.mode("append").parquet(corpusDir)
    graft.ops.Dedup.shingleIndex(kept, textCol, idCol, n)
      .write.mode("append").parquet(indexDir)
    sink(kept)
  }

  /** The SEMANTIC sibling of [[bloomDedupForeachBatch]] /
    * [[nearDupForeachBatch]]: streaming benchmark decontamination as a
    * `foreachBatch` sink. State is the STATIC benchmark embedding set
    * (decontamination screens against a fixed eval suite, not against
    * ingested history — no cross-batch mutation at all), so unlike the
    * other two sinks there is no crash-ordering hazard: each micro-batch
    * runs [[graft.ops.Dedup.contaminatedIdsEmbedding]] against the
    * benchmark, drops every row whose embedding cosine-matches any
    * benchmark item at `threshold` (paraphrased contamination — the
    * n-gram screens can't see it), appends the clean rows to
    * `corpusDir`, and hands them to `sink`. A batch consisting entirely
    * of benchmark paraphrases emits zero rows.
    *
    * Exact mode broadcasts the benchmark into a nested-loop probe (the
    * plan DedupSpec asserts): right for benchmark suites that fit a
    * broadcast, i.e. almost all of them. For an outsized screening set,
    * pass `useLsh = true` to route through
    * [[graft.ops.Dedup.contaminatedIdsEmbeddingAuto]] — bucketed
    * candidates, planner-sized from the benchmark, recall-gated.
    *
    * Replay idempotence differs from the dedup sinks BY DESIGN: the
    * screen is stateless, so a replayed batch re-emits its clean rows
    * (and re-appends them — at-least-once, exactly like any
    * append-mode parquet sink); compose AFTER [[bloomDedupForeachBatch]]
    * (or under `dropDuplicatesWithinWatermark`) when exactly-once
    * survivors are required. Screens compose in any order; dedup-first
    * is cheaper (digest compare ≪ 64-dim cosine per row).
    */
  def semanticScreenForeachBatch(vecCol: String, idCol: String,
                                 benchmark: DataFrame,
                                 threshold: Double,
                                 corpusDir: String,
                                 useLsh: Boolean = false,
                                 sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val flagged =
      if (useLsh)
        graft.ops.Dedup.contaminatedIdsEmbeddingAuto(
          batch, benchmark, vecCol, idCol, threshold)
      else
        graft.ops.Dedup.contaminatedIdsEmbedding(
          batch, benchmark, vecCol, idCol, threshold)
    val kept = batch.join(flagged.select(col(idCol)), Seq(idCol), "left_anti")
      .lineageCut()
    kept.write.mode("append").parquet(corpusDir)
    sink(kept)
  }

  /** Rebuild [[nearDupForeachBatch]]'s shingle index from the persisted
    * corpus — the RESTART step after an unclean shutdown: overwrites
    * `indexDir` with the index of exactly what `corpusDir` holds, so a
    * corpus-ahead-of-index crash window is repaired before the query
    * resumes. No-op (writes an empty index) if the corpus is absent.
    */
  def shingleIndexFromCorpus(spark: org.apache.spark.sql.SparkSession,
                             corpusDir: String, indexDir: String,
                             textCol: String, idCol: String,
                             n: Int = 3): Unit = {
    val corpus = readState(spark, corpusDir).getOrElse(return)
    graft.ops.Dedup.shingleIndex(corpus, textCol, idCol, n)
      .write.mode("overwrite").parquet(indexDir)
  }

  /** [[nearDupForeachBatch]] with the shingle index as a BUCKETED table
    * — the round-15 closure of the remaining plain-parquet streaming
    * screen (the minhash screen got this treatment in round 14): the
    * plain sibling's per-batch probe join re-exchanges the history-side
    * shingle index it reads — Θ(history shingle occurrences) of shuffle
    * per batch — while a table bucketed on `shingle` (the probe join's
    * one key) reaches the join with ZERO exchange and the per-batch
    * shuffle mass stays batch-sized forever (TrackStreamSpec pins the
    * executed plan). Same catalog/file-accumulation price and the same
    * recovery contract as [[minhashNearDupForeachBatchBucketed]]:
    * corpus append FIRST, then the index append — any crash window
    * leaves index ⊆ corpus, repaired by
    * [[shingleIndexFromCorpusBucketed]] (also the periodic compaction)
    * before resume; a replayed batch emits zero rows. Size `buckets`
    * to the probe's core budget (StageIO.saveBucketed's sizing rule).
    */
  def nearDupForeachBatchBucketed(textCol: String, idCol: String,
                                  corpusDir: String, indexTable: String,
                                  buckets: Int = 8,
                                  n: Int = 3, threshold: Double = 0.2,
                                  sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val spark = batch.sparkSession
    val index =
      if (spark.catalog.tableExists(indexTable)) spark.table(indexTable)
      else graft.ops.Dedup.shingleIndex(batch.limit(0), textCol, idCol, n)
    val kept = graft.ops.Dedup.nearDupIncrementalAgainstIndex(
      batch, index, textCol, idCol, n, threshold).lineageCut()
    kept.write.mode("append").parquet(corpusDir)
    // append-bucketed with the identical spec, repartitioned to one
    // file per non-empty bucket per batch — same mechanics and
    // rationale as the minhash sibling's index appends
    import org.apache.spark.sql.functions.col
    graft.ops.Dedup.shingleIndex(kept, textCol, idCol, n)
      .repartition(buckets, col("shingle"))
      .write.mode("append")
      .bucketBy(buckets, "shingle").sortBy("shingle")
      .saveAsTable(indexTable)
    sink(kept)
  }

  /** Rebuild [[nearDupForeachBatchBucketed]]'s index table from the
    * persisted corpus — crash recovery AND the periodic compaction (an
    * overwrite collapses one-file-per-bucket-per-batch accumulation
    * back to `buckets` files). No-op if the corpus is absent.
    */
  def shingleIndexFromCorpusBucketed(spark: org.apache.spark.sql.SparkSession,
                                     corpusDir: String, indexTable: String,
                                     textCol: String, idCol: String,
                                     buckets: Int = 8, n: Int = 3): Unit = {
    val corpus = readState(spark, corpusDir).getOrElse(return)
    graft.sources.StageIO.saveBucketed(
      graft.ops.Dedup.shingleIndex(corpus, textCol, idCol, n),
      indexTable, "shingle", buckets)
  }

  /** [[nearDupForeachBatch]]'s MINHASH-BANDED sibling: the
    * [[graft.ops.Dedup.minhashIncrementalAgainstIndex]] screen as a
    * `foreachBatch` sink. Cross-batch state is the appended corpus plus
    * TWO persisted tables — the band index (`bandDir`, bucket by
    * (band, bucket) at ingestion scale) and the per-doc hashed shingle
    * sets (`setsDir`, bucket by idCol) — each growing by appending the
    * kept batch's own rows, so the history is never re-tokenized OR
    * re-signed. When to prefer this over the n-gram sink is measured
    * and documented on the batch operator (long-doc corpora + large
    * history); the streaming contract is identical.
    *
    * SCALE BOUNDARY (honest): these state tables are PLAIN PARQUET
    * appends — simple, crash-rebuildable (below), but the per-batch
    * probe join reshuffles the history-side index rows it reads
    * (IncrementalIndexSpec's negative control measures exactly this
    * shape). At a truly large history, run the ingestion as periodic
    * BATCHES of `minhashIncrementalAgainstIndex` against BUCKETED
    * stage tables (`StageIO.saveBucketed(idx, tbl, "band", n,
    * "bucket")` — bucket-local, zero history reshuffle, the spec's
    * positive case); the streaming sink's value is micro-batch
    * latency, and its recovery contract relies on cheap
    * whole-directory rebuilds that a metastore-backed bucketed table
    * would complicate. Pick by history size.
    *
    * RECOVERY CONTRACT: three non-atomic appends, corpus DELIBERATELY
    * first (same reasoning as [[nearDupForeachBatch]] — any
    * index-behind-corpus window is repaired by rebuilding both index
    * tables from the corpus via [[minhashIndexFromCorpus]] before the
    * query resumes; an index AHEAD of the corpus would be silent data
    * loss). A replayed batch after full success emits zero rows: every
    * doc collides with its own ingested copy in all bands and verifies
    * at jaccard 1.0.
    */
  def minhashNearDupForeachBatch(textCol: String, idCol: String,
                                 corpusDir: String, bandDir: String,
                                 setsDir: String,
                                 n: Int = 3, bands: Int = 64,
                                 rowsPerBand: Int = 2,
                                 threshold: Double = 0.5,
                                 sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val spark = batch.sparkSession
    val bandIdx = readState(spark, bandDir).getOrElse( // first batch
      graft.ops.Dedup.minhashBandIndex(batch.limit(0), textCol, idCol,
        n, bands, rowsPerBand))
    val hashSets = readState(spark, setsDir).getOrElse(
      graft.ops.Dedup.shingleHashSets(batch.limit(0), textCol, idCol, n))
    val kept = graft.ops.Dedup.minhashIncrementalAgainstIndex(
      batch, bandIdx, hashSets, textCol, idCol, n, bands, rowsPerBand,
      threshold).lineageCut()
    kept.write.mode("append").parquet(corpusDir)
    // one shingling pass feeds both index appends (the signature is the
    // dominant batch-side cost — don't pay it per state table)
    val keptShingled = graft.ops.Dedup.wordShingled(kept, textCol, idCol, n)
      .lineageCut()
    graft.ops.Dedup.shingleHashSetsFromShingled(keptShingled, idCol)
      .write.mode("append").parquet(setsDir)
    graft.ops.Dedup.minhashBandIndexFromShingled(keptShingled, idCol,
      bands, rowsPerBand)
      .write.mode("append").parquet(bandDir)
    sink(kept)
  }

  /** Rebuild [[minhashNearDupForeachBatch]]'s BOTH state tables from the
    * persisted corpus — the restart step after an unclean shutdown,
    * mirroring [[shingleIndexFromCorpus]]. No-op if the corpus is
    * absent.
    */
  def minhashIndexFromCorpus(spark: org.apache.spark.sql.SparkSession,
                             corpusDir: String, bandDir: String,
                             setsDir: String,
                             textCol: String, idCol: String,
                             n: Int = 3, bands: Int = 64,
                             rowsPerBand: Int = 2): Unit = {
    val corpus = readState(spark, corpusDir).getOrElse(return)
    graft.ops.Dedup.minhashBandIndex(corpus, textCol, idCol, n, bands, rowsPerBand)
      .write.mode("overwrite").parquet(bandDir)
    graft.ops.Dedup.shingleHashSets(corpus, textCol, idCol, n)
      .write.mode("overwrite").parquet(setsDir)
  }

  /** [[minhashNearDupForeachBatch]] with BUCKETED state tables — the
    * round-14 closure of the scale boundary its sibling's scaladoc
    * documents: plain-parquet state makes every batch's probe join
    * reshuffle the history-side index rows it reads, so the per-batch
    * cost grows with the HISTORY; with the band index bucketed on
    * (band, bucket) and the hash sets bucketed on idCol — the exact
    * join keys, all of them, per the requireAllClusterKeysForCoPartition
    * contract StageIO.saveBucketed documents — the history scans arrive
    * at their joins with ZERO exchange and the per-batch shuffle is
    * batch-sized forever (TrackStreamSpec pins the executed plan,
    * mirroring IncrementalIndexSpec's batch-side assertion).
    *
    * The price, and why the plain sibling still exists: bucketed tables
    * live in the CATALOG (bucket metadata is metastore state), so state
    * is named by TABLE, not directory, and append-bucketed writes add
    * one file per bucket per batch — compact periodically
    * ([[graft.sources.StageIO.compact]] does not preserve bucketing;
    * rebuild via [[minhashIndexFromCorpusBucketed]] instead, which is
    * also the crash-recovery step). Same recovery contract as the
    * sibling: corpus append FIRST, then both index appends — any crash
    * window leaves index ⊆ corpus, repaired by the rebuild before
    * resume; a replayed batch emits zero rows.
    *
    * SIZING `buckets` (measured, SCALING.md §5b): a bucketed scan runs
    * one task per bucket, so the probe join's parallelism IS the bucket
    * count — size it to the core budget the probe should use (the
    * default 8 suits small sessions; a 32-core ingestion executor wants
    * 32). Each append writes one file per non-empty bucket per batch,
    * so more buckets also means faster file accumulation between
    * rebuild-compactions.
    */
  def minhashNearDupForeachBatchBucketed(textCol: String, idCol: String,
                                         corpusDir: String,
                                         bandTable: String,
                                         setsTable: String,
                                         buckets: Int = 8,
                                         n: Int = 3, bands: Int = 64,
                                         rowsPerBand: Int = 2,
                                         threshold: Double = 0.5,
                                         sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val spark = batch.sparkSession
    def tableOr(table: String, empty: => DataFrame): DataFrame =
      if (spark.catalog.tableExists(table)) spark.table(table) else empty
    val bandIdx = tableOr(bandTable,
      graft.ops.Dedup.minhashBandIndex(batch.limit(0), textCol, idCol,
        n, bands, rowsPerBand))
    val hashSets = tableOr(setsTable,
      graft.ops.Dedup.shingleHashSets(batch.limit(0), textCol, idCol, n))
    val kept = graft.ops.Dedup.minhashIncrementalAgainstIndex(
      batch, bandIdx, hashSets, textCol, idCol, n, bands, rowsPerBand,
      threshold).lineageCut()
    kept.write.mode("append").parquet(corpusDir)
    val keptShingled = graft.ops.Dedup.wordShingled(kept, textCol, idCol, n)
      .lineageCut()
    // append-bucketed: Spark appends to a bucketed table only with an
    // IDENTICAL bucket spec, so the layout invariant the probe relies on
    // cannot drift batch-to-batch. repartition on the bucket key first
    // (same rationale as StageIO.saveBucketed): a bucketed writer emits
    // one file per (task × bucket), so an unrepartitioned append adds up
    // to tasks×buckets files per batch — with it, exactly one file per
    // non-empty bucket per batch, which is the append floor
    import org.apache.spark.sql.functions.col
    graft.ops.Dedup.shingleHashSetsFromShingled(keptShingled, idCol)
      .repartition(buckets, col(idCol))
      .write.mode("append")
      .bucketBy(buckets, idCol).sortBy(idCol)
      .saveAsTable(setsTable)
    graft.ops.Dedup.minhashBandIndexFromShingled(keptShingled, idCol,
      bands, rowsPerBand)
      .repartition(buckets, col("band"), col("bucket"))
      .write.mode("append")
      .bucketBy(buckets, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable(bandTable)
    sink(kept)
  }

  /** Rebuild [[minhashNearDupForeachBatchBucketed]]'s state tables from
    * the persisted corpus: the crash-recovery step AND the periodic
    * compaction (an overwrite collapses the one-file-per-bucket-per-batch
    * accumulation back to `buckets` files). No-op if the corpus is
    * absent.
    */
  def minhashIndexFromCorpusBucketed(spark: org.apache.spark.sql.SparkSession,
                                     corpusDir: String, bandTable: String,
                                     setsTable: String,
                                     textCol: String, idCol: String,
                                     buckets: Int = 8,
                                     n: Int = 3, bands: Int = 64,
                                     rowsPerBand: Int = 2): Unit = {
    val corpus = readState(spark, corpusDir).getOrElse(return)
    graft.sources.StageIO.saveBucketed(
      graft.ops.Dedup.minhashBandIndex(corpus, textCol, idCol, n, bands, rowsPerBand),
      bandTable, "band", buckets, "bucket")
    graft.sources.StageIO.saveBucketed(
      graft.ops.Dedup.shingleHashSets(corpus, textCol, idCol, n),
      setsTable, idCol, buckets)
  }

  /** The SEMANTIC member of the history-probing screen family —
    * incremental embedding-cosine near-dup as a `foreachBatch` sink,
    * completing the set (exact digest → bloom; n-gram Jaccard →
    * shingle index; minhash banding → band index; embedding cosine →
    * THIS). Unlike [[semanticScreenForeachBatch]], whose state is a
    * static benchmark set, this screens each batch against the
    * ACCUMULATED INGESTED HISTORY — the paraphrase-dedup analogue of
    * [[minhashNearDupForeachBatchBucketed]], and like it built
    * bucketed-state-first: cross-batch state is
    *
    *   - `centroidsDir` (plain parquet, K rows): the coarse quantizer,
    *     fit ONCE on the first non-empty batch
    *     ([[graft.ops.Similarity.ivfCentroids]] — deterministic, so a
    *     replayed bootstrap batch refits the identical centroids) and
    *     FIXED for the query's lifetime: cell ids are meaningless
    *     across fits, so re-fitting per batch would orphan the index.
    *   - `cellsTable` ([[graft.ops.Dedup.semanticCellIndex]] rows,
    *     bucketed on `centroid_id`): the history's cell-resident
    *     vectors. The per-batch probe joins it on `centroid_id` alone,
    *     so the history side arrives with ZERO exchange
    *     (TrackStreamSpec pins the executed plan) and per-batch cost is
    *     batch-sized no matter how large the history grows — the same
    *     scale contract as the minhash screen's band index.
    *
    * Each micro-batch runs [[graft.ops.Dedup
    * .semanticIncrementalAgainstCells]] (within-batch keep-one, then
    * the history-cell probe at exact cosine ≥ `threshold`), appends its
    * survivors to the corpus AND their cell rows to the index, and
    * hands survivors to `sink`. Replay idempotence holds for every
    * nonzero vector (the replayed copy matches its own ingested copy at
    * cosine ≈ 1); zero-norm vectors are unscreenable and re-emit —
    * compose after [[bloomDedupForeachBatch]] when byte-identical
    * replays must die exactly.
    *
    * RECOVERY CONTRACT (same shape as the minhash sibling): corpus
    * append FIRST, then the index append — a crash between them leaves
    * index ⊆ corpus, repaired by [[semanticIndexFromCorpusBucketed]]
    * before resume. Candidate recall is cell co-residence (the SemDeDup
    * trade): size `nCells` for the expected corpus
    * ([[graft.ops.Dedup.planSemdedupCells]] at the ingest horizon, not
    * the bootstrap batch) and widen `probeCells`/`indexAssign` for
    * recall; the verify is exact, so precision is never at stake.
    * `buckets` sizing follows StageIO.saveBucketed's rule: the probe
    * join runs one task per bucket.
    */
  def semanticNearDupForeachBatchBucketed(vecCol: String, idCol: String,
                                          corpusDir: String,
                                          centroidsDir: String,
                                          cellsTable: String,
                                          buckets: Int = 8,
                                          nCells: Int = 16,
                                          probeCells: Int = 2,
                                          indexAssign: Int = 1,
                                          iters: Int = 3,
                                          threshold: Double = 0.9,
                                          sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val spark = batch.sparkSession
    // a persisted EMPTY quantizer is treated as absent: zero centroids
    // make semanticIncrementalAgainstCells pass everything through
    // (eff == 0), so honoring one would make the screen a permanent
    // silent no-op — the exact state a pre-guard crash window could
    // have left behind (see the bootstrap guard below)
    val persisted = readState(spark, centroidsDir).filter(_.head(1).nonEmpty)
    if (persisted.isEmpty && batch.isEmpty) {
      // bootstrap guard (round 16, ADVICE): streaming retries and idle
      // triggers legitimately deliver EMPTY batches, and fitting the
      // quantizer on one persists zero centroids — every later batch
      // then reads the empty quantizer and the screen silently screens
      // nothing, forever (the rebuild reuses surviving centroids, so
      // even recovery would not repair it). An empty batch before the
      // first fit keeps nothing and teaches nothing: emit its (empty)
      // novel set and defer the fit to the first non-empty batch.
      sink(batch)
    } else {
      val cents = persisted.getOrElse {
        // bootstrap: fit on the first NON-EMPTY batch and persist BEFORE
        // any index write — centroids-without-index is recoverable
        // (rebuild assigns against them); index-without-centroids would
        // be orphaned state
        val fit = graft.ops.Similarity.ivfCentroids(
          batch, idCol, vecCol, nCells, iters)
        fit.write.mode("overwrite").parquet(centroidsDir)
        spark.read.parquet(centroidsDir)
      }
      val cellIdx =
        if (spark.catalog.tableExists(cellsTable)) spark.table(cellsTable)
        else graft.ops.Dedup.semanticCellIndex(
          batch.limit(0), vecCol, idCol, cents, indexAssign)
      val kept = graft.ops.Dedup.semanticIncrementalAgainstCells(
        batch, cellIdx, cents, vecCol, idCol, threshold, probeCells)
        .lineageCut()
      kept.write.mode("append").parquet(corpusDir)
      import org.apache.spark.sql.functions.col
      // append-bucketed with the identical spec, one file per non-empty
      // bucket per batch (same writer discipline as the minhash screen)
      graft.ops.Dedup.semanticCellIndex(kept, vecCol, idCol, cents, indexAssign)
        .repartition(buckets, col("centroid_id"))
        .write.mode("append")
        .bucketBy(buckets, "centroid_id").sortBy("centroid_id")
        .saveAsTable(cellsTable)
      sink(kept)
    }
  }

  /** Rebuild [[semanticNearDupForeachBatchBucketed]]'s cell index from
    * the persisted corpus — the crash-recovery step AND the periodic
    * compaction (the overwrite collapses one-file-per-bucket-per-batch
    * accumulation back to `buckets` files). Reuses the persisted
    * centroids when they survived (cell ids stay stable across the
    * rebuild); a lost quantizer is refit deterministically from the
    * corpus and re-persisted — a NEW cell space, consistent because
    * index and every future probe derive from it together. No-op if the
    * corpus is absent.
    */
  def semanticIndexFromCorpusBucketed(spark: org.apache.spark.sql.SparkSession,
                                      corpusDir: String, centroidsDir: String,
                                      cellsTable: String,
                                      vecCol: String, idCol: String,
                                      buckets: Int = 8, nCells: Int = 16,
                                      indexAssign: Int = 1,
                                      iters: Int = 3): Unit = {
    val corpus = readState(spark, corpusDir).getOrElse(return)
    // an EMPTY persisted quantizer is refit like an absent one (the
    // other half of the sink's bootstrap guard): zero centroids can
    // only be damage, never a fit, and rebuilding the index against
    // them would re-commit the no-op state instead of repairing it
    val cents = readState(spark, centroidsDir).filter(_.head(1).nonEmpty)
      .getOrElse {
        val fit = graft.ops.Similarity.ivfCentroids(
          corpus, idCol, vecCol, nCells, iters)
        fit.write.mode("overwrite").parquet(centroidsDir)
        spark.read.parquet(centroidsDir)
      }
    graft.sources.StageIO.saveBucketed(
      graft.ops.Dedup.semanticCellIndex(corpus, vecCol, idCol, cents, indexAssign),
      cellsTable, "centroid_id", buckets)
  }

  /** Read-side half of the crash-safe state-dir protocol shared by the
    * sketch sinks: repair whichever single rename a crashed
    * [[commitState]] left unfinished — live dir present → drop any
    * leftover `.old` (the commit published, cleanup didn't run); live
    * dir absent but `.old` present → roll the previous state back into
    * place (the commit renamed the live dir aside and died before
    * publishing; the half-written `.tmp` is overwritten by the next
    * commit). Returns whether a committed state exists. Read failures on
    * an EXISTING dir are NOT swallowed: a corrupt or unreachable state
    * must surface, not silently restart the sketch from zero.
    */
  private def recoverState(fs: org.apache.hadoop.fs.FileSystem,
                           stateDir: String): Boolean = {
    val dst = new org.apache.hadoop.fs.Path(stateDir)
    val old = new org.apache.hadoop.fs.Path(stateDir + ".old")
    if (fs.exists(dst)) {
      if (fs.exists(old)) fs.delete(old, true)
      true
    } else if (fs.exists(old)) {
      require(fs.rename(old, dst), s"state rollback $old -> $dst failed")
      true
    } else false
  }

  /** Write-side half: publish `stateDir + ".tmp"` (already fully
    * written) as the live state via two renames — live → `.old`,
    * `.tmp` → live — then drop `.old`. Renames are atomic per HDFS/posix
    * semantics, so EVERY crash window leaves a state [[recoverState]]
    * restores: before the first rename the live dir is untouched;
    * between them `.old` holds the previous state; after the second the
    * new state is live (a stale `.old` is swept on the next recover).
    * The naive delete-then-rename this replaces had a window that
    * destroyed BOTH copies.
    */
  private def commitState(fs: org.apache.hadoop.fs.FileSystem,
                          stateDir: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(stateDir)
    val tmp = new org.apache.hadoop.fs.Path(stateDir + ".tmp")
    val old = new org.apache.hadoop.fs.Path(stateDir + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dst)) require(fs.rename(dst, old), s"state swap $dst -> $old failed")
    require(fs.rename(tmp, dst), s"state swap $tmp -> $dst failed")
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Streaming heavy-hitter counting: the count-min counter frame
    * ([[graft.ops.Corpus.cmsCounters]]) as `foreachBatch` state. Unlike
    * the HLL sink, counter SUM-merge is NOT idempotent — a replayed
    * batch would double-count — so this sink demonstrates the OTHER
    * streaming consistency pattern: a transactional batch-id watermark.
    * The applied batch id is committed ATOMICALLY with the state (an
    * underscore-prefixed `_batchid` marker written inside the tmp dir
    * BEFORE the publish — parquet readers ignore `_`-files, so marker
    * and counters always travel together), and the publish itself is
    * the rename-aside protocol of [[commitState]]/[[recoverState]], so
    * every crash window leaves either the old state+old marker or the
    * new state+new marker — never a torn pair, never zero copies. A
    * replayed batch id ≤ the marker is skipped (its counts are already
    * in the state) and the sink just re-emits the current counters.
    */
  def cmsCountersForeachBatch(keyCol: String, stateDir: String,
                              sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions.sum
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasState = recoverState(fs, stateDir)
    val marker = new org.apache.hadoop.fs.Path(stateDir + "/_batchid")
    val applied: Long =
      if (!hasState || !fs.exists(marker)) -1L
      else {
        val in = fs.open(marker)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](64)
          var n = in.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        } finally in.close()
      }
    if (batchId <= applied) {
      sink(spark.read.parquet(stateDir)) // replay: already applied
    } else {
      val batchCounters = graft.ops.Corpus.cmsCounters(batch, keyCol)
      // no catch: state exists, so a read failure is corruption or an FS
      // outage — advancing the watermark past silently-dropped history
      // would make the loss permanent and undetectable
      val prev = if (hasState) Some(spark.read.parquet(stateDir)) else None
      val merged = prev.fold(batchCounters)(p =>
        p.union(batchCounters).groupBy("__j", "__b").agg(sum("c").as("c")))
        .lineageCut()
      val tmp = new org.apache.hadoop.fs.Path(stateDir + ".tmp")
      merged.write.mode("overwrite").parquet(tmp.toString)
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_batchid"), true)
      try out.write(s"$batchId\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      commitState(fs, stateDir)
      sink(spark.read.parquet(stateDir))
    }
  }

  /** Streaming distinct-count: per-group HyperLogLog registers
    * ([[graft.ops.Corpus.hllRegisters]]) as `foreachBatch` state. Each
    * micro-batch's registers max-merge into the persisted frame
    * (`stateDir`, ≤ groups × m tiny rows — the state NEVER grows with
    * key cardinality, which is the whole point at crawl scale), and the
    * sink receives the updated per-group estimates.
    *
    * Unlike the bloom sink there is NO crash-ordering invariant to keep:
    * register max-merge is IDEMPOTENT, so a replayed batch (at-least-once
    * source, crash retry) merges to exactly the same frame and the
    * estimates never double-count — the replay-safety the count-style
    * alternative (`sum` state) structurally cannot have. The state
    * publish is the rename-aside protocol of [[commitState]]/
    * [[recoverState]], so every crash window leaves a readable frame;
    * on restart the state on disk IS the sketch (no rebuild step
    * needed — contrast [[bloomFromHistory]]).
    */
  def hllDistinctForeachBatch(groupCol: String, keyCol: String,
                              stateDir: String,
                              sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions.max
    val hadoop = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchRegs = graft.ops.Corpus.hllRegisters(batch, groupCol, keyCol)
    // no catch: recoverState distinguishes "first batch" from "state
    // unreadable" — the latter must surface, not restart the sketch
    val prev =
      if (recoverState(hadoop, stateDir)) Some(spark.read.parquet(stateDir)) else None
    val merged = prev.fold(batchRegs)(_.union(batchRegs))
      .groupBy("__g", "__reg").agg(max("__mr").as("__mr"))
      .lineageCut() // materialize BEFORE overwriting what it read
    val tmp = new org.apache.hadoop.fs.Path(stateDir + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    commitState(hadoop, stateDir)
    sink(graft.ops.Corpus.hllEstimate(merged, groupCol))
  }

  /** Streaming KMV sink: per-group k-minimum-values sketches as
    * foreachBatch state — the composable distinct/overlap sketch
    * maintained continuously (downstream, [[graft.ops.Corpus
    * .kmvOverlapReport]]-style estimates come straight off the state
    * table). State is ≤ groups × k longs forever; the cross-batch merge
    * (union hashes, keep the k smallest per group) is IDEMPOTENT like
    * the HLL sink's max — an at-least-once replay re-contributes hashes
    * the sketch already holds and nothing moves, so no batch-id
    * watermark is needed (contrast [[cmsCountersForeachBatch]], whose
    * sum-merge is not idempotent and carries one). Same
    * write-tmp-then-swap state discipline.
    */
  def kmvSketchForeachBatch(groupCol: String, keyCol: String, k: Int,
                            stateDir: String,
                            sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions.{col, explode, row_number}
    val hadoop = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // (group, hash) rows: batch sketch exploded so it unions with state
    val batchHashes = graft.ops.Corpus.kmvSketch(batch, groupCol, keyCol, k)
      .select(col(groupCol), explode(col("kmv")).as("__kh"))
    val prev =
      if (recoverState(hadoop, stateDir)) Some(spark.read.parquet(stateDir)) else None
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__kh"))
    val merged = prev.fold(batchHashes)(_.union(batchHashes))
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(groupCol), col("__kh"))
      .lineageCut() // materialize BEFORE overwriting what it read
    val tmp = new org.apache.hadoop.fs.Path(stateDir + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    commitState(hadoop, stateDir)
    sink(merged)
  }

  /** Streaming quantile-sketch sink: per-group log-bucket counter
    * frames ([[graft.ops.Corpus.quantileSketch]]) as foreachBatch state
    * — percentiles over an unbounded stream, the one summary the
    * HLL/CMS/KMV sinks couldn't maintain. State is bucket-bounded
    * forever (≲ 7.5k rows per group at subBits=7, independent of how
    * much data has streamed); the cross-batch merge is a SUM by
    * (group, bucket), which — like the CMS sink and unlike the
    * idempotent HLL max / KMV union — would double-count a replayed
    * batch, so it carries the same `_batchid` watermark inside the
    * state dir: marker and counters commit atomically via the
    * tmp-write + rename-aside swap, and a batch id ≤ the marker just
    * re-emits current state. Estimates come straight off the state
    * table via [[graft.ops.Corpus.quantileSketchEstimate]].
    */
  def quantileSketchForeachBatch(groupCol: String, valueCol: String,
                                 subBits: Int, stateDir: String,
                                 sink: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions.sum
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasState = recoverState(fs, stateDir)
    val marker = new org.apache.hadoop.fs.Path(stateDir + "/_batchid")
    val applied: Long =
      if (!hasState || !fs.exists(marker)) -1L
      else {
        val in = fs.open(marker)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](64)
          var n = in.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        } finally in.close()
      }
    if (batchId <= applied) {
      sink(spark.read.parquet(stateDir)) // replay: already applied
    } else {
      val batchCounters =
        graft.ops.Corpus.quantileSketch(batch, groupCol, valueCol, subBits)
      // no catch: state exists, so a read failure is corruption or an FS
      // outage — advancing the watermark past silently-dropped history
      // would make the loss permanent and undetectable
      val prev = if (hasState) Some(spark.read.parquet(stateDir)) else None
      val merged = prev.fold(batchCounters)(p =>
        p.union(batchCounters).groupBy(groupCol, "bucket").agg(sum("c").as("c")))
        .lineageCut()
      val tmp = new org.apache.hadoop.fs.Path(stateDir + ".tmp")
      merged.write.mode("overwrite").parquet(tmp.toString)
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_batchid"), true)
      try out.write(s"$batchId\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      commitState(fs, stateDir)
      sink(spark.read.parquet(stateDir))
    }
  }
}
