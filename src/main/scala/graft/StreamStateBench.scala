package graft

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.sources.StageIO

/** Measured evidence for the round-14 bucketed streaming-state claim
  * (TrackStream.minhashNearDupForeachBatchBucketed): how does ONE
  * batch's minhash screen cost grow with HISTORY size when the state
  * tables are plain parquet (the original sink — probe join reshuffles
  * the history side per batch) vs bucketed tables (join arrives
  * co-located, zero history-side exchange)?
  *
  * Honest framing: bucketing removes the history-side SHUFFLE, not the
  * history-side SCAN — both paths read the full band index every batch
  * (Spark does not bucket-prune joins), so both curves grow with
  * history; the bucketed curve should grow by the scan term only while
  * the plain curve adds shuffle write+read+sort of Θ(history) rows.
  * The numbers land in docs/ as the measured version of the plan
  * assertions in TrackStreamSpec / IncrementalIndexSpec.
  *
  * Usage: StreamStateBench <sfDir> [multipliers…]   (default 1 4 16)
  * Prints one JSON line per (multiplier, state-kind) with the probe
  * wall seconds; state build time is excluded (it is ingestion-side,
  * paid once per batch regardless of kind, and identical for both).
  */
object StreamStateBench {

  private def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  private def makeSession(cpus: String): SparkSession = {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-ssb-wh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", warehouse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val semantic = args.lift(1).contains("sem")
    val rest = if (semantic) args.drop(2) else args.drop(1)
    val mults = if (rest.nonEmpty) rest.map(_.toInt).toSeq else Seq(1, 4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    if (semantic) { runSemantic(sfDir, mults, cpus); return }
    val spark = makeSession(cpus)

    val docs = Tables.documents(spark, sfDir)
    val baseDocs = docs.count()
    val (n, bands, rows) = (3, 64, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssb").toString
    // the probing batch: fixed size regardless of history multiplier —
    // 2k docs, half near-dups of ingested text (suffix tweak), half
    // novel. Parquet-backed, not localCheckpoint: the scrub between
    // timed probes blocking-unpersists EVERY persistent RDD, and a
    // checkpointed batch would lose its blocks after the first probe.
    docs.limit(2000).select(
      (col("doc_id") + lit(900000000L)).as("doc_id"),
      when(col("doc_id") % 2 === 0, concat(col("text"), lit(" tail")))
        .otherwise(concat(lit("novel "), col("text"), lit(" entirely new")))
        .as("text"))
      .write.mode("overwrite").parquet(s"$tmp/batch")
    val batch = spark.read.parquet(s"$tmp/batch")
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    mults.foreach { m =>
      // history = m distinct-text copies of the corpus (suffix variant)
      val history = (0 until m).map(i => docs.select(
        (col("doc_id") + lit(1000000L * (i + 1))).as("doc_id"),
        concat(col("text"), lit(s" variant $i")).as("text")))
        .reduce(_ unionByName _)
        .lineageCut()
      val bandIdx = Dedup.minhashBandIndex(history, "text", "doc_id", n, bands, rows)
        .lineageCut()
      val sets = Dedup.shingleHashSets(history, "text", "doc_id", n)
        .lineageCut()
      // persist BOTH kinds from the same frames
      bandIdx.write.mode("overwrite").parquet(s"$tmp/bands_$m")
      sets.write.mode("overwrite").parquet(s"$tmp/sets_$m")
      // bucket count = the no-exchange join's PARALLELISM (a bucketed
      // scan runs one task per bucket): default to the session's core
      // count — the first sweep ran 8 buckets on 32 cores and the
      // bucketed probe LOST at 16× history purely from task starvation
      val buckets = sys.env.getOrElse("SPARK_GRAFT_SSB_BUCKETS", cpus).toInt
      StageIO.saveBucketed(bandIdx, s"ssb_bands_$m", "band", buckets, "bucket")
      StageIO.saveBucketed(sets, s"ssb_sets_$m", "doc_id", buckets)
      history.unpersist(); scrub()
      def probe(bandsDf: DataFrame, setsDf: DataFrame): Double = {
        val t0 = System.nanoTime()
        val out = Dedup.minhashIncrementalAgainstIndex(batch, bandsDf, setsDf,
          "text", "doc_id", n, bands, rows, 0.5)
        out.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (sys.env.get("SPARK_GRAFT_SSB_EXPLAIN").contains("true"))
          System.err.println(out.queryExecution.executedPlan.toString.take(8000))
        scrub(); s
      }
      // warm both paths once (codegen + footer reads), then time 3 and
      // report the median — the sweep's signal is the growth CURVE
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      probe(spark.read.parquet(s"$tmp/bands_$m"), spark.read.parquet(s"$tmp/sets_$m"))
      val plain = med((1 to 3).map(_ =>
        probe(spark.read.parquet(s"$tmp/bands_$m"), spark.read.parquet(s"$tmp/sets_$m"))))
      probe(spark.table(s"ssb_bands_$m"), spark.table(s"ssb_sets_$m"))
      val bucketed = med((1 to 3).map(_ =>
        probe(spark.table(s"ssb_bands_$m"), spark.table(s"ssb_sets_$m"))))
      println(s"""{"history_mult":$m,"history_docs":${baseDocs * m},""" +
        s""""batch_docs":2000,"plain_probe_s":${fmt(plain)},""" +
        s""""bucketed_probe_s":${fmt(bucketed)}}""")
      spark.sql(s"DROP TABLE IF EXISTS ssb_bands_$m")
      spark.sql(s"DROP TABLE IF EXISTS ssb_sets_$m")
    }
    spark.stop()
  }

  /** SEMANTIC-mode sweep (`StreamStateBench <sfDir> sem [mults…]`) —
    * the round-15 twin of the minhash sweep above, for
    * `TrackStream.semanticNearDupForeachBatchBucketed`'s state: one
    * batch's embedding screen cost vs history size with the cell index
    * as plain parquet (probe join reshuffles the history side per
    * batch) vs a `centroid_id`-bucketed table (arrives co-located).
    * Same honest framing: bucketing removes the history-side SHUFFLE,
    * not the SCAN — both curves grow; the bucketed one by the scan +
    * verify terms only. History copies are sign-flip-decorrelated per
    * multiplier step (pattern keyed by the copy index) so history mass
    * grows without saturating the batch in near-dups; the quantizer is
    * a FIXED 64 cells at every multiplier (the production contract:
    * centroids sized for the horizon, not refit as history grows — so
    * per-cell population, and with it the verify term, grows linearly
    * with history by design).
    */
  private def runSemantic(sfDir: String, mults: Seq[Int], cpus: String): Unit = {
    val spark = makeSession(cpus)
    val nCells = 64
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val baseVecs = base.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssb-sem").toString
    def flipped(src: DataFrame, key: Long, idOffset: Long): DataFrame =
      src.select((col("vec_id") + lit(idOffset)).as("vec_id"),
        transform(col("vec"), (x, j) =>
          when(pmod(xxhash64(lit(key), j), lit(2)) === 0, x).otherwise(-x)).as("vec"))
    // fixed probe batch: 2k vectors, half exact dups of history copy 0
    // (sign pattern 0, fresh ids), half novel (pattern 999 — decorrelated
    // from every copy). Parquet-backed for the same scrub reason as the
    // minhash batch.
    val b = base.limit(2000)
    flipped(b.filter(col("vec_id") % 2 === 0), 0L, 900000000L)
      .unionByName(flipped(b.filter(col("vec_id") % 2 =!= 0), 999L, 900000000L))
      .write.mode("overwrite").parquet(s"$tmp/batch")
    val batch = spark.read.parquet(s"$tmp/batch")
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    mults.foreach { m =>
      val history = (0 until m).map(i =>
        flipped(base, i.toLong, 1000000L * (i + 1)))
        .reduce(_ unionByName _)
        .lineageCut()
      // quantizer fit + assignment are state-BUILD cost (ingestion-side,
      // identical for both kinds) — excluded from the probe timing
      val cents = graft.ops.Similarity.ivfCentroids(
        history, "vec_id", "vec", nCells, iters = 3)
      cents.write.mode("overwrite").parquet(s"$tmp/cents_$m")
      val centsDf = spark.read.parquet(s"$tmp/cents_$m")
      val idx = Dedup.semanticCellIndex(history, "vec", "vec_id", centsDf)
        .lineageCut()
      idx.write.mode("overwrite").parquet(s"$tmp/cells_$m")
      val buckets = sys.env.getOrElse("SPARK_GRAFT_SSB_BUCKETS", cpus).toInt
      StageIO.saveBucketed(idx, s"ssb_cells_$m", "centroid_id", buckets)
      history.unpersist(); idx.unpersist(); scrub()
      def probe(cellsDf: DataFrame): Double = {
        val t0 = System.nanoTime()
        val out = Dedup.semanticIncrementalAgainstCells(batch, cellsDf, centsDf,
          "vec", "vec_id", threshold = 0.9, probeCells = 2)
        out.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (sys.env.get("SPARK_GRAFT_SSB_EXPLAIN").contains("true"))
          System.err.println(out.queryExecution.executedPlan.toString.take(8000))
        scrub(); s
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      probe(spark.read.parquet(s"$tmp/cells_$m"))
      val plain = med((1 to 3).map(_ => probe(spark.read.parquet(s"$tmp/cells_$m"))))
      probe(spark.table(s"ssb_cells_$m"))
      val bucketed = med((1 to 3).map(_ => probe(spark.table(s"ssb_cells_$m"))))
      println(s"""{"mode":"semantic","history_mult":$m,""" +
        s""""history_vecs":${baseVecs * m},"batch_vecs":2000,""" +
        s""""n_cells":$nCells,"plain_probe_s":${fmt(plain)},""" +
        s""""bucketed_probe_s":${fmt(bucketed)}}""")
      spark.sql(s"DROP TABLE IF EXISTS ssb_cells_$m")
    }
    spark.stop()
  }
}
