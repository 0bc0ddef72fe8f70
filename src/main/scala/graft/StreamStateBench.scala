package graft

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

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val mults = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
        .localCheckpoint(true)
      val bandIdx = Dedup.minhashBandIndex(history, "text", "doc_id", n, bands, rows)
        .localCheckpoint(true)
      val sets = Dedup.shingleHashSets(history, "text", "doc_id", n)
        .localCheckpoint(true)
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
}
