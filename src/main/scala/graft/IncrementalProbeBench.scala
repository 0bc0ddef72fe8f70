package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch probe cost of the two incremental near-dup screens with
  * PRE-PERSISTED history indexes — the regime both are designed for
  * (the gate queries and their convenience overloads derive the history
  * index in-query, which charges the one-time index build to every
  * batch and inverts the comparison: the banded index pays 128
  * hashes/shingle at BUILD time to buy a cheaper probe).
  *
  * Usage: `IncrementalProbeBench <sfDir> <workDir>` — builds both
  * history indexes once (even doc_ids), then times two probe passes of
  * the odd-id batch against each, plus the on-disk index sizes.
  * Companion of [[CurateProfile]]; results quoted in the
  * `minhashIncrementalAgainstIndex` scaladoc.
  */
object IncrementalProbeBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: IncrementalProbeBench <sfDir> <workDir>")
    val Array(sfDir, work) = args.take(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-ipb-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val existing = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("build shingleIndex (once)") {
      ops.Dedup.shingleIndex(existing, "text", "doc_id", 3)
        .write.mode("overwrite").parquet(s"$work/shidx") }
    t("build minhash band index + hash sets (once)") {
      ops.Dedup.minhashBandIndex(existing, "text", "doc_id", 3, 64, 2)
        .write.mode("overwrite").parquet(s"$work/bands")
      ops.Dedup.shingleHashSets(existing, "text", "doc_id", 3)
        .write.mode("overwrite").parquet(s"$work/sets") }
    // round 14: BUCKETED twins of both indexes (on each probe join's
    // keys, one file per bucket — StageIO.saveBucketed repartitions),
    // so the sweep separates the algorithmic regime (inverted vs
    // banded) from the state-layout regime (reshuffle-per-probe vs
    // co-located) the r13 sweep conflated by persisting plain parquet
    t("build BUCKETED twins of both indexes (once)") {
      sources.StageIO.saveBucketed(
        spark.read.parquet(s"$work/shidx"), "ipb_shidx", "shingle", 32)
      sources.StageIO.saveBucketed(
        spark.read.parquet(s"$work/bands"), "ipb_bands", "band", 32, "bucket")
      sources.StageIO.saveBucketed(
        spark.read.parquet(s"$work/sets"), "ipb_sets", "doc_id", 32) }
    for (i <- 1 to 2) {
      t(s"probe ngram inverted index (batch pass $i)") {
        ops.Dedup.nearDupIncrementalAgainstIndex(batch,
          spark.read.parquet(s"$work/shidx"), "text", "doc_id", 3, 0.5)
          .write.format("noop").mode("overwrite").save() }
      t(s"probe ngram inverted index BUCKETED (batch pass $i)") {
        ops.Dedup.nearDupIncrementalAgainstIndex(batch,
          spark.table("ipb_shidx"), "text", "doc_id", 3, 0.5)
          .write.format("noop").mode("overwrite").save() }
      t(s"probe minhash band index (batch pass $i)") {
        ops.Dedup.minhashIncrementalAgainstIndex(batch,
          spark.read.parquet(s"$work/bands"), spark.read.parquet(s"$work/sets"),
          "text", "doc_id", 3, 64, 2, 0.5)
          .write.format("noop").mode("overwrite").save() }
      t(s"probe minhash band index BUCKETED (batch pass $i)") {
        ops.Dedup.minhashIncrementalAgainstIndex(batch,
          spark.table("ipb_bands"), spark.table("ipb_sets"),
          "text", "doc_id", 3, 64, 2, 0.5)
          .write.format("noop").mode("overwrite").save() }
    }
    Seq("ipb_shidx", "ipb_bands", "ipb_sets")
      .foreach(tbl => spark.sql(s"DROP TABLE IF EXISTS $tbl"))
    println("index bytes: shidx=" + du(s"$work/shidx") +
      " bands=" + du(s"$work/bands") + " sets=" + du(s"$work/sets"))
    spark.stop()
  }

  private def du(p: String): Long = {
    val d = new java.io.File(p)
    if (!d.exists) 0L else d.listFiles.map(f => if (f.isFile) f.length else 0L).sum
  }
}
