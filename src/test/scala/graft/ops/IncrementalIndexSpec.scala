package graft.ops

import graft.PlanTestUtil.{historySideShuffleFree, scansOf}
import graft.SparkTestBase
import graft.sources.StageIO

/** Pins the 100-TB contract of the incremental MinHash screen: the
  * PERSISTED history index is probed per batch WITHOUT reshuffling the
  * history side. `minhashIncrementalAgainstIndex`'s scaladoc claims the
  * band index "arrives shuffle-free when the persisted index is
  * bucketed on the join key" — this spec persists both history frames
  * as actual bucketed tables and asserts the FINAL adaptive plan: no
  * shuffle exchange anywhere above either history scan (the batch side
  * may shuffle — it is the small per-batch object).
  *
  * Two hard-won details are themselves under test:
  *   - bucketing must cover ALL join key columns: since Spark 3.3
  *     co-partitioning rejects subset partitionings by default
  *     (`spark.sql.requireAllClusterKeysForCoPartition`), a band index
  *     bucketed on `bucket` alone gets re-exchanged on (band, bucket) —
  *     the first draft of this spec measured exactly that;
  *   - the assertion must walk the FINAL plan through AQE query-stage
  *     boundaries (`QueryStageExec.children` is Nil, so a naive child
  *     walk — or walking the pre-AQE `inputPlan` — can vacuously pass).
  */
class IncrementalIndexSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(ids: Range, text: Long => String) =
    ids.map(i => (i.toLong, text(i.toLong))).toDF("doc_id", "text")

  // plan walkers live in graft.PlanTestUtil since round 14 (shared with
  // TrackStreamSpec's bucketed streaming-state assertion)

  private def history = docs(0 until 64,
    i => s"alpha beta gamma delta epsilon zeta doc $i unique tail ${i * 7}")
  private def batch = docs(100 until 116,
    i => s"alpha beta gamma delta epsilon zeta doc ${i - 100} unique tail ${(i - 100) * 7}")

  private def probe(bands: org.apache.spark.sql.DataFrame,
                    sets: org.apache.spark.sql.DataFrame) =
    Dedup.minhashIncrementalAgainstIndex(batch, bands, sets,
      "text", "doc_id", 3, 16, 2, 0.5)

  test("bucketed band index + hash sets are probed with zero history-side shuffle") {
    try {
      StageIO.saveBucketed(
        Dedup.minhashBandIndex(history, "text", "doc_id", 3, 16, 2),
        "graft_band_idx", "band", 8, "bucket")
      StageIO.saveBucketed(
        Dedup.shingleHashSets(history, "text", "doc_id", 3),
        "graft_hash_sets", "doc_id", 8)
      val out = probe(spark.table("graft_band_idx"), spark.table("graft_hash_sets"))
      // force execution so AQE finalizes, then read the FINAL plan
      val rows = out.collect()
      val plan = out.queryExecution.executedPlan
      val bandCols = Set("band", "bucket")
      val setCols = Set("shingle_hashes")
      // the walker is not vacuous: both bucketed scans are visible
      assert(scansOf(plan, bandCols).nonEmpty, s"band scan not found:\n$plan")
      assert(scansOf(plan, setCols).nonEmpty, s"sets scan not found:\n$plan")
      assert(historySideShuffleFree(plan, bandCols),
        s"band index reshuffled before its join:\n$plan")
      assert(historySideShuffleFree(plan, setCols),
        s"hash sets reshuffled before their join:\n$plan")
      // semantics smoke beside the plan pin: every batch doc is a
      // near-dup of a history doc at j>=0.5, so the screen drops all
      assert(rows.isEmpty, s"expected all batch docs screened, got ${rows.length}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_band_idx")
      spark.sql("DROP TABLE IF EXISTS graft_hash_sets")
    }
  }

  test("negative control: an unbucketed parquet history index IS reshuffled per batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    Dedup.minhashBandIndex(history, "text", "doc_id", 3, 16, 2)
      .write.mode("overwrite").parquet(s"$dir/bands")
    Dedup.shingleHashSets(history, "text", "doc_id", 3)
      .write.mode("overwrite").parquet(s"$dir/sets")
    val out = probe(spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/sets"))
    out.collect()
    val plan = out.queryExecution.executedPlan
    // same predicate as the positive test: the unbucketed band scan must
    // arrive at its join THROUGH an exchange — proving the matcher bites
    assert(scansOf(plan, Set("band", "bucket")).nonEmpty, s"band scan not found:\n$plan")
    assert(!historySideShuffleFree(plan, Set("band", "bucket")),
      s"unbucketed control did not add a history-side shuffle:\n$plan")
  }
}
