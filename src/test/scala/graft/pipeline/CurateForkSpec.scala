package graft.pipeline

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlanInfo
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Materialize

/** Pins the fork-materialization discipline (round-14 verdict items 3+5).
  *
  * The round-13 screens fix (24.1 → 14.9 s) was exactly the regression
  * this spec exists to prevent: a consumption fork that loses its eager
  * materialization re-executes its whole upstream once per consumer, no
  * correctness gate fails, and only the bench drifts. The discipline is
  * asserted here by COUNTING SOURCE SCANS — every SQL execution's plan
  * is walked for parquet scans of the spec's own corpus directory, so a
  * lazied fork shows up as extra scans of the source. The negative
  * control (the `lazy` strategy, which skips materialization entirely)
  * proves the counter can fail.
  *
  * The table-mode twin (item 3): `spark.graft.forkMaterialize=table`
  * must produce BYTE-IDENTICAL results to the default local mode — the
  * strategy changes where forked bytes live (executor block managers vs
  * a parquet staging table), never what they contain.
  */
class CurateForkSpec extends SparkTestBase {
  import spark.implicits._

  /** Small planted corpus with the structure every curate stage needs:
    * exact duplicates (dedup), shared-tail near-dups (keep-one),
    * accent twins (foldAccents), two languages (ppl screen), and a
    * source column (dsir target). Written to parquet so source scans
    * are countable — the marker dir name is what the listener matches.
    */
  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-forkspec-docs").toString
    // mostly-unique vocabularies per doc (no accidental shared 8-grams —
    // decontamination and near-dup hits below are PLANTED, not emergent)
    def body(i: Int): String = {
      val words = (0 until 24).map(j => s"w${(i * 31 + j * 7) % 997}x$j").mkString(" ")
      s"document number $i begins $words ends here"
    }
    val base = (0 until 120).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val src = s"src${i % 4}"
      (i.toLong, body(i), lang, src)
    }
    // exact duplicates of docs 0-9 under new ids (exact-dedup food)
    val dups = (0 until 10).map(i => (1000L + i, base(i)._2, base(i)._3, base(i)._4))
    // near-dup twins of docs 10-19: one word changed (jaccard ≈ 0.87)
    val near = (10 until 20).map { i =>
      (2000L + i, base(i)._2.replace("ends here", "ends there"),
        base(i)._3, base(i)._4)
    }
    (base ++ dups ++ near).toDF("doc_id", "text", "lang", "source")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def docs: DataFrame = spark.read.parquet(s"$corpusDir/documents.parquet")

  /** The screens-shaped curate run: every optional fork site in
    * Curate.apply is exercised — the minhash planner fork (family =
    * minhash with planner sizing), decontamination, span strip, line
    * strip, the ppl screen and dsir selection.
    */
  private def runCurate(): Array[(Long, String, Int, String)] = {
    val target = docs.filter(col("source").isin("src0", "src1"))
    // planted contamination: the benchmark carries docs 20-22 verbatim,
    // so exactly those three share 8-gram shingles with it
    val bench = docs.filter(col("doc_id").between(20, 22))
      .select(col("doc_id"), col("text"))
    Curate(docs,
      foldAccents = true,
      benchmark = Some(bench),
      stripSpanK = 0,
      stripLineDups = false,
      pplKeepBuckets = Seq("head", "middle"), pplLangCol = Some("lang"),
      dsirTarget = Some(target), dsirK = 40,
      nearDupFamily = "minhash", minhashBands = 0,
      jaccardThreshold = 0.5,
      minTokens = 5, maxTokens = 400)
      .orderBy("doc_id", "chunk_id")
      .select(col("doc_id"), col("split"), col("chunk_id"), col("chunk_text"))
      .as[(Long, String, Int, String)]
      .collect()
  }

  /** Count parquet-scan nodes of [[corpusDir]] across every SQL
    * execution started while `body` runs. Scans are counted from the
    * execution-start plan (AQE updates re-describe the SAME execution —
    * counting only Start events counts each plan once).
    */
  private def countSourceScans[A](body: => A): (Int, A) = {
    val scans = new AtomicInteger(0)
    val marker = "graft-forkspec-docs"
    def walk(p: SparkPlanInfo): Int =
      (if (p.nodeName.toLowerCase.contains("scan") &&
        (p.simpleString.contains(marker) ||
          p.metadata.valuesIterator.exists(_.contains(marker)))) 1 else 0) +
        p.children.map(walk).sum
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          scans.addAndGet(walk(e.sparkPlanInfo))
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val res = body
      org.apache.spark.GraftTestShim.waitListenerBus(spark.sparkContext)
      (scans.get(), res)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withStrategy[A](mode: String)(body: => A): A = {
    spark.conf.set(Materialize.StrategyKey, mode)
    try body finally spark.conf.unset(Materialize.StrategyKey)
  }

  /** The `lazy` negative control is gated behind a test-only system
    * property so a production session conf typo'd to `lazy` cannot
    * silently disable every fork materialization.
    */
  private def withLazyGate[A](body: => A): A = {
    System.setProperty(Materialize.LazyGateProp, "true")
    try body finally System.clearProperty(Materialize.LazyGateProp)
  }

  test("fork discipline: eager forks bound source scans; a lazied fork re-executes upstream (negative control)") {
    corpusDir // force corpus write OUTSIDE any counting window
    val (eagerScans, eagerRows) = countSourceScans(runCurate())
    assert(eagerRows.nonEmpty)
    // With every fork eagerly materialized, the source parquet is read
    // only by plans UPSTREAM of the first materialization point — the
    // canon projection feeding exactDedup's digest aggregate and
    // semi-join (2 consumers) plus the planner fork's checkpoint:
    // measured 5 scans. A lazied pipeline re-derives the source through
    // EVERY downstream consumer instead — measured 2065 scans on this
    // same corpus (each screen's consumers multiply every upstream
    // fork's consumers). The bound is deliberately loose (8 ≈ 1.6× the
    // measured count) so a Spark upgrade shifting plan shapes doesn't
    // false-fail; the REGRESSION signal is the relative assertion below.
    assert(eagerScans > 0, "counter saw no source scans - marker match broken?")
    assert(eagerScans <= 8, s"eager fork run scanned the source $eagerScans times")
    val (lazyScans, lazyRows) = withLazyGate {
      withStrategy("lazy")(countSourceScans(runCurate()))
    }
    // same rows either way — laziness changes cost, never content
    assert(lazyRows.toSeq == eagerRows.toSeq)
    assert(lazyScans > eagerScans,
      s"negative control failed: lazy=$lazyScans vs eager=$eagerScans - " +
        "the scan counter can no longer detect a lazied fork")
    info(s"source scans: eager=$eagerScans lazy=$lazyScans (bound 8)")
  }

  test("table-mode fork materialization is byte-identical to local mode (curate e2e)") {
    val stageDir = java.nio.file.Files.createTempDirectory("graft-fork-stage").toString
    val local = runCurate()
    val table = withStrategy("table") {
      spark.conf.set(Materialize.DirKey, stageDir)
      try runCurate() finally spark.conf.unset(Materialize.DirKey)
    }
    assert(local.toSeq == table.toSeq)
    // the staging tables actually landed on disk (the strategy ran)
    val staged = new java.io.File(stageDir).listFiles()
    assert(staged != null && staged.nonEmpty, "table mode wrote no staging tables")
    // job-end cleanup drops the whole staging dir; a second call no-ops
    spark.conf.set(Materialize.DirKey, stageDir)
    try {
      Materialize.cleanStagingDir(spark)
      assert(!new java.io.File(stageDir).exists(), "staging dir survived cleanup")
      Materialize.cleanStagingDir(spark) // missing dir is a no-op
    } finally spark.conf.unset(Materialize.DirKey)
  }

  test("unknown strategy fails fast") {
    withStrategy("distributed-magic") {
      val e = intercept[IllegalArgumentException](Materialize.fork(docs))
      assert(e.getMessage.contains("forkMaterialize"))
    }
  }

  test("ungated 'lazy' strategy fails fast (production sessions can't silently disable forks)") {
    assert(System.getProperty(Materialize.LazyGateProp) == null)
    withStrategy("lazy") {
      val e = intercept[IllegalArgumentException](Materialize.fork(docs))
      assert(e.getMessage.contains("negative control"))
    }
  }

  test("staging names are collision-safe and the default base is per-application") {
    val stageDir = java.nio.file.Files.createTempDirectory("graft-fork-names").toString
    withStrategy("table") {
      spark.conf.set(Materialize.DirKey, stageDir)
      try {
        Materialize.fork(docs.limit(1)); Materialize.fork(docs.limit(1))
        val names = new java.io.File(stageDir).listFiles().map(_.getName)
        assert(names.length == 2 && names.distinct.length == 2)
        // names embed a random per-JVM tag (collision safety across two
        // concurrent drivers sharing one explicit staging dir) plus the
        // per-JVM counter
        assert(names.forall(_.matches("fork_[0-9a-f]{16}_\\d+")), names.mkString(","))
      } finally {
        spark.conf.unset(Materialize.DirKey)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stageDir))
      }
    }
  }

  test("cleanStagingDir refuses a dir holding non-fork entries (mispointed DirKey guard)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fork-guard")
    java.nio.file.Files.writeString(dir.resolve("precious-data.txt"), "not a fork")
    spark.conf.set(Materialize.DirKey, dir.toString)
    try {
      val e = intercept[IllegalArgumentException](Materialize.cleanStagingDir(spark))
      assert(e.getMessage.contains("non-fork"))
      assert(java.nio.file.Files.exists(dir.resolve("precious-data.txt")))
    } finally {
      spark.conf.unset(Materialize.DirKey)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("lineage cuts honor the session checkpoint-level conf: DISK_ONLY keeps " +
    "blocks out of memory, results byte-identical") {
    import spark.implicits._
    // scrub leftover blocks so the level assertion below sees only ours
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val src = (1 to 100).toDF("x").select((col("x") * 2).as("y"))
    val expected = Materialize.cut(src).collect().map(_.getInt(0)).sorted
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.conf.set(Materialize.CheckpointLevelKey, "DISK_ONLY")
    try {
      val got = Materialize.cut(src).collect().map(_.getInt(0)).sorted
      assert(got.sameElements(expected))
      // the de-pressure contract: the checkpointed blocks must not claim
      // storage MEMORY — DiskStore streams them, no MemoryStore unroll
      val lvls = spark.sparkContext.getPersistentRDDs.values
        .map(_.getStorageLevel).toSeq
      assert(lvls.nonEmpty && lvls.forall(l => l.useDisk && !l.useMemory),
        s"expected disk-only checkpoint levels, got: $lvls")
    } finally {
      spark.conf.unset(Materialize.CheckpointLevelKey)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
  }
}
