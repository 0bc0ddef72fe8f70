package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** S1/S5/S7/S8 + O-ERR: permissive JSON fault tolerance, stage-table
  * round-trip with contract padding, layered YAML config with env
  * interpolation, filename versioning.
  */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("O-ERR: corrupt submissions are dropped, not thrown (purrr::possibly)") {
    val payload = Seq(
      """{"_id": 1, "ok": "yes"}""",
      """{"_id": 2, "ok": }garbage""", // corrupt
      """{"_id": 3, "ok": "also"}""")
    val out = Sources.koboSubmissionsFromPayload(spark, payload)
    assert(out.select("_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(!out.columns.contains("_corrupt_record"))
  }

  test("S4/S5: stage table round-trip pads missing contract columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    StageIO.save(Seq((1L, "a")).toDF("id", "x"), s"$dir/t")
    val contract = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("later_added", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val back = StageIO.loadConformed(spark, s"$dir/t", contract)
    assert(back.columns.toSeq == Seq("x", "later_added", "id"))
    assert(back.collect().head.toSeq == Seq("a", null, 1L))
  }

  test("S5 at scale: month-partitioned overwrite prunes on date filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val df = Seq(("2024-01-05", 1), ("2024-02-11", 2), ("2024-02-12", 3))
      .toDF("landing_date", "v")
      .withColumn("landing_date", to_timestamp(col("landing_date")))
    StageIO.saveByMonth(df, s"$dir/m", "landing_date")
    val back = StageIO.load(spark, s"$dir/m")
    assert(back.filter(col("__month") === "2024-02").count() == 2)
    // partition directories exist on disk → pruning is physical
    val dirs = new java.io.File(s"$dir/m").listFiles().map(_.getName).filter(_.startsWith("__month="))
    assert(dirs.toSet == Set("__month=2024-01", "__month=2024-02"))
  }

  test("bucketed stage tables join without any shuffle exchange") {
    // Rerun-idempotent: drop catalog entries AND warehouse dirs first (the
    // temp warehouse in SparkTestBase already isolates runs; this guards
    // against in-run reuse too).
    def dropManaged(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, name)
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    dropManaged("graft_bucket_a"); dropManaged("graft_bucket_b")
    try {
      val a = Seq.tabulate(100)(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = Seq.tabulate(100)(i => (i.toLong, s"b$i")).toDF("k", "vb")
      StageIO.saveBucketed(a, "graft_bucket_a", "k", 4)
      StageIO.saveBucketed(b, "graft_bucket_b", "k", 4)
      val joined = spark.table("graft_bucket_a")
        .hint("merge") // force SMJ so the bucketing (not a broadcast) does the work
        .join(spark.table("graft_bucket_b"), Seq("k"))
      assert(joined.count() == 100)
      val executed = joined.queryExecution.executedPlan.toString
      assert(executed.contains("SortMergeJoin"))
      assert(!executed.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$executed")
    } finally {
      dropManaged("graft_bucket_a"); dropManaged("graft_bucket_b")
    }
  }

  test("incremental appendDedup: append run equals full rerun, re-append is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString + "/t"
    def mk(rows: (String, String, Int)*) =
      rows.toSeq.toDF("survey_id", "landing_date", "v")
        .withColumn("landing_date", to_timestamp(col("landing_date")))
    val batch1 = mk(("a", "2024-01-05", 1), ("b", "2024-02-11", 2))
    val batch2 = mk(("b", "2024-02-11", 2), // overlap — must not duplicate
      ("c", "2024-02-12", 3), ("d", "2024-03-01", 4))
    StageIO.appendDedup(spark, batch1, dir, "landing_date", Seq("survey_id"))
    StageIO.appendDedup(spark, batch2, dir, "landing_date", Seq("survey_id"))
    def snapshot() = StageIO.load(spark, dir)
      .select("survey_id", "v").collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    val incremental = snapshot()
    assert(incremental == Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)))
    // re-appending the same batch changes nothing
    StageIO.appendDedup(spark, batch2, dir, "landing_date", Seq("survey_id"))
    assert(snapshot() == incremental)
    // equals the truncate-and-load of the union (the reference's semantics)
    val fullDir = java.nio.file.Files.createTempDirectory("graft-full").toString + "/t"
    StageIO.saveByMonth(batch1.unionByName(batch2).dropDuplicates("survey_id"),
      fullDir, "landing_date")
    val full = StageIO.load(spark, fullDir)
      .select("survey_id", "v").collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(incremental == full)
  }

  test("S7: layered YAML config merges profile over default and interpolates env") {
    val yaml =
      """default:
        |  storage:
        |    collection: raw
        |    conn: ${GRAFT_TEST_CONN}
        |  validation:
        |    k_nfishers: 2.5
        |    k_pricekg: 3
        |production:
        |  storage:
        |    collection: raw_prod
        |""".stripMargin
    val conf = PipelineConfig.parse(yaml, "production", Map("GRAFT_TEST_CONN" -> "mongodb://x"))
    assert(conf.getString("storage.collection").contains("raw_prod")) // overridden
    assert(conf.getString("storage.conn").contains("mongodb://x"))    // interpolated
    assert(conf.validationK.kNFishers == 2.5 && conf.validationK.kPriceKg == 3.0)
    val dflt = PipelineConfig.parse(yaml, "default", Map.empty)
    assert(dflt.getString("storage.collection").contains("raw"))
    assert(dflt.getString("storage.conn").contains("")) // missing env → ""
  }

  test("S8: add_version stamps timestamp + short sha") {
    val name = Sources.addVersion("landings", "csv", "abcdef0123456",
      now = java.time.LocalDateTime.of(2024, 3, 12, 8, 30, 5))
    assert(name == "landings__20240312083005_abcdef0.csv")
  }
}
