package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: attribute the composed curation stage's wall-clock
  * to its sub-stages — the breakdown behind the `q_curate_e2e` bench
  * number. Times CUMULATIVE PREFIXES of the default [[graft.pipeline
  * .Curate]] chain on the exact gate input (the planted-contact-tail
  * corpus of `q_curate_e2e`), each forced with the same noop write the
  * bench uses, so `delta(stage) = t(prefix through stage) −
  * t(previous prefix)` names where the seconds go. Prefixes rather than
  * isolated stages because the chain's frames are lazy: an isolated
  * middle stage would silently re-run its upstream anyway.
  *
  * Protocol mirrors Bench where it matters: one warmup slice (Janino/
  * C2/shuffle-manager init — first-use cost must not land in a timed
  * sample), interleaved passes (rep 1 of every prefix, then rep 2, …)
  * so one noise window can touch at most one sample per prefix, session
  * scrub (plan cache + blocking unpersist of leaked localCheckpoint
  * blocks) after every sample, per-prefix MEDIAN reported.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.CurateProfile [reps] [mode]
  * Prints one JSON line: {"stages":{name:{"median":…,"delta":…,
  * "samples":[…]}},"order":[…]}.
  *
  * mode=screens (round 13): the same prefix protocol over the
  * `q_curate_e2e_screens` configuration — the DOUBLED corpus (planted
  * tail + accent twins), accent folding, and the screens-ON Curate call
  * (PPL band keep, DSIR-last). The screens gate is the suite's
  * costliest (20.8 s idle) and its cost claim — the doubled corpus
  * quadruples the candidate stage (2×docs ≈ 4×pairs through a
  * corpus²-shaped pair join) — was asserted from construction; this
  * mode measures it (docs/CURATE_SCREENS_ATTRIBUTION.md).
  */
object CurateProfile {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.length
    if (n % 2 == 1) s(n / 2) else s(n / 2 - 1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mode = args.lift(1).getOrElse("default")
    require(mode == "default" || mode == "screens", s"mode=$mode (default | screens)")

    def planted: DataFrame = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      concat(col("text"),
        lit(" contact user@example.com or https://ex.com/d/x42 tel +265 99 123 4567"))
        .as("text"))

    // the q_curate_e2e_screens corpus: planted docs UNION accent twins
    // (translate a→á, e→é with a shifted id space) — 2× the docs, and
    // every twin is a true near-dup of its original once accents fold
    def plantedScreens: DataFrame = {
      val p = Tables.documents(spark, sfDir).select(
        col("doc_id"),
        concat(col("text"),
          lit(" contact user@example.com or https://ex.com/d/x42 tel +265 99 123 4567"))
          .as("text"),
        col("lang"), col("source"))
      p.unionByName(p.select(
        (col("doc_id") + lit(10000000L)).as("doc_id"),
        // \u-escaped like the gate: the corpus must be byte-identical
        translate(col("text"), "ae", "\u00e1\u00e9").as("text"),
        col("lang"), col("source")))
    }
    def foldedScreens: DataFrame = plantedScreens.withColumn("text",
      graft.functions.TextExprs.stripAccents(col("text")))

    // Cumulative prefixes of the default Curate chain. Stage bodies
    // restate Curate.apply's default-path composition (same ops, same
    // defaults: prefixFilter=true, n=3, j=0.2, bands 30/200 tokens) —
    // kept in sync by the full-chain sanity delta at the end: `full`
    // IS Curate.apply, so drift between these prefixes and the real
    // chain shows up as a nonsensical last delta.
    val defaultPrefixes: Seq[(String, () => DataFrame)] = Seq(
      "read_plant" -> (() => planted),
      "exact_dedup" -> (() => graft.ops.Dedup.exactDedup(planted, "text", "doc_id")),
      "neardup_pairs" -> (() => {
        val d = graft.ops.Dedup.exactDedup(planted, "text", "doc_id")
        graft.ops.Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.2,
          prefixFilter = true)
      }),
      "neardup_keepone" -> (() => {
        val d = graft.ops.Dedup.exactDedup(planted, "text", "doc_id")
        graft.ops.Dedup.nearDupSurvivors(d, "text", "doc_id", 3, 0.2,
          prefixFilter = true)
      }),
      "full" -> (() => graft.pipeline.Curate(planted)))

    // Cumulative prefixes of the screens chain (q_curate_e2e_screens
    // config: foldAccents, PPL band keep head+middle, DSIR k=120). The
    // last delta = survivor-fit PPL screen + DSIR + quality/scrub/split/
    // chunk tail — everything after the keep-one.
    val screensPrefixes: Seq[(String, () => DataFrame)] = Seq(
      "read_plant_2x" -> (() => plantedScreens),
      "fold_accents" -> (() => foldedScreens),
      "exact_dedup" -> (() => graft.ops.Dedup.exactDedup(foldedScreens, "text", "doc_id")),
      "neardup_pairs" -> (() => {
        val d = graft.ops.Dedup.exactDedup(foldedScreens, "text", "doc_id")
        graft.ops.Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.2,
          prefixFilter = true)
      }),
      "neardup_keepone" -> (() => {
        val d = graft.ops.Dedup.exactDedup(foldedScreens, "text", "doc_id")
        graft.ops.Dedup.nearDupSurvivors(d, "text", "doc_id", 3, 0.2,
          prefixFilter = true)
      }),
      "full" -> (() => {
        val p = plantedScreens
        // DSIR target from the UN-TWINNED planted half (doc_id < 10^7),
        // exactly as q_curate_e2e_screens builds it — the doubled corpus
        // includes accent twins, and fitting importance on a 2× target
        // with accented n-grams would profile a different gate than the
        // one being attributed (round-14 advisor item)
        graft.pipeline.Curate(p,
          foldAccents = true,
          pplKeepBuckets = Seq("head", "middle"), pplLangCol = Some("lang"),
          dsirTarget = Some(p.filter(col("doc_id") < 10000000L &&
            col("source").isin("src0", "src1", "src2", "src3"))),
          dsirK = 120)
      }))
    val prefixes = if (mode == "screens") screensPrefixes else defaultPrefixes

    // warmup: the same representative slice Bench runs, plus one table touch
    Tables.documents(spark, sfDir).count()
    graft.pipeline.Curate(Tables.documents(spark, sfDir).limit(256))
      .write.format("noop").mode("overwrite").save()
    scrub(spark)

    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, fn) <- prefixes) {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      samples(name) = samples(name) :+ secs
      scrub(spark)
    }

    def fmt(d: Double) = f"$d%.3f"
    val meds = prefixes.map { case (n, _) => n -> median(samples(n)) }
    val deltas = meds.zip(("" -> 0.0) +: meds).map {
      case ((n, m), (_, prev)) => (n, m, m - prev)
    }
    val stages = deltas.map { case (n, m, d) =>
      s""""$n":{"median":${fmt(m)},"delta":${fmt(d)},"samples":${
        samples(n).map(fmt).mkString("[", ",", "]")}}"""
    }
    val order = prefixes.map(p => "\"" + p._1 + "\"").mkString("[", ",", "]")
    println(s"""{"stages":${stages.mkString("{", ",", "}")},"order":$order,"reps":$reps,"mode":"$mode","sf":"$sfDir"}""")
    spark.stop()
  }

  private def scrub(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }
}
