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
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.CurateProfile [reps]
  * Prints one JSON line: {"stages":{name:{"median":…,"delta":…,
  * "samples":[…]}},"order":[…]}.
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

    def planted: DataFrame = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      concat(col("text"),
        lit(" contact user@example.com or https://ex.com/d/x42 tel +265 99 123 4567"))
        .as("text"))

    // Cumulative prefixes of the default Curate chain. Stage bodies
    // restate Curate.apply's default-path composition (same ops, same
    // defaults: prefixFilter=true, n=3, j=0.2, bands 30/200 tokens) —
    // kept in sync by the full-chain sanity delta at the end: `full`
    // IS Curate.apply, so drift between these prefixes and the real
    // chain shows up as a nonsensical last delta.
    val prefixes: Seq[(String, () => DataFrame)] = Seq(
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
    println(s"""{"stages":${stages.mkString("{", ",", "}")},"order":$order,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }

  private def scrub(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }
}
