package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Report analytics over a validated-shaped fixture (reference
  * inst/reports/malawi-report.qmd; A3/A4/A6/W1/SO6/P10).
  */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private val validated = Seq(
    ("Mangochi", "2024-03-11", "usipa", 10.0, 100.0),
    ("Mangochi", "2024-03-11", "usipa", 20.0, 120.0),
    ("Mangochi", "2024-03-12", "chambo", 5.0, 500.0),
    ("Nkhotakota", "2024-03-11", "usipa", 7.0, 90.0),
    (null, "2024-03-11", "usipa", 99.0, 90.0)) // null district filtered
    .toDF("sample_district", "landing_date", "catch_taxon", "catch_kg", "price_kg")
    .withColumn("landing_date", to_timestamp(col("landing_date")))

  test("A3: survey counts per district, descending") {
    val out = Analytics.surveysPerDistrict(validated)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("Mangochi", 3L), ("Nkhotakota", 1L)))
  }

  test("SO6: coverage scaffold zero-fills missing (district, day) combos") {
    val out = Analytics.surveyCoverage(validated)
    assert(out.count() == 4) // 2 districts × 2 days
    val zero = out.filter(col("sample_district") === "Nkhotakota" &&
      col("day") === "2024-03-12").collect().head
    assert(zero.getLong(zero.fieldIndex("n")) == 0L)
  }

  test("A4+W1: top species per district by total weight") {
    val out = Analytics.topSpeciesPerDistrict(validated, k = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSet == Set(("Mangochi", "usipa", 30.0), ("Nkhotakota", "usipa", 7.0)))
  }

  test("A6+P10: per-species window mean of USD price") {
    val out = Analytics.meanPriceBySpecies(validated)
      .filter(col("catch_taxon") === "usipa")
      .select("mean_price").distinct().collect()
    assert(out.length == 1)
    val expected = (100.0 + 120.0 + 90.0 + 90.0) / 4 * Analytics.MwkToUsd
    assert(math.abs(out.head.getDouble(0) - expected) < 1e-12)
  }
}
