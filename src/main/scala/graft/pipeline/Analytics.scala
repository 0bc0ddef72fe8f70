package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Matching

/** Report analytics (reference inst/reports/malawi-report.qmd;
  * SURVEY.md A3/A4/A6/W1/SO6/P10) as reusable transforms over the
  * validated-landings frame.
  */
object Analytics {

  val MwkToUsd = 0.0006 // reference qmd:152 (hardcoded conversion)

  /** Survey counts per district, descending (qmd:56-63). */
  def surveysPerDistrict(validated: DataFrame): DataFrame =
    validated.filter(col("sample_district").isNotNull)
      .groupBy("sample_district").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("sample_district"))

  /** District × date scaffold with survey counts, zero-filled —
    * tidyr::complete (qmd:69) + replace_na.
    */
  def surveyCoverage(validated: DataFrame): DataFrame = {
    val base = validated.filter(col("sample_district").isNotNull)
      .withColumn("day", to_date(col("landing_date")))
    val counts = base.groupBy("sample_district", "day").agg(count(lit(1)).as("n"))
    base.select("sample_district").distinct()
      .crossJoin(base.select("day").distinct())
      .join(counts, Seq("sample_district", "day"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** Top-k species by total weight per district (qmd:102-123): group sums
    * then per-group head — W1.
    */
  def topSpeciesPerDistrict(validated: DataFrame, k: Int = 10): DataFrame = {
    val totals = validated
      .filter(col("sample_district").isNotNull && col("catch_taxon").isNotNull)
      .na.fill(0.0, Seq("catch_kg"))
      .groupBy("sample_district", "catch_taxon")
      .agg(sum(col("catch_kg")).as("tot_weight"))
    Matching.topKPerGroup(totals, Seq(col("sample_district")),
      Seq(col("tot_weight").desc, col("catch_taxon").asc), k)
  }

  /** Mean price per kg (USD) by species, with the non-reducing per-group
    * mean used for ordering (qmd:152-157) — A6/W3 + P10.
    */
  def meanPriceBySpecies(validated: DataFrame): DataFrame =
    validated.filter(col("catch_taxon").isNotNull)
      .withColumn("pricekg_USD", col("price_kg") * lit(MwkToUsd))
      .withColumn("mean_price",
        avg(col("pricekg_USD")).over(Window.partitionBy(col("catch_taxon"))))
}
