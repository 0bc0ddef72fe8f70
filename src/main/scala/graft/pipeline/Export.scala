package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stages 5/6 — export_landings and export_matched_tracks (reference
  * R/export.R:34-75, :126-182).
  */
object Export {

  /** export_landings (reference :47-64): app-facing projection — first
    * four contract columns plus the summary block, in order.
    */
  def landingsSummary(validated: DataFrame): DataFrame = {
    val firstFour = validated.columns.take(4).map(c => col(s"`$c`"))
    validated.select(firstFour ++ Seq(
      col("sample_district"), col("landing_site"), col("lat"), col("lon"),
      col("n_fishers"), col("n_boats"), col("trip_length"), col("gear"),
      col("catch_usage"), col("catch_taxon"), col("catch_price"),
      col("catch_kg"), col("price_kg")): _*)
  }

  /** export_matched_tracks (reference :154-174): merged trips (7 columns)
    * left-joined to GPS points on Trip, noise columns dropped
    * (:161-164), then the 10-minute tumbling aggregation — floor_date +
    * mean position per (submission, survey, trip, bucket, gear, vessel,
    * taxon, catch) (:165-174).
    *
    * The merged side is small (matched trips) → broadcast; points are the
    * big side and only shuffle once, for the aggregation. date_trunc-style
    * bucketing via window() keeps this shape streaming-ready.
    */
  def matchedTracks(mergedTrips: DataFrame, points: DataFrame): DataFrame = {
    val tripInfo = mergedTrips.select(
      "submission_id", "survey_id", "vessel_type", "gear",
      "catch_taxon", "catch_kg", "Trip")
    val joined = broadcast(tripInfo).join(points, Seq("Trip"), "left")
      .drop("Boat", "Speed (M/S)", "Range (Meters)", "Heading", "Boat Name", "Community")
    joined
      .withColumn("time", window(col("Time"), "10 minutes").getField("start"))
      .groupBy("submission_id", "survey_id", "Trip", "time",
        "gear", "vessel_type", "catch_taxon", "catch_kg")
      .agg(avg(col("Lat")).as("lat"), avg(col("Lng")).as("lon"))
  }
}
