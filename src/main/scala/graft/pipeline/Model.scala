package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed model for the fixed-contract stages (SURVEY.md §1.3: stage
  * boundaries after preprocess have documented schemas, so `Dataset[T]`
  * buys compile-time field checks there; the raw-ingest stage is
  * schema-dynamic and stays `DataFrame`).
  */
object Model {

  case class Gillnet(
      gillnet_mesh_mm: Option[Double],
      gillnet_length_m: Option[Double],
      gillnet_number: Option[Double],
      net_type: Option[String])

  /** The preprocessed-landings contract (FIXTURES.md A2). */
  case class PreprocessedLanding(
      form_name: Option[String],
      submission_id: Option[String],
      survey_id: Option[String],
      landing_date: Option[Timestamp],
      submission_date: Option[Timestamp],
      sample_district: Option[String],
      landing_site: Option[String],
      sample_stratum: Option[String],
      sample_day: Option[String],
      lat: Option[Double],
      lon: Option[Double],
      fishing_today: Option[String],
      why_not_fishing: Option[String],
      n_boats: Option[Double],
      vessel_type: Option[String],
      n_fishers: Option[Double],
      n_women: Option[Double],
      trip_length: Option[Double],
      tracker_imei: Option[String],
      gear: Option[String],
      gear_depth: Option[Double],
      gear_hrs: Option[Double],
      gear_n_sets: Option[Double],
      gear_n_hooks: Option[Double],
      gear_n_hauls: Option[Double],
      gear_length: Option[Double],
      mesh_size_mm: Option[Double],
      gillnets: Option[Seq[Gillnet]],
      trader_sex: Option[String],
      trader_transport_mode: Option[String],
      food_destination: Option[String],
      catch_price: Option[Double],
      catch_price_type: Option[String],
      catch_usage: Option[String],
      catch_taxon: Option[String],
      catch_taxon_other: Option[String],
      catch_kg: Option[Double],
      weight_type: Option[String],
      price_kg: Option[Double])

  /** Matched trip row (merge stage output core). */
  case class MatchedTrip(
      landing_date: java.sql.Date,
      imei: String,
      survey_id: Option[String],
      Trip: Option[Long])

  def asPreprocessed(df: DataFrame): Dataset[PreprocessedLanding] = {
    import df.sparkSession.implicits._
    df.as[PreprocessedLanding]
  }
}
