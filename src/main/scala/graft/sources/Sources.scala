package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Restructure
import graft.pipeline.Schemas

/** Source adapters (SURVEY.md §2.1).
  *
  * The reference pulls from Kobo REST, the PDS trips API, MongoDB and
  * Google Sheets over HTTP (R/ingestion.R, R/storage.R). This container
  * has no egress, so the HTTP leg is out of scope by construction — these
  * adapters consume the fetched payloads (JSON/CSV bytes or files), which
  * is the part with dataflow semantics: permissive parsing, schema
  * application, missing-column padding, per-record fault tolerance.
  */
object Sources {

  /** S1 — Kobo submissions: nested JSON, one document per submission.
    * PERMISSIVE mode + corrupt-record drop replaces the reference's
    * per-record `purrr::possibly` tolerance (R/ingestion.R:296,317):
    * malformed documents are isolated, counted, and dropped — never throw.
    */
  def koboSubmissions(spark: SparkSession, path: String): DataFrame =
    dropCorrupt(spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path))

  /** Same, over already-fetched payload strings (one JSON doc per line). */
  def koboSubmissionsFromPayload(spark: SparkSession, payload: Seq[String]): DataFrame = {
    import spark.implicits._
    dropCorrupt(spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(payload.toDS))
  }

  private def dropCorrupt(df: DataFrame): DataFrame =
    if (df.columns.contains("_corrupt_record"))
      df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    else df

  /** S2 — PDS trips CSV (reference get_trips, R/ingestion.R:428-475):
    * header CSV with the fixed trips contract applied.
    */
  def pdsTrips(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.pdsTrips)
      .csv(path)

  /** S3 — PDS trip points CSV (reference get_trip_points,
    * R/ingestion.R:539-629). The reference fans out one HTTP GET per trip
    * in a worker pool (R/export.R:143-152); in Spark the fan-out is the
    * file listing itself — pass a directory or glob of per-trip CSVs and
    * partition parallelism replaces the R worker pool.
    */
  def pdsTripPoints(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.pdsTripPoints)
      .csv(path)

  /** S6 — metadata sheets (reference get_metadata, R/storage.R:135-156):
    * all columns read as string (col_types = "c", R/storage.R:152); tiny →
    * marked broadcast-able at the join site.
    */
  def metadataSheet(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false") // everything string, like col_types="c"
      .csv(path)

  /** S8 — versioned filename helper (reference add_version,
    * R/utils.R:30-52): `name__YYYYmmddHHMMSS_sha.ext`.
    */
  def addVersion(filename: String, extension: String, sha: String, shaLen: Int = 7,
                 sep: String = "__", now: java.time.LocalDateTime = java.time.LocalDateTime.now()): String = {
    val stamp = now.format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
    s"$filename$sep${stamp}_${sha.take(shaLen)}.$extension"
  }
}
