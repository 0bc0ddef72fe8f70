package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.StageIO

/** Full six-stage DAG over parquet stage tables — the "switch from the
  * reference" smoke: nested submissions in, app-facing summary + matched
  * 10-minute tracks out.
  */
class RunnerSpec extends SparkTestBase {
  import spark.implicits._

  test("runAll: ingest → preprocess → validate → merge → exports") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dag").toString
    val tables = Runner.StageTables(dir)

    val submissions = spark.read.json(Seq(
      """{"_id": 11, "today": "2024-03-12", "landing_date": "2024-03-11",
         "group_location/sample_district": "Mangochi",
         "group_location/gps_location": "-14.0 34.9 470 5",
         "group_vessel_data": [
           {"group_vessel_data/group_vessel/vessel_type": "B+E",
            "group_vessel_data/group_vessel/crew_number": "3",
            "group_vessel_data/group_vessel/imei_number": "4123456",
            "group_vessel_data/group_catch": [
              {"fish_species": "Usipa", "weight": "24.5", "weight_type": "kg",
               "value_species": "30000", "value_type": "total", "catch_use": "sale"}]}
         ]}""").toDS)
    // PDS trips are fetched BY the device registry, so they carry the
    // canonical registry IMEI (reference R/merge_trips.R:57-65)
    val trips = Seq((9001L, "869606024123456", "2024-03-10T22:00:00Z", "2024-03-11T03:30:00Z"))
      .toDF("Trip", "IMEI", "Started", "Ended")
      .withColumn("Started", to_timestamp(col("Started")))
      .withColumn("Ended", to_timestamp(col("Ended")))
    val points = Seq((9001L, "2024-03-11T06:01:00Z", -14.01, 34.88))
      .toDF("Trip", "Time", "Lat", "Lng")
      .withColumn("Time", to_timestamp(col("Time")))
    val registry = Seq("869606024123456").toDF("IMEI")

    Runner.runAll(spark, tables, Seq("FieldDataApp-2024" -> submissions),
      trips, points, registry)

    val summary = StageIO.load(spark, tables.landingsSummary)
    assert(summary.count() == 1)
    assert(summary.select("catch_kg").collect().head.getDouble(0) == 24.5)
    assert(summary.columns.takeRight(2).toSeq == Seq("catch_kg", "price_kg"))

    val merged = StageIO.load(spark, tables.mergedTrips)
    assert(merged.select("Trip").collect().map(_.getLong(0)).toSeq == Seq(9001L))
    // IMEI canonicalized against the registry via suffix match (V6)
    assert(merged.select("imei").collect().head.getString(0) == "869606024123456")

    val tracks = StageIO.load(spark, tables.matchedTracks)
    assert(tracks.count() == 1)
    assert(tracks.select("lat").collect().head.getDouble(0) == -14.01)

    val flags = StageIO.load(spark, tables.alertFlags)
    assert(flags.count() == 1) // clean survey → empty alert string
    assert(flags.select("alert_number").collect().head.getString(0) == "")

    // config-driven ks (reference inst/config.yml:42-46): re-run the
    // validate stage with k_* from a fixture config — same clean output
    val conf = graft.sources.PipelineConfig.parse(
      """default:
        |  validation:
        |    k_nfishers: 2.5
        |    k_nboats: 2.5
        |    k_catch: 2.5
        |    k_pricekg: 3
        |""".stripMargin)
    assert(conf.validationK.kPriceKg == 3.0)
    Runner.validate(spark, tables, conf)
    assert(StageIO.load(spark, tables.validated).count() == 1)
  }
}
