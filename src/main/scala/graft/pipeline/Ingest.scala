package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Restructure

/** Stage 1 — ingest_landings (reference R/ingestion.R:38-105): nested Kobo
  * survey documents → one row per (vessel, catch).
  *
  * The reference walks each submission imperatively (`process_survey`,
  * R/ingestion.R:132-272) in parallel R sessions; here the same
  * denormalization is two `posexplode_outer` generators — narrow,
  * partition-parallel, no driver involvement:
  *
  *   - vessels exploded with 1-based `vessel_number` (R/ingestion.R:162-188)
  *   - catches exploded with 1-based `catch_number`, emitting the null
  *     placeholder row for vessels without catches (R/ingestion.R:224-237)
  *   - gillnets kept nested, tagged with `gillnet_number` via transform()
  *     (R/ingestion.R:191-215)
  *   - parent attributes replicate automatically (R/ingestion.R:259-270)
  *
  * Per-record fault tolerance (`purrr::possibly`, R/ingestion.R:296) maps
  * to PERMISSIVE JSON parsing: corrupt submissions land in
  * `_corrupt_record` and are dropped, not thrown.
  */
object Ingest {

  /** Key detection (R/ingestion.R:146-152): newer forms nest vessels under
    * `group_vessel_data`, legacy under `vessels`; catches under
    * `group_catch` vs `fish_repeat` (R/ingestion.R:173-177,218-222).
    */
  def vesselColumn(df: DataFrame): Option[String] =
    Seq("group_vessel_data", "vessels").find(df.columns.contains)

  private def structFieldNames(df: DataFrame, column: String): Seq[String] =
    df.schema(column).dataType match {
      case ArrayType(st: StructType, _) => st.fieldNames.toSeq
      case _ => Seq.empty
    }

  /** Denormalize one form's submissions. Survey-only rows (no vessels) are
    * kept with null vessel/catch columns (R/ingestion.R:154-156).
    */
  def denormalize(submissions: DataFrame): DataFrame = {
    val vesselCol = vesselColumn(submissions)
      .getOrElse(return submissions) // no vessel data in this form: survey-only rows
    val catchKey = structFieldNames(submissions, vesselCol)
      .find(n => n.endsWith("group_catch") || n.endsWith("fish_repeat"))
    val gillnetKey = structFieldNames(submissions, vesselCol)
      .find(_.endsWith("group_gillnets"))

    // explode vessels, 1-based vessel_number
    val vessels = Restructure.explodeWithIndex(
      submissions, vesselCol, "vessel_number", "__vessel", outer = true)

    // hoist vessel attributes (flatten one struct level, keep catches array)
    val vesselFields = vessels.schema("__vessel").dataType.asInstanceOf[StructType].fieldNames
    val hoisted = vessels.select(
      vessels.columns.filterNot(_ == "__vessel").map(c => col(s"`$c`")) ++
        vesselFields.map(f => col("__vessel").getField(f).as(f)): _*)

    // gillnets: nested sub-table stays nested; tag 1-based gillnet_number
    val withGillnets = gillnetKey match {
      case Some(g) =>
        val fields = hoisted.schema(g).dataType.asInstanceOf[ArrayType]
          .elementType.asInstanceOf[StructType].fieldNames.filterNot(_ == "gillnet_number")
        hoisted.withColumn("gillnets",
          transform(col(s"`$g`"), (gn, i) => struct(
            fields.map(f => gn.getField(f).as(f)).toIndexedSeq :+
              (i + 1).cast(StringType).as("gillnet_number"): _*)))
          .drop(g)
      case None => hoisted
    }

    // explode catches, 1-based catch_number; explode_outer emits the
    // placeholder null-catch row for vessels with no catches
    catchKey match {
      case Some(ck) =>
        val catches = Restructure.explodeWithIndex(
          withGillnets, ck, "catch_number", "__catch", outer = true)
        val catchFields = catches.schema("__catch").dataType.asInstanceOf[StructType].fieldNames
        catches.select(
          catches.columns.filterNot(_ == "__catch").map(c => col(s"`$c`")) ++
            catchFields.map(f => col("__catch").getField(f).as(f)): _*)
      case None => withGillnets.withColumn("catch_number", lit(null).cast(IntegerType))
    }
  }

  /** Full ingest: denormalize each form's frame, strip the nested-path
    * prefixes from hoisted names, tag with form_name, union by name with
    * missing-column fill (reference bind_rows(.id), R/ingestion.R:92), and
    * rename `_id` → submission_id (R/ingestion.R:324).
    */
  def apply(forms: Seq[(String, DataFrame)]): DataFrame = {
    val frames = forms.map { case (name, df) =>
      val denorm = denormalize(df)
      name -> (if (denorm.columns.contains("_id"))
        denorm.withColumnRenamed("_id", "submission_id") else denorm)
    }
    Restructure.unionByNameTagged("form_name", frames)
  }
}
