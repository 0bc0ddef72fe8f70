package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Bounds, Matching}

/** Stage 3 — validate_landings (reference R/validation.R:36-106) and the
  * validator family (R/validation-functions.R; SURVEY.md §2.8).
  *
  * Contract per validator: (form_name, survey_id, cleaned columns, alert
  * column); invalid values masked to null, integer alert code recorded.
  * Bounds tables are tiny per-group aggregates → broadcast joins; masks
  * are pure column expressions (the reference's `rowwise()` blocks,
  * R/validation-functions.R:226,301, are needless row-at-a-time escapes —
  * the expressions are vectorizable and stay inside codegen here).
  */
object Validate {

  /** V1 (reference :77-94): the second dplyr assignment overwrites the
    * first, so the live rule is only `landing_date < cutoff` → alert 1 +
    * mask (SURVEY.md V1 decision; the `landing_date > submission_date`
    * predicate is dead in the reference and therefore here too).
    */
  def validateDates(data: DataFrame, cutoff: String = "2020-12-31"): DataFrame = {
    val alert = when(col("landing_date") < lit(cutoff), 1.0)
    data.select(
      col("form_name"), col("survey_id"),
      when(alert.isNull, col("landing_date")).as("landing_date"),
      alert.as("alert_date"))
  }

  /** Shared V2/V3 shape (reference validate_nfishers :112-128 /
    * validate_nboats :147-162): negatives → alert + mask, then global
    * LocScaleB upper outliers on the masked column (logt, back-transform
    * exp(b)-1 per alert_outlier :51).
    *
    * The grouping here is GLOBAL (one group = the whole column), so the
    * single-buffer [[Bounds.CollectExact]] aggregate would collect the
    * entire column on one reducer at scale — the default routes through
    * the two-pass formulation instead (identical numbers); pass
    * [[Bounds.TwoPassApprox]] for bounded-memory sketched medians on
    * planet-scale columns.
    */
  private def validatePositiveOutliers(data: DataFrame, valueCol: String,
                                       alertCode: Double, k: Double,
                                       outName: String,
                                       strategy: Bounds.Strategy): DataFrame = {
    val base = data.select(
      col("form_name"), col("survey_id"),
      when(col(valueCol) < 0, alertCode).as("__alert_neg"),
      when(col(valueCol) < 0, lit(null).cast(DoubleType))
        .otherwise(col(valueCol).cast(DoubleType)).as("__x"))
      .withColumn("__g", lit(1))
    val bounds = Bounds.bounds(base, Seq("__g"), "__x", k, logt = true, strategy)
      .select(col("__g"), (exp(col("upper_up")) - 1).as("__ub"))
    base.join(broadcast(bounds), Seq("__g"), "left")
      .withColumn("__alert", coalesce(
        when(col("__x") > col("__ub"), alertCode), col("__alert_neg")))
      .select(
        col("form_name"), col("survey_id"),
        when(col("__alert").isNull, col("__x")).as(valueCol),
        col("__alert").as(outName))
  }

  def validateNFishers(data: DataFrame, k: Double,
                       strategy: Bounds.Strategy = Bounds.TwoPassExact): DataFrame =
    validatePositiveOutliers(data, "n_fishers", 2.0, k, "alert_n_fishers", strategy)

  def validateNBoats(data: DataFrame, k: Double,
                     strategy: Bounds.Strategy = Bounds.TwoPassExact): DataFrame =
    validatePositiveOutliers(data, "n_boats", 3.0, k, "alert_n_boats", strategy)

  /** V4 (reference get_catch_bounds/validate_catch :183-233 — defined but
    * not wired into validate_landings; kept as a first-class op): upper
    * bound per (gear, catch_taxon, weight_type), back-transform exp(b)
    * (no -1, :191), alert 4 when catch_kg ≥ upper.
    */
  def validateCatch(data: DataFrame, k: Double): DataFrame = {
    val eligible = data.filter(col("catch_taxon") =!= "0" && col("catch_taxon") =!= "no_catch")
    val bounds = Bounds.boundsAgg(eligible,
      Seq("gear", "catch_taxon", "weight_type"), "catch_kg", k, logt = true)
      .select(col("gear"), col("catch_taxon"), col("weight_type"),
        exp(col("upper_up")).as("__ub"))
    data.join(broadcast(bounds), Seq("gear", "catch_taxon", "weight_type"), "left")
      .withColumn("alert_catch", when(col("catch_kg") >= col("__ub"), 4.0))
      .select(col("form_name"), col("survey_id"),
        when(col("alert_catch").isNull, col("catch_kg")).as("catch_kg"),
        col("alert_catch"))
  }

  /** V5 (reference get_pricekg_bounds/validate_pricekg :252-316): two-sided
    * bounds per catch_taxon (back-transform exp(b), :260-263); alert 4
    * masks price_kg AND catch_kg AND catch_price.
    */
  def validatePriceKg(data: DataFrame, k: Double): DataFrame = {
    val eligible = data.filter(col("catch_taxon") =!= "0" && col("catch_taxon") =!= "no_catch")
    val bounds = Bounds.boundsAgg(eligible, Seq("catch_taxon"), "price_kg", k, logt = true)
      .select(col("catch_taxon"), exp(col("lower_low")).as("__lb"), exp(col("upper_up")).as("__ub"))
    data.join(broadcast(bounds), Seq("catch_taxon"), "left")
      .withColumn("alert_price",
        when(col("price_kg") >= col("__ub") || col("price_kg") <= col("__lb"), 4.0))
      .select(col("form_name"), col("survey_id"),
        when(col("alert_price").isNull, col("price_kg")).as("price_kg"),
        when(col("alert_price").isNull, col("catch_kg")).as("catch_kg"),
        when(col("alert_price").isNull, col("catch_price")).as("catch_price"),
        col("alert_price"))
  }

  /** V6/J10 (reference validate_this_imei :339-375): per-row IMEI
    * validation against the deployed-device registry, fully vectorized —
    * the registry is broadcast and the suffix match is a non-equi join +
    * count, not a per-row R function. Returns (survey_id, imei,
    * alert_number).
    */
  def validateImeis(data: DataFrame, imeiCol: String, registry: DataFrame,
                    registryCol: String): DataFrame = {
    val probe = data.select(col("survey_id"), col(imeiCol).as("__raw"))
      .withColumn("__num", abs(expr("try_cast(__raw as double)")))
      .withColumn("__str", col("__num").cast(LongType).cast(StringType))
    val matched = Matching.suffixMatchCount(probe, "__str",
      registry.select(col(registryCol).cast(StringType).as("__reg")), "__reg")
    matched.select(
      col("survey_id"),
      when(col("__raw").isNull || col("__raw") === "0", lit(null).cast(StringType))
        .when(col("__num") < 9999, lit(null).cast(StringType))
        .when(col("match_count") === 1, col("matched_value"))
        .otherwise(lit(null).cast(StringType)).as("imei"),
      when(col("__raw").isNull || col("__raw") === "0", lit(null).cast(IntegerType))
        .when(col("__num") < 9999, lit(1))
        .when(col("match_count") === 1, lit(null).cast(IntegerType))
        .when(col("match_count") > 1, lit(2))
        .otherwise(lit(3)).as("alert_number"))
  }

  /** V7 orchestration (reference validate_landings, R/validation.R:36-106):
    * run V1, V2, V3, V5; re-merge cleaned columns over the preprocessed
    * frame (J5); build the united alert_flags frame (J6). The reference
    * computes alert_flags but never persists it (R/validation.R:91-105) —
    * kept here as a first-class output (SURVEY.md V7 decision).
    */
  case class ValidationResult(validated: DataFrame, alertFlags: DataFrame)

  def apply(preprocessed: DataFrame,
            kNFishers: Double = 2.5, kNBoats: Double = 2.5,
            kPriceKg: Double = 3.0,
            globalBounds: Bounds.Strategy = Bounds.TwoPassExact): ValidationResult = {
    val keys = Seq("form_name", "survey_id")
    val outputs = Seq(
      validateDates(preprocessed),
      validateNFishers(preprocessed, kNFishers, globalBounds),
      validateNBoats(preprocessed, kNBoats, globalBounds),
      validatePriceKg(preprocessed, kPriceKg))

    // J5: cleaned columns re-merge
    val cleaned = outputs
      .map(df => df.select(df.columns.filterNot(_.contains("alert")).map(c => col(s"`$c`")): _*))
      .reduce((a, b) => a.join(b, keys, "left"))
    val replacedCols = cleaned.columns.filterNot(keys.contains)
    val validated = preprocessed
      .drop(replacedCols.toIndexedSeq: _*)
      .join(cleaned, keys, "left")

    // J6: alert unite — concat_ws natively skips nulls (= unite na.rm)
    val alerts = outputs
      .map(df => df.select((keys.map(c => col(c)) ++
        df.columns.filter(_.contains("alert")).map(c => col(s"`$c`"))): _*))
      .reduce((a, b) => a.join(b, keys, "full_outer"))
    // R's unite renders numeric 1 as "1" (not "1.0") — go through int
    val alertCols = alerts.columns.filter(_.contains("alert")).map(c => col(s"`$c`"))
    val flags = alerts.select(
      col("form_name"), col("survey_id"),
      concat_ws("-", alertCols.map(_.cast(IntegerType).cast(StringType)).toIndexedSeq: _*)
        .as("alert_number"))

    ValidationResult(validated, flags)
  }

  /** Fused validate_landings — identical semantics to [[apply]] (equivalence
    * tested in PipelineSpec), restructured for scale exactly like the J1
    * fused gear assembly: every validator derives from the SAME preprocessed
    * frame, so the faithful shape's 4 re-scans + 3 full-outer sort-merge
    * joins + the J5 re-merge join chain collapse to
    *
    *   1. one global-group bounds aggregation for n_fishers + n_boats
    *      (two [[Bounds.locscaleb]] aggregates in a single pass when the
    *      strategy is CollectExact; two-pass/approx strategies route through
    *      [[Bounds.bounds]] per column — still tiny 1-row results),
    *   2. one per-taxon bounds aggregation for price_kg,
    *   3. ONE projection over preprocessed with the 1-row bounds attached
    *      broadcast-style and the taxon bounds broadcast-joined.
    *
    * Data passes: 2 small aggregations + 1 wide scan, zero wide shuffles —
    * vs ~8 scans and 5+ shuffles for the faithful chain. At 100 TB the wide
    * frame is touched once.
    *
    * Caveat shared with [[apply]]'s join semantics: (form_name, survey_id)
    * is assumed unique (it is a surrogate key, P7); with duplicate keys the
    * faithful form fans out in its joins while this form cannot.
    */
  def fused(preprocessed: DataFrame,
            kNFishers: Double = 2.5, kNBoats: Double = 2.5,
            kPriceKg: Double = 3.0,
            globalBounds: Bounds.Strategy = Bounds.TwoPassExact,
            dateCutoff: String = "2020-12-31"): ValidationResult = {
    def maskedBase(valueCol: String): DataFrame = preprocessed.select(
      when(col(valueCol) < 0, lit(null).cast(DoubleType))
        .otherwise(col(valueCol).cast(DoubleType)).as("__x"))
      .withColumn("__g", lit(1))
    // keep the __g group key so the bounds attach via a LEFT join, not a
    // cross join: when a column is entirely null/negative the bounds frame
    // is 0 rows (both Bounds routes drop null-only groups) and a cross join
    // would annihilate the whole dataset — apply() keeps every row with
    // null bounds in that case, and so must this form
    def globalUb(valueCol: String, k: Double, outName: String): DataFrame =
      Bounds.bounds(maskedBase(valueCol), Seq("__g"), "__x", k, logt = true, globalBounds)
        .select(col("__g"), (exp(col("upper_up")) - 1).as(outName))
    val nfUb = globalUb("n_fishers", kNFishers, "__nf_ub")
    val nbUb = globalUb("n_boats", kNBoats, "__nb_ub")
    val eligible = preprocessed.filter(
      col("catch_taxon") =!= "0" && col("catch_taxon") =!= "no_catch")
    val priceBounds = Bounds.boundsAgg(eligible, Seq("catch_taxon"), "price_kg",
      kPriceKg, logt = true)
      .select(col("catch_taxon"),
        exp(col("lower_low")).as("__plb"), exp(col("upper_up")).as("__pub"))

    val joined = preprocessed
      .withColumn("__g", lit(1))
      .join(broadcast(nfUb), Seq("__g"), "left")
      .join(broadcast(nbUb), Seq("__g"), "left")
      .join(broadcast(priceBounds), Seq("catch_taxon"), "left")

    val alertDate = when(col("landing_date") < lit(dateCutoff), 1.0)
    val nfMasked = when(col("n_fishers") < 0, lit(null).cast(DoubleType))
      .otherwise(col("n_fishers").cast(DoubleType))
    val alertNf = coalesce(when(nfMasked > col("__nf_ub"), 2.0),
      when(col("n_fishers") < 0, 2.0))
    val nbMasked = when(col("n_boats") < 0, lit(null).cast(DoubleType))
      .otherwise(col("n_boats").cast(DoubleType))
    val alertNb = coalesce(when(nbMasked > col("__nb_ub"), 3.0),
      when(col("n_boats") < 0, 3.0))
    val alertPrice = when(
      col("price_kg") >= col("__pub") || col("price_kg") <= col("__plb"), 4.0)

    val replaced = Set("landing_date", "n_fishers", "n_boats",
      "price_kg", "catch_kg", "catch_price")
    // apply()'s using-column join emits the join keys first, then the
    // remaining left columns — reproduce that exact column order
    val keys = Seq("form_name", "survey_id")
    val kept = (keys ++ preprocessed.columns
      .filterNot(c => replaced.contains(c) || keys.contains(c)))
      .map(c => col(s"`$c`"))
    val validated = joined.select(kept ++ Seq(
      when(alertDate.isNull, col("landing_date")).as("landing_date"),
      when(alertNf.isNull, nfMasked).as("n_fishers"),
      when(alertNb.isNull, nbMasked).as("n_boats"),
      when(alertPrice.isNull, col("price_kg")).as("price_kg"),
      when(alertPrice.isNull, col("catch_kg")).as("catch_kg"),
      when(alertPrice.isNull, col("catch_price")).as("catch_price")): _*)

    val flags = joined.select(
      col("form_name"), col("survey_id"),
      concat_ws("-", Seq(alertDate, alertNf, alertNb, alertPrice)
        .map(_.cast(IntegerType).cast(StringType)): _*).as("alert_number"))

    ValidationResult(validated, flags)
  }
}
