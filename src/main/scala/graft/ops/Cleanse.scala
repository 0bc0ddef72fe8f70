package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar cleansing/projection operators (SURVEY.md §2.3):
  *   - P1 coalesce-harmonization    — reference R/preprocessing.R:56-92
  *   - P3 conditional source select — reference R/preprocessing.R:94-249
  *   - P4 value recodes             — reference R/preprocessing.R:357-398
  *   - P5 lenient casts             — reference R/preprocessing.R:291-307
  *   - P7 surrogate key w/ R paste  — reference R/preprocessing.R:49
  *   - J1 suffix-family coalesce    — reference R/preprocessing.R:265-271
  *
  * Everything here is a pure `Column` expression (whole-stage-codegen
  * friendly); no UDFs.
  */
object Cleanse {

  /** P4: chained value recode — first matching `from` wins, otherwise the
    * original value passes through (dplyr `case_when(..., TRUE ~ x)`,
    * reference R/preprocessing.R:360-393).
    */
  def recode(c: Column, mapping: Seq[(String, String)]): Column =
    mapping.foldRight(c) { case ((from, to), acc) =>
      when(c === lit(from), lit(to)).otherwise(acc)
    }

  /** P5: R `as.numeric` semantics — unparseable strings become null with no
    * error (reference R/preprocessing.R:291-307). Spark's `try_cast`
    * matches exactly and stays ANSI-safe.
    */
  def lenientCastDouble(df: DataFrame, cols: Seq[String]): DataFrame = {
    val out = df.columns.map { c =>
      if (cols.contains(c)) expr(s"try_cast(`$c` as double)").as(c)
      else col(s"`$c`")
    }
    df.select(out.toSeq: _*)
  }

  /** P7: R `paste(..., sep)` renders NA as the string "NA" while Spark's
    * `concat_ws` silently skips nulls (reference R/preprocessing.R:49;
    * SURVEY.md §7 trap 1). Faithful port: coalesce each part to "NA".
    */
  def pasteNA(sep: String, parts: Column*): Column =
    concat_ws(sep, parts.map(p => coalesce(p.cast(StringType), lit("NA"))): _*)

  /** J1 tail: coalesce across every column whose name ends with `suffix`,
    * in current column order (reference
    * `coalesce(!!!select(., ends_with(...)))`, R/preprocessing.R:266-270).
    */
  def coalesceFamily(df: DataFrame, suffix: String): Column = {
    val cols = df.columns.filter(_.endsWith(suffix)).map(c => col(s"`$c`"))
    if (cols.isEmpty) lit(null) else coalesce(cols.toIndexedSeq: _*)
  }

  /** P3: select a source column per discriminator value (the gear-effort
    * CASE WHEN bank, reference R/preprocessing.R:94-249). `cases` maps
    * discriminator values to source columns; anything else is null.
    */
  def sourceByDiscriminator(disc: Column, cases: Seq[(Seq[String], Column)]): Column =
    cases.foldRight(lit(null).cast(StringType): Column) { case ((keys, src), acc) =>
      when(disc.isin(keys.map(lit): _*), src).otherwise(acc)
    }
}
