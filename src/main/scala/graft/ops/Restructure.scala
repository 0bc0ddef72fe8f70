package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structural operators: flatten, explode-with-index, union-by-name,
  * renames, splits, column padding/reordering.
  *
  * Re-expresses the reference's restructuring family (SURVEY.md §2.2):
  *   - R1 recursive flatten        — reference R/ingestion.R:375-393
  *   - R2 survey denormalizer      — reference R/ingestion.R:132-272
  *   - R4 string split into cols   — reference R/preprocessing.R:276-280
  *   - R5 rename by regex          — reference R/ingestion.R:84-89
  *   - R6 reorder / relocate       — reference R/validation.R:81-87
  *   - SO3 union-by-name w/ fill   — reference R/ingestion.R:92
  *   - S4 missing-column padding   — reference R/storage.R:39-44
  *
  * All operators are pure `DataFrame => DataFrame` column-level rewrites:
  * no shuffles are introduced — explode is a narrow Generate, renames and
  * flattens are projections, so Catalyst keeps pushdown/pruning intact.
  */
object Restructure {

  /** R1: recursively flatten nested struct columns into top-level columns
    * named by the dot-joined path (reference `flatten_with_names`,
    * R/ingestion.R:375-393; reference joins names with "." too).
    * Arrays are left intact (they need explode, a row-generating op).
    */
  def flattenStructs(df: DataFrame, sep: String = "."): DataFrame = {
    def expand(schema: StructType, prefix: String): Seq[Column] =
      schema.fields.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix$sep${f.name}"
        val colRef = if (prefix.isEmpty) col(s"`${f.name}`")
                     else col(prefix.split(java.util.regex.Pattern.quote(sep))
                       .map(p => s"`$p`").mkString(".") + s".`${f.name}`")
        f.dataType match {
          case st: StructType => expandInner(colRef, st, path, sep)
          case _ => Seq(colRef.as(path))
        }
      }
    def expandInner(parent: Column, st: StructType, prefix: String, sep: String): Seq[Column] =
      st.fields.flatMap { f =>
        val path = s"$prefix$sep${f.name}"
        f.dataType match {
          case inner: StructType => expandInner(parent.getField(f.name), inner, path, sep)
          case _ => Seq(parent.getField(f.name).as(path))
        }
      }
    df.select(expand(df.schema, ""): _*)
  }

  /** R2 core: explode an array column keeping all parent columns, adding a
    * 1-based element index (reference assigns `vessel_number`/`catch_number`
    * starting at 1, R/ingestion.R:162-188,218-258). `outer=true` emits a
    * null placeholder row for empty/null arrays — the reference's
    * "vessel with no catches" placeholder row (R/ingestion.R:224-237).
    * Parent-attribute replication (R/ingestion.R:259-270) is free: explode
    * carries the other columns.
    */
  def explodeWithIndex(df: DataFrame, arrayCol: String, indexName: String,
                       elemName: String, outer: Boolean = true): DataFrame = {
    val gen = if (outer) posexplode_outer(col(arrayCol)) else posexplode(col(arrayCol))
    df.select(col("*"), gen.as(Seq("__pos", elemName)))
      .withColumn(indexName, when(col("__pos").isNotNull, col("__pos") + 1))
      .drop("__pos", arrayCol)
  }

  /** SO3: union frames by column name, padding columns missing on either
    * side with nulls, tagging each input with its origin name (reference
    * `bind_rows(.id = "form_name")`, R/ingestion.R:92).
    */
  def unionByNameTagged(tagCol: String, frames: Seq[(String, DataFrame)]): DataFrame =
    frames.map { case (tag, df) => df.withColumn(tagCol, lit(tag)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** S4: pad any missing columns of `schema` with typed nulls and order
    * columns per the contract (reference pads absent columns with NA and
    * re-applies stored column order, R/storage.R:36-48).
    */
  def conformTo(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = schema.fields.map { f =>
      (present.get(f.name), f.dataType) match {
        case (None, _) => lit(null).cast(f.dataType).as(f.name)
        case (Some(ArrayType(src: StructType, _)), ArrayType(tgt: StructType, _)) =>
          // element-wise pad/reorder: a plain cast requires identical field
          // sets, but forms deliver nested records with varying fields
          // (reference pads required_vars, R/preprocessing.R:328-333)
          conformElement(col(s"`${f.name}`"), src, tgt).as(f.name)
        case _ => col(s"`${f.name}`").cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  private def conformElement(c: Column, src: StructType, tgt: StructType): Column = {
    val present = src.fieldNames.toSet
    transform(c, g => struct(tgt.fields.map { f =>
      (if (present(f.name)) g.getField(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }.toIndexedSeq: _*))
  }

  /** dplyr joins match NA keys by default (`na_matches = "na"`), unlike
    * SQL equi-joins where NULL ≠ NULL. Faithful ports of the reference's
    * join chains over possibly-null keys (e.g. `gear` in the J2 assembly,
    * R/preprocessing.R:275) must use `<=>`; keys are coalesced in the
    * output like Spark's using-column joins do.
    */
  def joinNullSafe(l: DataFrame, r: DataFrame, keys: Seq[String], how: String): DataFrame = {
    val rr = keys.foldLeft(r)((d, k) => d.withColumnRenamed(k, s"__r_$k"))
    val cond = keys.map(k => l(k) <=> rr(s"__r_$k")).reduce(_ && _)
    val joined = l.join(rr, cond, how)
    val keyCols = keys.map(k => coalesce(joined(s"`$k`"), joined(s"`__r_$k`")).as(k))
    val otherCols = joined.columns
      .filterNot(c => keys.contains(c) || c.startsWith("__r_"))
      .map(c => joined(s"`$c`"))
    joined.select(keyCols ++ otherCols: _*)
  }

  /** R5: rename every column through a rewrite function (reference
    * `rename_with(str_remove/str_replace)`, R/ingestion.R:84-89,
    * R/preprocessing.R:50-53). Single projection, not N withColumnRenamed.
    */
  def renameAll(df: DataFrame, rewrite: String => String): DataFrame =
    df.select(df.columns.map(c => col(s"`$c`").as(rewrite(c))).toSeq: _*)

  /** R4: split a delimited string column into typed columns, keeping a
    * subset (reference `tidyr::separate` of "lat lon alt acc" keeping 2,
    * R/preprocessing.R:276-280). Null/short input yields nulls (separate's
    * fill-right behavior).
    */
  def splitInto(df: DataFrame, src: String, delim: String,
                parts: Seq[(String, Int, DataType)], keepSrc: Boolean = false): DataFrame = {
    val tokens = split(col(src), delim)
    val out = parts.foldLeft(df) { case (d, (name, idx, dt)) =>
      // get() (not getItem) — null on out-of-bounds under ANSI mode,
      // matching separate's fill-right NA behavior
      d.withColumn(name, get(tokens, lit(idx)).cast(dt))
    }
    if (keepSrc) out else out.drop(src)
  }

  /** SCD2 (slowly-changing-dimension type 2) validity intervals from a
    * change log: per key, each change row becomes a version valid from
    * its own timestamp until the NEXT change (`valid_to` null on the
    * current version, `is_current` flagging it) — the standard
    * temporal-dimension build that turns an append-only event/change
    * stream into an as-of-joinable history ([[graft.ops.Matching
    * .asOfJoinBackward]] consumes exactly this shape).
    *
    * `seqCol` totalizes the order within equal timestamps (two changes
    * in one tick would otherwise make `valid_to` partition-order-
    * dependent — the determinism contract every operator here carries).
    * Scale shape: ONE shuffle on the key, one window pass — `lead` is a
    * frame-free offset function, so no buffering beyond the sort.
    */
  def scd2(df: DataFrame, keyCols: Seq[String], tsCol: String,
           seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
