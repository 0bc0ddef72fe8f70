package graft.ops

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage-layout operators (extension): multi-dimensional clustering
  * for data-skipping scans. A parquet file laid out in Z-order carries
  * min/max footer stats that stay TIGHT on every interleaved dimension,
  * so a scan filtering on any of them prunes most files — the standard
  * lakehouse answer to "which single sort order do I pick" (you don't).
  */
object Layout {

  /** Morton (Z-order) value of `cols`: each column is min/max-scaled to
    * `bits` integer bits in one corpus pass (the d-row bounds frame
    * broadcasts, exactly like SQ8's quantization bounds), then the bits
    * interleave column-round-robin — bit i of column j lands at position
    * i·k + j. Everything after the scale step is integer shifts/masks,
    * and the scale step is the same fixed-order IEEE arithmetic the SQ8
    * gate already proves engine-reproducible. A span-0 (constant) column
    * contributes zeros. k·bits must fit a signed long.
    *
    * Returns the input plus a `zvalue` column; write with
    * `.repartitionByRange(col("zvalue")).sortWithinPartitions("zvalue")`
    * to get the clustered layout (the range exchange samples, so the
    * FILE BOUNDARIES are not bit-deterministic — the zvalue itself is,
    * which is what the oracle gate checks).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty && bits >= 1 && cols.length * bits <= 62,
      s"zvalue needs 1..62 interleaved bits total, got ${cols.length}x$bits")
    val k = cols.length
    val levels = (1L << bits) - 1
    // one pass for all bounds: aggregate k mins and k maxes
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast(DoubleType)).as(s"__mn_$c"), max(col(c).cast(DoubleType)).as(s"__mx_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).lineageCut()
    val withBounds = df.crossJoin(broadcast(bounds))
    val scaled: Seq[Column] = cols.map { c =>
      val x = col(c).cast(DoubleType)
      val mn = col(s"__mn_$c")
      val span = col(s"__mx_$c") - col(s"__mn_$c")
      when(span > 0, floor((x - mn) / span * levels).cast(LongType)).otherwise(lit(0L))
    }
    val z: Column = (0 until bits).flatMap { i =>
      scaled.zipWithIndex.map { case (v, j) =>
        shiftleft(shiftright(v, i).bitwiseAND(1L), i * k + j)
      }
    }.reduce(_ + _)
    withBounds.withColumn("zvalue", z)
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }
}
