package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-probe expressions: evaluate a pre-built probabilistic filter
  * against a column, one virtual call per row (CodegenFallback — the
  * probe itself is a handful of hash/bit ops in library code).
  */
object SketchExprs {

  /** Membership probe of a serialized [[BloomFilter]] against a STRING
    * column: false is definitive (the filter has no false negatives),
    * true means "possibly present" at the filter's fpp.
    *
    * The serialized filter travels in the task binary — torrent-broadcast
    * once per executor, deserialized lazily per executor thread-safe-ly
    * (BloomFilter reads are lock-free after construction). Size the
    * filter for its history (~1.2 GB per 10⁹ items at 1% fpp) and
    * persist it across ingestion batches rather than rebuilding.
    */
  case class BloomMightContainString(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    @transient private lazy val filter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

    override def nullSafeEval(input: Any): Any =
      java.lang.Boolean.valueOf(filter.mightContainString(input.toString))

    override protected def withNewChildInternal(newChild: Expression): BloomMightContainString =
      copy(child = newChild)
  }

  def bloomMightContain(c: Column, filter: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    GraftShim.column(BloomMightContainString(GraftShim.expression(c), bos.toByteArray))
  }
}
