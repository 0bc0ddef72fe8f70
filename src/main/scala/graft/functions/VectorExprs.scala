package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused vector-math expressions for embedding columns.
  *
  * The zip_with/aggregate HOF forms in graft.ops.Similarity evaluate an
  * interpreted lambda per vector element; these expressions run the loop
  * in plain JVM code — one eval per row, ~100× less overhead, which is
  * what makes all-pairs verification and LSH bucketing tractable.
  * Arithmetic is identical (sequential left-to-right double accumulation)
  * so results are bit-equal to the HOF forms (property-tested).
  */
object VectorExprs {

  /** Cosine similarity of two array<double> vectors; null on zero norms,
    * mismatched lengths, or null elements.
    */
  case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getDouble(i)
        val y = b.getDouble(i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      if (na > 0 && nb > 0) java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
      else null
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  /** Hyperplane-LSH bucket: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes, weight(p, i) derived from
    * xxhash64 exactly like the HOF form in Similarity.planeWeight
    * (bit-parity property-tested). `planeOffset` selects an independent
    * plane family (planes planeOffset..planeOffset+bits-1) — the
    * OR-amplification hook: each LSH table t uses offset t*bits.
    */
  case class HyperplaneBucket(child: Expression, bits: Int, planeOffset: Int = 0)
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_bucket"

    // weight(p, i) = (pmod(xxhash64(p, i), 2000001) - 1e6) / 1e6, where
    // xxhash64(p, i) folds: hash(i, hash(p, seed=42)) — SQL builtin order
    private def weight(p: Int, i: Int): Double = {
      val h = XxHash64Function.hash(i, IntegerType,
        XxHash64Function.hash(p, IntegerType, 42L))
      val m = 2000001L
      val pm = ((h % m) + m) % m
      (pm - 1000000.0) / 1000000.0
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var bucket = 0L
      var p = 0
      while (p < bits) {
        var proj = 0.0
        var i = 0
        while (i < n) {
          proj += v.getDouble(i) * weight(planeOffset + p, i)
          i += 1
        }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(bucket)
    }

    override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
      copy(child = newChild)
  }

  def cosineSim(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(
      GraftShim.expression(a.cast("array<double>")),
      GraftShim.expression(b.cast("array<double>"))))

  def hyperplaneBucket(v: Column, bits: Int, planeOffset: Int = 0): Column =
    GraftShim.column(HyperplaneBucket(GraftShim.expression(v.cast("array<double>")), bits, planeOffset))
}
