package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hash-sketch hot paths.
  *
  * The HOF formulations (`transform`/`aggregate` lambdas in
  * graft.ops.Dedup) evaluate one interpreted lambda call per array element
  * per hash — ~50-100× slower than a single fused eval. These expressions
  * compute the whole sketch in one `eval` per row (CodegenFallback: one
  * virtual call per row, the loop itself is plain JVM code — the next
  * step, `doGenCode`, isn't needed because per-row work dominates).
  *
  * Hash parity: both use Spark's own `XxHash64Function` with the same
  * seeding scheme as the SQL `xxhash64(...)` builtin, so the HOF and
  * expression forms produce bit-identical results (property-tested).
  */
object HashExprs {

  private val SqlSeed = 42L

  /** MinHash signature: for permutation i in [0, numHashes),
    * sig(i) = min over shingles s of xxhash64(s, i)
    * (= hashInt(i, hash(s, seed=42)), matching the SQL builtin's fold).
    */
  case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null
      // base xxhash64 of each shingle, computed once
      val base = new Array[Long](n)
      var j = 0
      while (j < n) {
        base(j) = XxHash64Function.hash(arr.getUTF8String(j), StringType, SqlSeed)
        j += 1
      }
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < numHashes) {
        var k = 0
        var min = Long.MaxValue
        while (k < n) {
          val h = XxHash64Function.hash(i, IntegerType, base(k))
          if (h < min) min = h
          k += 1
        }
        sig(i) = min
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash over a token array: bit j of the output is 1 iff the
    * sum over tokens of ±1 (bit j of `tokenHash`(token)) is positive.
    *
    * `tokenHash` = `"xxhash64"` (Spark's own XxHash64Function, seed 42 —
    * bit-identical to the SQL builtin, the default/scale choice) or
    * `"md5"` (first 16 hex digits of md5 as hi<<32|lo — reproducible in
    * any engine with an md5(), which is what makes the `q_dedup_simhash`
    * gate fully oracle-able; one MessageDigest per row, reset per token).
    * Either way the whole signature is ONE eval per row — the HOF
    * formulation re-inlines the token-hash subtree into each of the 64
    * bit-votes (HOFs are CodegenFallback: no common-subexpression
    * elimination), recomputing every token hash 64× (measured 29 s vs
    * ~1 s on the sf0.1 gate).
    */
  case class SimHash64(child: Expression, tokenHash: String = "xxhash64")
    extends UnaryExpression with CodegenFallback {

    require(tokenHash == "xxhash64" || tokenHash == "md5",
      s"unknown simhash token hash '$tokenHash' (xxhash64 | md5)")

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val md =
        if (tokenHash == "md5") java.security.MessageDigest.getInstance("MD5")
        else null
      val votes = new Array[Int](64)
      var j = 0
      while (j < n) {
        val h =
          if (md == null) XxHash64Function.hash(arr.getUTF8String(j), StringType, SqlSeed)
          else {
            val d = md.digest(arr.getUTF8String(j).getBytes) // digest() resets
            ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
              ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
              ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
              ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        j += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Exact Jaccard of two SORTED string arrays by zero-allocation
    * sorted-merge — the near-dup verify kernel. The builtin
    * `size(array_intersect)/size(array_union)` formulation builds a
    * per-pair hash set through generic ArrayData machinery; on the sf30
    * candidate stream that shape's throughput proved JIT-profile-
    * hostage (the same bimodality the centroid assign had —
    * 7 s or 120 s across identical runs). Here each pair is one merge
    * scan over arrays the caller sorted ONCE per document.
    *
    * CONTRACT: both inputs ascending (UTF8String binary order, i.e.
    * `array_sort`), distinct, null-free — exactly what
    * `wordShinglesFromTokens` + `array_sort` produce. Both-empty yields
    * NaN (0/0), matching the builtin formulation; the property suite
    * pins equality against the builtins on random inputs.
    */
  case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sorted"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      java.lang.Double.valueOf(HashExprs.jaccardSortedEval(a, b))
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.HashExprs.jaccardSortedEval($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaccardSorted =
      copy(left = newLeft, right = newRight)
  }

  /** Runtime helper for [[JaccardSorted]], shared by eval and codegen. */
  def jaccardSortedEval(a: ArrayData, b: ArrayData): Double = {
    val m = a.numElements()
    val n = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < m && j < n) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c.toDouble / (m + n - c)
  }

  /** [[JaccardSorted]] over SORTED long arrays — the verify kernel when
    * the shingle sets are carried as xxhash64 hashes instead of strings
    * (8 B/element vs ~40-80 B: the verify joins' shuffle AND their
    * non-spilling shuffled-hash builds shrink ~7×, which is what keeps
    * the per-task build bounded at corpus scale — see the minhash verify
    * scaladoc in Dedup). Same value as the string kernel on the hashed
    * sets: intersection/union counts are preserved exactly unless two
    * DISTINCT shingles of the same compared pair collide in 64 bits
    * (~|d|²/2⁶⁴ — the identical argument the candidate index already
    * rests on). Contract mirrors [[JaccardSorted]]: ascending, distinct,
    * null-free; both-empty yields NaN.
    */
  case class JaccardSortedLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sorted_long"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      java.lang.Double.valueOf(HashExprs.jaccardSortedLongEval(a, b))
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.HashExprs.jaccardSortedLongEval($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaccardSortedLong =
      copy(left = newLeft, right = newRight)
  }

  /** Runtime helper for [[JaccardSortedLong]], shared by eval and codegen. */
  def jaccardSortedLongEval(a: ArrayData, b: ArrayData): Double = {
    val m = a.numElements()
    val n = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < m && j < n) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c.toDouble / (m + n - c)
  }

  def jaccardSorted(a: Column, b: Column): Column =
    GraftShim.column(JaccardSorted(GraftShim.expression(a), GraftShim.expression(b)))

  def jaccardSortedLong(a: Column, b: Column): Column =
    GraftShim.column(JaccardSortedLong(GraftShim.expression(a), GraftShim.expression(b)))

  def minhashSig(shingles: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(shingles), numHashes))

  def simhash64(tokens: Column, tokenHash: String = "xxhash64"): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens), tokenHash))
}
