package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE segmentation expression.
  *
  * `Bpe.encode`'s reference formulation is N nested `functions.aggregate`
  * folds — correct, but each fold is an interpreted higher-order lambda
  * allocating a Catalyst array per step per row: at sf0.1 the 8-rule
  * encode measured ~19 s of pure fold overhead for ~3M token positions.
  * This expression runs the same greedy left-to-right merges as one JVM
  * loop per word inside whole-stage codegen. BpeSpec pins it
  * bit-identical to the fold on the same corpus (same contract as the
  * hash/vector expressions vs their HOF twins).
  */
object BpeExprs {

  /** Runtime helper shared by eval and codegen: split to UTF-16 code
    * units (bit-compatible with `split(word, "")`, which segments by
    * code unit), then apply each rule in rank order as one greedy
    * non-overlapping pass. Rules array is (lhs, rhs, merged) triples so
    * the hot loop never allocates the merged string.
    */
  def segment(word: UTF8String, rules: Array[Array[String]]): UTF8String = {
    val w = word.toString
    val n = w.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    var syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var len = n
    var rIdx = 0
    while (rIdx < rules.length) {
      val rule = rules(rIdx)
      val l = rule(0); val r = rule(1); val m = rule(2)
      var out = 0
      var in = 0
      while (in < len) {
        if (in + 1 < len && syms(in) == l && syms(in + 1) == r) {
          syms(out) = m
          in += 2
        } else {
          syms(out) = syms(in)
          in += 1
        }
        out += 1
      }
      len = out
      rIdx += 1
    }
    val sb = new java.lang.StringBuilder(w.length + len)
    var k = 0
    while (k < len) {
      if (k > 0) sb.append(' ')
      sb.append(syms(k))
      k += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Space-joined greedy BPE segmentation of a word under `rules`
    * (applied in order); null-preserving.
    */
  case class BpeSegment(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "bpe_segment"

    // (lhs, rhs, merged) triples, precomputed once per expression
    @transient private lazy val ruleArr: Array[Array[String]] =
      rules.map { case (l, r) => Array(l, r, l + r) }.toArray

    override def nullSafeEval(s: Any): Any =
      segment(s.asInstanceOf[UTF8String], ruleArr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val rulesRef = ctx.addReferenceObj("bpeRules", ruleArr, "java.lang.String[][]")
      defineCodeGen(ctx, ev, c => s"graft.functions.BpeExprs.segment($c, $rulesRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeSegment =
      copy(child = newChild)
  }

  /** Column API: greedy BPE segmentation under ordered (lhs, rhs) rules. */
  def bpeSegment(c: Column, rules: Seq[(String, String)]): Column =
    GraftShim.column(BpeSegment(GraftShim.expression(c), rules))
}
