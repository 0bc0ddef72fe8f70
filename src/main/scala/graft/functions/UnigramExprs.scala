package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Viterbi segmentation for the unigram-LM tokenizer
  * ([[graft.ops.Unigram]]) — the sibling of [[BpeExprs.BpeSegment]]:
  * one codegen'd JVM loop per word, the piece table riding in the plan
  * as a reference object, never a shuffle.
  *
  * Scores are INTEGER micro-nats (each piece's weight is
  * ⌊ln(c/T)·10⁶ + 0.5⌋, precomputed by the trainer), so the DP below is
  * exact integer arithmetic — fully deterministic and replayable in the
  * gate's SQL, which runs the identical DP as unrolled position CTEs
  * with the identical quantization. Tie resolution is total and
  * DP-composable: per cell, max score, then FEWEST pieces, then LONGEST
  * last piece — two candidates equal on all three share the same last
  * piece and therefore the same (already uniquely resolved) predecessor
  * cell, so every cell's winner is unique by induction.
  */
object UnigramExprs {

  /** Weight for a single character absent from the piece table: −10⁴
    * nats in micro-nat units — worse than any trained piece (ln p ≥
    * −ln T ≈ −20 nats for any realistic T) so unknown characters are
    * only ever used when nothing else covers a position, keeping the
    * segmentation total over arbitrary input. Closed-vocabulary gates
    * never hit it (every corpus character seeds the vocabulary and
    * single characters are never pruned), so the oracle SQL omits it.
    */
  val UnkWeight: Long = -10000000000L

  /** Viterbi-best segmentation of `word` under integer piece weights,
    * space-joined. Runtime helper shared by eval and codegen.
    */
  def segment(word: UTF8String,
              pieces: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): UTF8String = {
    val w = word.toString
    if (w.isEmpty) return UTF8String.EMPTY_UTF8
    // The DP runs over CODE POINTS, not UTF-16 units: the trainer's seed
    // phase (Spark substr) and the oracle's CTEs are code-point-indexed,
    // and a unit-indexed DP would split astral characters into lone
    // surrogates (invalid UTF-8 out of fromString) and desynchronize
    // piece lengths against maxPieceLen. offs(i) = UTF-16 offset of code
    // point i; one O(len) boundary scan, free for ASCII words.
    val n = w.codePointCount(0, w.length)
    val offs = new Array[Int](n + 1)
    var ci = 0
    var off = 0
    while (ci < n) { offs(ci) = off; off = w.offsetByCodePoints(off, 1); ci += 1 }
    offs(n) = w.length
    val NEG = java.lang.Long.MIN_VALUE
    val score = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val lastLen = new Array[Int](n + 1)
    var j = 1
    while (j <= n) { score(j) = NEG; j += 1 }
    j = 1
    while (j <= n) {
      var bestScore = NEG
      var bestNp = Int.MaxValue
      var bestL = 0
      val lMax = if (j < maxPieceLen) j else maxPieceLen
      var l = 1
      while (l <= lMax) {
        val i = j - l
        if (score(i) != NEG) {
          val piece = w.substring(offs(i), offs(j))
          val boxed = pieces.get(piece)
          val wgt: Long =
            if (boxed != null) boxed.longValue()
            else if (l == 1) UnkWeight
            else NEG
          if (wgt != NEG) {
            val s = score(i) + wgt
            val cnp = np(i) + 1
            if (s > bestScore ||
              (s == bestScore && (cnp < bestNp || (cnp == bestNp && l > bestL)))) {
              bestScore = s; bestNp = cnp; bestL = l
            }
          }
        }
        l += 1
      }
      score(j) = bestScore; np(j) = bestNp; lastLen(j) = bestL
      j += 1
    }
    // reconstruct via lastLen back-pointers
    val parts = new Array[String](np(n))
    var pos = n
    var k = np(n) - 1
    while (k >= 0) {
      parts(k) = w.substring(offs(pos - lastLen(pos)), offs(pos))
      pos -= lastLen(pos)
      k -= 1
    }
    val sb = new java.lang.StringBuilder(w.length + parts.length)
    var p = 0
    while (p < parts.length) {
      if (p > 0) sb.append(' ')
      sb.append(parts(p))
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }

  case class UnigramSegment(child: Expression, pieces: Seq[(String, Long)],
                            maxPieceLen: Int)
    extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "unigram_segment"

    @transient private lazy val pieceMap: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
      pieces.foreach { case (p, wgt) => m.put(p, java.lang.Long.valueOf(wgt)) }
      m
    }

    override def nullSafeEval(s: Any): Any =
      segment(s.asInstanceOf[UTF8String], pieceMap, maxPieceLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mapRef = ctx.addReferenceObj("unigramPieces", pieceMap,
        "java.util.HashMap<String, Long>")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.UnigramExprs.segment($c, $mapRef, $maxPieceLen)")
    }

    override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
      copy(child = newChild)
  }

  /** Space-joined Viterbi segmentation of a word under integer
    * micro-nat piece weights; null-preserving.
    */
  def unigramSegment(c: Column, pieces: Seq[(String, Long)],
                     maxPieceLen: Int): Column =
    GraftShim.column(UnigramSegment(GraftShim.expression(c), pieces, maxPieceLen))
}
