package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece segmentation expression — the BERT-family greedy
  * longest-match-first tokenizer ([[graft.ops.Wordpiece]]; Schuster &
  * Nakajima 2012, the public WordPiece formulation). Unlike BPE's
  * rank-ordered merge replay, WordPiece encoding consults only the
  * VOCABULARY: at each position take the longest piece that matches
  * (initial pieces bare, continuations `##`-prefixed); a position with
  * no match makes the WHOLE word the unknown token — the all-or-nothing
  * BERT semantics. One JVM loop per word inside whole-stage codegen,
  * same posture as [[BpeExprs]]/[[UnigramExprs]]: the vocabulary rides
  * the plan as a reference object, never a shuffle.
  */
object WordpieceExprs {

  /** Runtime helper shared by eval and codegen. `vocab` is the piece
    * set (bare initials + `##`-prefixed continuations); `maxPiece`
    * bounds the longest-match probe so each position costs
    * O(maxPieceLen), not O(|vocab|). Greedy longest-match is
    * deterministic outright: two matching pieces of equal length at one
    * position are the same string.
    */
  def segment(word: UTF8String, vocab: java.util.HashSet[String],
              maxPiece: Int, unk: String): UTF8String = {
    val w = word.toString
    val n = w.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(n + 8)
    var at = 0
    while (at < n) {
      // longest candidate first; continuation pieces carry "##" in the
      // vocab but match only their payload against the word
      val limit = math.min(n - at, if (at == 0) maxPiece else maxPiece - 2)
      var len = limit
      var hit = -1
      while (len >= 1 && hit < 0) {
        val cand =
          if (at == 0) w.substring(0, len)
          else "##" + w.substring(at, at + len)
        if (vocab.contains(cand)) hit = len
        else len -= 1
      }
      if (hit < 0) return UTF8String.fromString(unk) // whole-word unknown
      if (at > 0) sb.append(' ').append("##").append(w, at, at + hit)
      else sb.append(w, 0, hit)
      at += hit
    }
    UTF8String.fromString(sb.toString)
  }

  /** Space-joined greedy WordPiece segmentation under `vocab`;
    * null-preserving; a word with any uncovered position segments to
    * `unk` in full.
    */
  case class WordpieceSegment(child: Expression, vocab: Seq[String],
                              unk: String)
    extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "wordpiece_segment"

    @transient private lazy val vocabSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }
    @transient private lazy val maxPiece: Int =
      if (vocab.isEmpty) 0 else vocab.iterator.map(_.length).max

    override def nullSafeEval(s: Any): Any =
      segment(s.asInstanceOf[UTF8String], vocabSet, maxPiece, unk)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vocabRef = ctx.addReferenceObj("wpVocab", vocabSet, "java.util.HashSet<String>")
      val unkRef = ctx.addReferenceObj("wpUnk", unk, "java.lang.String")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.WordpieceExprs.segment($c, $vocabRef, $maxPiece, $unkRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): WordpieceSegment =
      copy(child = newChild)
  }

  /** Column API: greedy longest-match WordPiece segmentation. */
  def wordpieceSegment(c: Column, vocab: Seq[String],
                       unk: String = "[UNK]"): Column =
    GraftShim.column(WordpieceSegment(GraftShim.expression(c), vocab, unk))
}
