package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** WordPiece trainer + encoder ([[Wordpiece]]): the hand-traced cases
  * that pin the two axes where WordPiece differs from BPE — the
  * LIKELIHOOD-scored merge argmax and the vocabulary-driven greedy
  * longest-match encoder with whole-word unknown fallback.
  */
class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  /** 10 × "aa", 3 × "bc": raw pair frequency prefers (a,##a) at 10, but
    * the likelihood score inverts the order — (b,##c) scores
    * 3/(3·3) ≈ 0.333 against (a,##a)'s 10/(10·10) = 0.1, because every
    * occurrence of `b` predicts `##c` while `a ##a` is merely common.
    * This is exactly the decision a raw-frequency (BPE) argmax gets
    * wrong, so the trace discriminates the families.
    */
  private lazy val corpus =
    Seq((1L, Array.fill(10)("aa").mkString(" ") + " bc bc bc"))
      .toDF("doc_id", "text")

  test("trainer: likelihood argmax inverts raw-frequency order; payload-stripping merges; exact scores") {
    val rules = Wordpiece.train(corpus, "text", nMerges = 2)
    assert(rules.map(r => (r.step, r.lhs, r.rhs, r.merged, r.pairCount)) ==
      Seq((1, "b", "##c", "bc", 3L), (2, "a", "##a", "aa", 10L)),
      s"rules: $rules")
    assert(rules(0).score == 3.0 / (3.0 * 3.0))
    assert(rules(1).score == 10.0 / (10.0 * 10.0)) // = 0.1
    // the BPE argmax on the same corpus picks the RAW-frequency winner
    // first — the families genuinely decide differently here
    val bpe = Bpe.train(corpus, "text", nMerges = 1)
    assert(bpe.head.lhs == "a" && bpe.head.rhs == "a")
  }

  test("minPairCount filters candidates BEFORE the score argmax; stop only when no pair survives") {
    // "aa"×3 + hapax "xy": (x,##y) is a pair of two globally-unique
    // symbols, so its likelihood score is the maximum 1/(1·1) = 1.0 and
    // it would WIN a floor-less argmax — but its raw count is 1. With
    // the count floor as a stop test on the winner (the old, wrong
    // semantics) training would terminate round 1 with ZERO rules while
    // the frequent (a,##a) pair (count 3, score 3/9) remains eligible.
    // The HF/BERT posture — floor as candidate filter — merges (a,##a)
    // in round 1 and stops in round 2 when nothing survives the floor.
    val c = Seq((1L, "aa aa aa xy")).toDF("doc_id", "text")
    val rules = Wordpiece.train(c, "text", nMerges = 5, minPairCount = 2L)
    assert(rules.map(r => (r.step, r.lhs, r.rhs, r.merged, r.pairCount)) ==
      Seq((1, "a", "##a", "aa", 3L)), s"rules: $rules")
    // floor 1 admits the hapax, whose score 1.0 beats 3/9 — pinning that
    // the filter changed eligibility, not the argmax's score ordering
    val noFloor = Wordpiece.train(c, "text", nMerges = 1, minPairCount = 1L)
    assert(noFloor.head.merged == "xy" && noFloor.head.score == 1.0)
  }

  test("vocabulary: corpus alphabet (continuation-marked) plus merge results") {
    val rules = Wordpiece.train(corpus, "text", nMerges = 2)
    val vocab = Wordpiece.vocabulary(corpus, "text", rules)
    assert(vocab.toSet == Set("a", "b", "##a", "##c", "bc", "aa"))
  }

  test("encoder: greedy longest match, ## continuations, whole-word [UNK] on any uncovered position") {
    val rules = Wordpiece.train(corpus, "text", nMerges = 2)
    val vocab = Wordpiece.vocabulary(corpus, "text", rules)
    val enc = Wordpiece.encode(
      Seq((1L, "aa bca aab xyz b")).toDF("doc_id", "text"),
      "text", "doc_id", vocab)
      .orderBy("pos").select("word", "subwords", "n_subwords")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(enc.toSeq == Seq(
      ("aa", "aa", 1),            // merged piece wins over a ##a
      ("bca", "bc ##a", 2),       // longest-first: bc, then continuation
      ("aab", "[UNK]", 1),        // ##b not in vocab → WHOLE word unknown
      ("xyz", "[UNK]", 1),        // x not even in the alphabet
      ("b", "b", 1)), s"segmentations: ${enc.toSeq}")
  }

  test("segment() edge cases: empty word, empty vocab, custom unk") {
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = new java.util.HashSet[String]()
    assert(graft.functions.WordpieceExprs.segment(
      UTF8String.fromString(""), vocab, 0, "[UNK]").toString == "")
    assert(graft.functions.WordpieceExprs.segment(
      UTF8String.fromString("x"), vocab, 0, "<unk>").toString == "<unk>")
    vocab.add("x"); vocab.add("##y")
    assert(graft.functions.WordpieceExprs.segment(
      UTF8String.fromString("xyy"), vocab, 3, "[UNK]").toString == "x ##y ##y")
  }

  test("trainer over the real corpus is deterministic and its encode covers every token") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r1 = Wordpiece.train(docs, "text", nMerges = 4)
    val r2 = Wordpiece.train(docs, "text", nMerges = 4)
    assert(r1 == r2, "training must be deterministic")
    val vocab = Wordpiece.vocabulary(docs, "text", r1)
    val enc = Wordpiece.encode(docs.limit(50), "text", "doc_id", vocab)
    // every code unit of the corpus is in the alphabet, so the unknown
    // path is unreachable on training data (the oracle gate relies on
    // this; the [UNK] semantics are pinned above on unseen input)
    assert(enc.filter(col("subwords") === "[UNK]").count() == 0)
    // a word's pieces reassemble to the word (strip the ## markers)
    val bad = enc.filter(
      regexp_replace(col("subwords"), lit(" ##|##| "), lit("")) =!= col("word"))
    assert(bad.count() == 0, s"non-reassembling: ${bad.take(3).toSeq}")
  }
}
