package graft.ops

/** Unigram-LM tokenizer: hand-traced seed/EM/prune on a tiny corpus,
  * the Viterbi tie rules (max score → fewest pieces → longest last
  * piece), unknown-character totality, codegen↔eval parity, and
  * determinism across runs.
  */
class UnigramSpec extends graft.SparkTestBase {
  import org.apache.spark.sql.functions.col
  import graft.functions.UnigramExprs

  private def corpus(words: (String, Int)*) = {
    val rows = words.flatMap { case (w, n) => Seq.fill(n)(w) }
    spark.createDataFrame(rows.zipWithIndex.map { case (w, i) => (i.toLong, w) })
      .toDF("doc_id", "text")
  }

  private def seg(word: String, pieces: (String, Long)*): String = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, w) => m.put(p, java.lang.Long.valueOf(w)) }
    UnigramExprs.segment(
      org.apache.spark.unsafe.types.UTF8String.fromString(word), m, 4).toString
  }

  test("hand-traced train: 3×abab 2×ab with vocabSize 3") {
    // Seed (seedSize 3): chars a:8 b:8; multi top-3 by (count desc,
    // piece asc) = ab:8, aba:3, abab:3. EM round 1: T=30; "abab"
    // segments to itself (ln(3/30) beats "ab ab" = 2·ln(8/30)), "ab"
    // to "ab" → usage abab:3 ab:2, chars floor at 1, aba drops. Prune
    // to vocabSize 3: both chars survive, 1 multi slot → abab(3) over
    // ab(2). Post round: usage abab:3, a:2, b:2.
    val df = corpus("abab" -> 3, "ab" -> 2)
    val vocab = Unigram.train(df, "text", vocabSize = 3, maxPieceLen = 4,
      seedSize = 3, emIters = 1, postIters = 1)
    assert(vocab == Seq("a" -> 2L, "abab" -> 3L, "b" -> 2L))
  }

  test("Viterbi picks the max integer score") {
    assert(seg("aab", "ab" -> -1L, "a" -> -2L, "b" -> -3L) == "a ab")
    assert(seg("abab", "ab" -> -1L, "a" -> -2L, "b" -> -3L) == "ab ab")
  }

  test("score tie breaks to fewest pieces, then longest last piece") {
    // "ab"(-2) ties "a b"(-1-1): fewer pieces wins
    assert(seg("ab", "ab" -> -2L, "a" -> -1L, "b" -> -1L) == "ab")
    // "ab c" and "a bc" tie on score and piece count: longer last wins
    assert(seg("abc", "ab" -> -1L, "c" -> -1L, "a" -> -1L, "bc" -> -1L) == "a bc")
  }

  test("unknown characters segment as single-char fallbacks") {
    // 'x' is not in the table; the word still segments totally, and the
    // fallback never displaces a trained piece covering the position
    assert(seg("axb", "ab" -> -1L, "a" -> -2L, "b" -> -2L) == "a x b")
    assert(seg("ab", "ab" -> -1L) == "ab")
  }

  test("astral characters are single DP positions, never lone surrogates") {
    // U+1D11E (musical G clef) is two UTF-16 units; a unit-indexed DP
    // would split it into lone surrogates (invalid UTF-8) and fall to
    // the unk path twice. As ONE code point it is one unk position.
    val clef = new String(Character.toChars(0x1D11E))
    assert(seg(s"a${clef}b", "a" -> -1L, "b" -> -1L) == s"a $clef b")
    // an astral char INSIDE a trained piece stays intact and the piece
    // is reachable (length compared in code points, not units)
    assert(seg(s"a${clef}b", s"a${clef}b" -> -1L, "a" -> -5L, "b" -> -5L)
      == s"a${clef}b")
  }

  test("encoder output matches the shared kernel, via codegen") {
    val df = corpus("abab" -> 2, "ab" -> 1)
    val vocab = Seq("a" -> 2L, "b" -> 2L, "ab" -> 5L)
    val enc = Unigram.encode(df, "text", "doc_id", vocab)
      .orderBy("doc_id", "pos")
      .select(col("word"), col("pieces"), col("n_pieces"))
      .collect()
    // T=9: ln(5/9)·1e6 quantized ≈ -587787; "abab"→"ab ab", "ab"→"ab"
    assert(enc.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq(("abab", "ab ab", 2), ("abab", "ab ab", 2), ("ab", "ab", 1)))
  }

  test("training is deterministic across repeated runs") {
    val df = corpus("low" -> 5, "lower" -> 2, "lowest" -> 1, "widest" -> 3)
    val a = Unigram.train(df, "text", vocabSize = 12, seedSize = 10)
    val b = Unigram.train(df, "text", vocabSize = 12, seedSize = 10)
    assert(a == b)
    // every corpus character survives pruning
    val chars = "lowerstwid".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(a.map(_._1).toSet))
  }

  test("empty and null text produce no token rows") {
    val df = spark.createDataFrame(Seq((1L, ""), (2L, "ab"))).toDF("doc_id", "text")
    val vocab = Seq("a" -> 1L, "b" -> 1L)
    val out = Unigram.encode(df, "text", "doc_id", vocab).collect()
    assert(out.length == 1 && out.head.getString(2) == "ab")
  }
}
