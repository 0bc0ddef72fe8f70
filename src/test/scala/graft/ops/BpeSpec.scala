package graft.ops

/** BPE trainer/encoder: hand-computed merges on the textbook corpus,
  * greedy-overlap semantics, encoder↔trainer state agreement,
  * determinism, and the early-stop contract.
  */
class BpeSpec extends graft.SparkTestBase {
  import org.apache.spark.sql.functions.col

  private def corpus(words: (String, Int)*) = {
    val rows = words.flatMap { case (w, n) => Seq.fill(n)(w) }
    // one word per doc keeps counts explicit
    spark.createDataFrame(rows.zipWithIndex.map { case (w, i) => (i.toLong, w) })
      .toDF("doc_id", "text")
  }

  test("textbook corpus learns the expected first merges by hand") {
    // 5×"low" 2×"lower" 1×"lowest": pair counts — (l,o)=8, (o,w)=8,
    // (w,e)=3, (e,r)=2, (e,s)=1, (s,t)=1. Argmax ties (l,o)/(o,w) at 8
    // break lexicographically → (l,o) first; then (lo,w)=8; then
    // (low,e)=3; after low+e merges, e is consumed so round 4's best is
    // (lowe,r)=2, NOT (e,r).
    val df = corpus("low" -> 5, "lower" -> 2, "lowest" -> 1)
    val rules = Bpe.train(df, "text", nMerges = 4, minPairCount = 1)
    assert(rules.map(r => (r.lhs, r.rhs, r.pairCount)) == Seq(
      ("l", "o", 8L), ("lo", "w", 8L), ("low", "e", 3L), ("lowe", "r", 2L)))
  }

  test("greedy merge is left-to-right non-overlapping (aaaa → aa aa, aaa → aa a)") {
    val df = corpus("aaaa" -> 3, "aaa" -> 2)
    val rules = Bpe.train(df, "text", nMerges = 1, minPairCount = 1)
    assert(rules.head.lhs == "a" && rules.head.rhs == "a")
    // pair count: "aaaa" has 3 adjacent (a,a) pairs ×3 docs, "aaa" has 2 ×2
    assert(rules.head.pairCount == 3 * 3 + 2 * 2)
    val enc = Bpe.encode(df.limit(0).union(corpus("aaaa" -> 1, "aaa" -> 1)),
      "text", "doc_id", rules)
      .orderBy("doc_id").collect()
    assert(enc.map(_.getAs[String]("subwords")).toSeq == Seq("aa aa", "aa a"))
  }

  test("encoding the training corpus reproduces the trainer's final state") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val rules = Bpe.train(df, "text", nMerges = 6)
    assert(rules.size == 6)
    val enc = Bpe.encode(df, "text", "doc_id", rules)
    // the next-best pair of the ENCODED corpus must have a strictly
    // smaller (or equal with later tiebreak) count than the last
    // applied rule — i.e. training genuinely consumed the argmax at
    // every step. Recompute pair counts over the encoded subwords:
    val next = enc.selectExpr("split(subwords, ' ') AS t")
      .where("size(t) >= 2")
      .selectExpr("explode(transform(sequence(0, size(t) - 2), i -> struct(t[i] AS l, t[i + 1] AS r))) AS p")
      .groupBy("p.l", "p.r").count()
      .orderBy(col("count").desc, col("l"), col("r"))
      .limit(1).collect()
    assert(next.nonEmpty && next(0).getLong(2) <= rules.last.pairCount)
    // and every word's subwords concatenate back to the word
    val bad = enc.selectExpr("word", "replace(subwords, ' ', '') AS joined")
      .where("word <> joined").count()
    assert(bad == 0, "subwords must concatenate to the original word")
  }

  test("native BpeSegment expression is bit-identical to the nested-fold twin") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(300)
    val rules = Bpe.train(df, "text", nMerges = 8)
    val expr = Bpe.encode(df, "text", "doc_id", rules)
      .orderBy("doc_id", "pos").collect()
    val fold = Bpe.encodeFold(df, "text", "doc_id", rules)
      .orderBy("doc_id", "pos").collect()
    assert(expr.length == fold.length && expr.length > 0)
    for ((e, f) <- expr.zip(fold)) assert(e == f, s"diverged at $e vs $f")
  }

  test("determinism: same corpus → identical rules across runs") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(300)
    val a = Bpe.train(df, "text", nMerges = 5)
    val b = Bpe.train(df, "text", nMerges = 5)
    assert(a == b)
  }

  test("early stop: minPairCount above the corpus ceiling yields no rules") {
    val df = corpus("ab" -> 2, "cd" -> 1)
    assert(Bpe.train(df, "text", nMerges = 8, minPairCount = 100).isEmpty)
    // single-char words contribute no pairs and must not crash (ANSI
    // sequence/element_at hazard)
    val single = corpus("a" -> 5, "b" -> 3)
    assert(Bpe.train(single, "text", nMerges = 3, minPairCount = 1).isEmpty)
  }

  test("rules fold into encode in rank order (later rules build on earlier)") {
    val df = corpus("abab" -> 4, "abc" -> 1)
    val rules = Bpe.train(df, "text", nMerges = 2, minPairCount = 1)
    // (a,b) count 9 first; then (ab,ab) count 4
    assert(rules.map(r => (r.lhs, r.rhs)) == Seq(("a", "b"), ("ab", "ab")))
    val enc = Bpe.encode(corpus("abab" -> 1, "ababab" -> 1, "abc" -> 1)
      .withColumn("doc_id", org.apache.spark.sql.functions.monotonically_increasing_id()),
      "text", "doc_id", rules)
      .orderBy("word").collect()
    val byWord = enc.map(r => r.getAs[String]("word") -> r.getAs[String]("subwords")).toMap
    assert(byWord("abab") == "abab")
    assert(byWord("ababab") == "abab ab") // greedy: (abab)(ab), not (ab)(abab)
    assert(byWord("abc") == "ab c")
  }
}
