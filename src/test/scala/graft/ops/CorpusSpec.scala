package graft.ops

import graft.SparkTestBase

class CorpusSpec extends SparkTestBase {

  test("corpus-level analytics never broadcast corpus-sized frames") {
    // Scale contract as a plan shape (the dedup twin lives in DedupSpec):
    // tfIdfTopTerms' df-attach side is |vocab|-sized and vocabulary grows
    // with the corpus (Heaps' law) — the only legitimate broadcast in its
    // plan is the 1-row document-count attach. Without the shuffle_hash
    // hint the planner's undersized aggregate estimate driver-builds the
    // whole vocabulary.
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.tfIdfTopTerms(corpus, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    val broadcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
    assert(broadcasts == 1, s"expected only the 1-row N broadcast, got $broadcasts")
    assert(plan.contains("BroadcastNestedLoopJoin"), "the N attach should be the broadcast")
  }

  test("sampleExactKPerStratum: exact k, short strata whole, WindowGroupLimit plan") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"doc text $i", if (i <= 90) "en" else "zh"))
      .toDF("doc_id", "text", "lang")
    val out = Corpus.sampleExactKPerStratum(df, "lang", "text", "doc_id", k = 7)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 7L) // exactly k from the big stratum
    assert(byLang("zh") == 7L) // 10 docs -> top 7 by hash, still exact
    val whole = Corpus.sampleExactKPerStratum(df.filter($"lang" === "zh"),
      "lang", "text", "doc_id", k = 25)
    assert(whole.count() == 10L) // stratum smaller than k kept whole
    // determinism: the kept set is content-keyed, not partitioning-keyed
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.sampleExactKPerStratum(df.repartition(13), "lang", "text",
      "doc_id", k = 7).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // scale contract: the rank filter must compile to WindowGroupLimit so
    // map tasks pre-prune a hot stratum to k rows before the exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("unigramNegLogProb: hand-checked means, token-less docs, broadcast shape") {
    import spark.implicits._
    // corpus tokens: a a b | b c  ->  counts a=2 b=2 c=1, total 5
    val df = Seq((1L, "a a b"), (2L, "b c"), (3L, "   ")).toDF("doc_id", "text")
    val out = Corpus.unigramNegLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, r6(math.log(2.5)))))          // mean of three -ln(2/5)
    assert(out(2L) == ((2L, r6((math.log(2.5) + math.log(5.0)) / 2))))
    assert(out(3L) == ((0L, 0.0)))                        // whitespace-only doc surfaces
    // scale contract: only the 1-row total may broadcast; the vocab join must not
    val plan = Corpus.unigramNegLogProb(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastExchange")) == 1)
  }

  test("bigramNegLogProb: hand-checked Laplace smoothing, short docs surface") {
    import spark.implicits._
    // bigrams: doc1 (a,b)(b,a)(a,b), doc2 (b,a) -> cb[(a,b)]=2, cb[(b,a)]=2,
    // cp[a]=2, cp[b]=2, V=2 -> every p = (2+1)/(2+2) = 0.75
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "   ")).toDF("doc_id", "text")
    val out = Corpus.bigramNegLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = r6(-math.log(0.75))
    assert(out(1L) == ((3L, expect)))
    assert(out(2L) == ((1L, expect)))
    assert(out(3L) == ((0L, 0.0))) // sub-2-token doc surfaces, score 0
    // scale contract: bigram/prefix count attaches shuffle, only V broadcasts
    val plan = Corpus.bigramNegLogProb(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastExchange")) == 1)
  }

  test("reweightMixture: copy counts per weight, determinism, drop/passthrough") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, s"doc number $i text",
      Seq("keep1", "drop0", "half", "x225")(i.toInt % 4))).toDF("doc_id", "text", "lang")
    val out = Corpus.reweightMixture(df, "lang", "text",
      Map("keep1" -> 1.0, "drop0" -> 0.0, "half" -> 0.5, "x225" -> 2.25))
    val n = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("keep1") == 100L)                  // weight 1.0: exact passthrough
    assert(!n.contains("drop0"))                // weight 0: stratum vanishes
    assert(n("half") > 20L && n("half") < 80L)  // ~50 of 100 in expectation
    assert(n("x225") >= 200L && n("x225") <= 300L) // 2 always + ~25% thirds
    // per-row copies are 1..k and content-keyed (stable under repartition)
    val copies = out.filter($"lang" === "x225").groupBy("doc_id").count()
      .collect().map(_.getLong(1)).toSet
    assert(copies.subsetOf(Set(2L, 3L)))
    val a = out.select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Corpus.reweightMixture(df.repartition(17), "lang", "text",
      Map("keep1" -> 1.0, "drop0" -> 0.0, "half" -> 0.5, "x225" -> 2.25))
      .select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // zero shuffle: the whole op is narrow expressions + explode
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("encodeTokens: frequency-ranked ids, OOV -> 0, bounded vocab broadcast") {
    import spark.implicits._
    // counts: b=4, a=3, c=2, d=1 -> vocab(3): b=1, a=2, c=3; d is OOV
    val df = Seq((1L, "a b c a b"), (2L, "b c b a d")).toDF("doc_id", "text")
    val out = Corpus.encodeTokens(df, "text", "doc_id", vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3)))).toMap
    assert(out((1L, 0)) == (("a", 2)) && out((1L, 1)) == (("b", 1)))
    assert(out((2L, 1)) == (("c", 3)))
    assert(out((2L, 4)) == (("d", 0))) // out-of-vocabulary
    assert(out.size == 10)
    // the id attach must be the bounded-vocab broadcast, not a shuffle join
    val plan = Corpus.encodeTokens(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), "text", "doc_id", 24)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("topNgrams compiles to TakeOrderedAndProject, never a global sort") {
    val plan = Corpus.topNgrams(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), "text", 2, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    // per-partition heaps + k-row merge; a Sort node would mean the whole
    // n-gram vocabulary is being globally sorted
    assert(!plan.contains("Sort "), s"global sort in:\n$plan")
  }

  test("selectByQualityBudget: bucket cumsum cut, boundary bucket excluded whole") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.9, 100L), (2L, 0.9, 200L), // bucket 0.9: 300 tokens
      (3L, 0.5, 400L), (4L, 0.5, 100L), // bucket 0.5: 500 (cum 800)
      (5L, 0.1, 500L)                   // bucket 0.1: 500 (cum 1300)
    ).toDF("doc_id", "score", "n_toks")
    def kept(budget: Long) =
      Corpus.selectByQualityBudget(df, "score", "n_toks", budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept(900L) == Set(1L, 2L, 3L, 4L))  // 0.1 bucket overflows the budget
    assert(kept(800L) == Set(1L, 2L, 3L, 4L))  // exact fit keeps the boundary bucket
    assert(kept(799L) == Set(1L, 2L))          // boundary bucket excluded WHOLE
    assert(kept(100L) == Set.empty)            // best bucket alone overflows
    assert(kept(2000L) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("selectByQualityBudgetPerStratum: budgets independent per stratum") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", 0.9, 300L), (2L, "en", 0.5, 300L), (3L, "en", 0.1, 300L),
      (4L, "zh", 0.9, 100L), (5L, "zh", 0.5, 100L), (6L, "zh", 0.1, 100L))
      .toDF("doc_id", "lang", "score", "toks")
    val kept = Corpus.selectByQualityBudgetPerStratum(df, "lang", "score",
      "toks", tokenBudgetPerStratum = 600L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // en: two 300-token buckets fit; zh: ALL three 100-token buckets fit —
    // a global budget would have starved one language to feed the other
    assert(kept == Set(1L, 2L, 4L, 5L, 6L))
  }

  test("lengthHistogram: bucket arithmetic and tail clamp") {
    import spark.implicits._
    val df = Seq(
      ("a", "one two three"),            // 3 tokens -> bucket 0
      ("a", Seq.fill(20)("w").mkString(" ")), // 20 -> bucket 2
      ("a", Seq.fill(99)("w").mkString(" ")), // 99 -> clamped to maxBucket 3
      ("b", ""))                          // 0 tokens -> bucket 0
      .toDF("source", "text")
    val out = Corpus.lengthHistogram(df, "text", "source",
      bucketWidth = 8, maxBucket = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      ("a", 0L, 1L, 3L), ("a", 2L, 1L, 20L), ("a", 3L, 1L, 99L),
      ("b", 0L, 1L, 0L)))
  }

  test("packChunksBucketed: buckets split the cumsum, full chunks tile exactly") {
    import spark.implicits._
    // doc 0: two full 32-token chunks + a 5-token tail;
    // doc 8: one full chunk + one 20-token mid (all in shard 0: nShards=1)
    val chunks = Seq(
      (0L, 1, 32L, "train"), (0L, 2, 32L, "train"), (0L, 3, 5L, "train"),
      (8L, 1, 32L, "train"), (8L, 2, 20L, "train"))
      .toDF("doc_id", "chunk_id", "n_tokens", "split")
    val out = Corpus.packChunksBucketed(chunks, "doc_id", "chunk_id",
      "n_tokens", "split", seqLen = 64, nShards = 1, bucketBounds = Seq(17, 32))
      .select("doc_id", "chunk_id", "len_bucket", "pack_id", "pack_offset")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    // buckets: 32-token chunks -> 2, the 20-token mid -> 1, the 5-token tail -> 0
    assert(out.map(_._3).toSeq == Seq(2, 2, 0, 2, 1))
    // full chunks tile their bucket's packs with zero pad slack:
    // three 32s into seqLen=64 -> offsets 0,32 in pack 0, then 0 in pack 1
    val full = out.filter(_._3 == 2).map(t => (t._4, t._5)).toSeq
    assert(full == Seq((0L, 0L), (0L, 32L), (1L, 0L)))
    // tails/mids start their own packs — never padded against a 32
    assert(out.filter(_._3 == 0).map(t => (t._4, t._5)).toSeq == Seq((0L, 0L)))
    assert(out.filter(_._3 == 1).map(t => (t._4, t._5)).toSeq == Seq((0L, 0L)))
  }

  test("packChunksFFD: capacity respected, beats boundary-respecting next-fit, deterministic") {
    import spark.implicits._
    // NOTE the baseline: packChunks' cumsum stream is contiguous (zero
    // waste, but chunks straddle pack boundaries), so the fair comparison
    // for a boundary-respecting packer is next-fit in arrival order.
    // Three 65s then three 63s: next-fit closes 65|65|65+63|63+63 = 4
    // packs; FFD pairs 65+63 three times = 3 packs (the classic case).
    val lens = Seq(65L, 65L, 65L, 63L, 63L, 63L)
    val chunks = lens.zipWithIndex.map { case (l, i) => (1L, i + 1, l, "train") }
      .toDF("doc_id", "chunk_id", "n_tokens", "split")
    val ffd = Corpus.packChunksFFD(chunks, "doc_id", "chunk_id", "n_tokens",
      "split", seqLen = 128, nShards = 1).collect()
      .map(r => (r.getInt(1), r.getLong(4), r.getLong(5)))
    val byPack = ffd.groupBy(_._2)
    val lensById = lens.zipWithIndex.map { case (l, i) => (i + 1) -> l }.toMap
    // capacity: per-pack token sums never exceed seqLen
    byPack.values.foreach(g => assert(g.map(c => lensById(c._1)).sum <= 128))
    // offsets tile each pack: sorted offsets equal the running sums
    byPack.values.foreach { g =>
      val sorted = g.sortBy(_._3)
      sorted.zip(sorted.scanLeft(0L) { case (acc, c) => acc + lensById(c._1) })
        .foreach { case (c, expectedOffset) => assert(c._3 == expectedOffset) }
    }
    // next-fit baseline computed locally
    val nextFit = lens.foldLeft((0, 0L)) { case ((packs, open), n) =>
      if (open + n <= 128) (math.max(packs, 1), open + n) else (packs + 1, n)
    }._1
    assert(byPack.size < nextFit,
      s"FFD used ${byPack.size} packs, next-fit $nextFit — expected strict win")
    assert(byPack.size == 3)
    // deterministic rerun
    val again = Corpus.packChunksFFD(chunks, "doc_id", "chunk_id", "n_tokens",
      "split", seqLen = 128, nShards = 1).collect()
      .map(r => (r.getInt(1), r.getLong(4), r.getLong(5)))
    assert(again.sortBy(_._1).toSeq == ffd.sortBy(_._1).toSeq)
    // oversize chunk closes its own pack, everything else still fits
    val over = Seq((1L, 1, 200L, "train"), (1L, 2, 60L, "train"), (1L, 3, 60L, "train"))
      .toDF("doc_id", "chunk_id", "n_tokens", "split")
    val o = Corpus.packChunksFFD(over, "doc_id", "chunk_id", "n_tokens",
      "split", seqLen = 128, nShards = 1).collect()
      .map(r => (r.getInt(1), r.getLong(4)))
    val oversizePack = o.find(_._1 == 1).get._2
    assert(o.filter(_._2 == oversizePack).map(_._1).toSeq == Seq(1),
      "the 200-token chunk must sit alone in its pack")
  }

  test("shuffleShard: dense per-shard positions, seed-keyed permutation, no global sort") {
    import spark.implicits._
    val df = (0 until 200).map(_.toLong).toDF("doc_id")
    val out = Corpus.shuffleShard(df, "doc_id", nShards = 8, seed = "ep0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length == 200)
    // every row landed in [0, 8) and positions are dense 1..n per shard
    assert(out.forall { case (_, s, _) => s >= 0 && s < 8 })
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // md5 spreads: no shard grabs more than 3x its uniform share
    assert(out.groupBy(_._2).values.map(_.length).max <= 75)
    // deterministic rerun; a new seed draws a different permutation
    val again = Corpus.shuffleShard(df, "doc_id", nShards = 8, seed = "ep0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    val ep1 = Corpus.shuffleShard(df, "doc_id", nShards = 8, seed = "ep1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(ep1.sortBy(_._1).toSeq != out.sortBy(_._1).toSeq)
    // scale shape: the window partitions by shard — never a single global sort
    val plan = Corpus.shuffleShard(df, "doc_id", nShards = 8, seed = "ep0")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      "shuffleShard must hash-partition by shard, not range-sort globally")
  }

  test("capPerDomain: cap respected, deterministic, seed redraws the sample") {
    import spark.implicits._
    // skewed fixture: one mega-domain (40 docs), two small ones
    val rows = (1L to 40L).map(i => (i, "big")) ++
      Seq((41L, "small"), (42L, "small"), (43L, "tiny"))
    val df = rows.toDF("doc_id", "domain")
    val kept = Corpus.capPerDomain(df, "domain", "doc_id", cap = 5, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "big") == 5)
    assert(kept.count(_._2 == "small") == 2) // below cap → untouched
    assert(kept.count(_._2 == "tiny") == 1)
    // deterministic: identical rerun
    val again = Corpus.capPerDomain(df, "domain", "doc_id", cap = 5, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.sorted.toSeq == kept.sorted.toSeq)
    // a different seed draws a different big-domain sample (md5-keyed)
    val other = Corpus.capPerDomain(df, "domain", "doc_id", cap = 5, seed = "s2")
      .collect().filter(_.getString(1) == "big").map(_.getLong(0)).toSet
    assert(other != kept.filter(_._2 == "big").map(_._1).toSet)
  }

  test("hllDistinct: both estimator branches, dup-idempotence, shard-merge = whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    // 5000 distinct keys, one group → raw α·m²/harmonic branch
    val big = (1 to 5000).map(i => ("g", s"key$i")).toDF("grp", "k")
    val est = Corpus.hllDistinct(big, "grp", "k").collect().head.getDouble(1)
    info(s"HLL m=16 estimate for 5000 distinct = $est")
    assert(math.abs(est - 5000) / 5000.0 < 0.5, s"raw-branch estimate off: $est")
    // 20 distinct keys → linear-counting branch (E <= 2.5m, V > 0)
    val small = (1 to 20).map(i => ("g", s"key$i")).toDF("grp", "k")
    val estS = Corpus.hllDistinct(small, "grp", "k").collect().head.getDouble(1)
    assert(math.abs(estS - 20) < 12, s"linear-counting estimate off: $estS")
    // duplicate rows cannot move a max-register sketch
    val dup = Corpus.hllDistinct(big.union(big), "grp", "k").collect().head.getDouble(1)
    assert(dup == est)
    // mergeability: shard the corpus, max-merge the register frames, and
    // the estimate is EXACTLY the whole-corpus one — the 100 TB property
    val sh1 = Corpus.hllRegisters(big.filter($"k" < "key3"), "grp", "k")
    val sh2 = Corpus.hllRegisters(big.filter(!($"k" < "key3")), "grp", "k")
    val merged = sh1.union(sh2).groupBy("__g", "__reg").agg(max("__mr").as("__mr"))
    val estM = Corpus.hllEstimate(merged, "grp").collect().head.getDouble(1)
    assert(estM == est)
  }

  test("rrfFuse: hand-computed fusion, absent ids contribute zero, tie order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ranking A: 1 > 2 > 3; ranking B: 3 > 2 (id 1 absent from B)
    val a = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("id", "s")
    val b = Seq((2L, 0.5), (3L, 2.0)).toDF("id", "s")
    val got = Corpus.rrfFuse(Seq((a, "s"), (b, "s")), "id", kRrf = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == r9(1.0 / 61))             // rank 1 in A, absent in B
    assert(got(2L) == r9(1.0 / 62 + 1.0 / 62))  // rank 2 in both
    assert(got(3L) == r9(1.0 / 63 + 1.0 / 61))  // rank 3 in A, rank 1 in B
    // score ties order by id: two equal scores rank deterministically
    val t = Seq((5L, 1.0), (4L, 1.0)).toDF("id", "s")
    val gotT = Corpus.rrfFuse(Seq((t, "s")), "id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotT(4L) == r9(1.0 / 61) && gotT(5L) == r9(1.0 / 62))
  }

  test("topPmiBigrams: hand-computed PMI, minCount floor, deterministic cut") {
    import spark.implicits._
    // tokens T=9, bigrams B=6; (new,york) c=2, cu(new)=2, cu(york)=2
    // PMI = ln((2/6)/((2/9)·(2/9))) = ln(6.75)
    val df = Seq((1L, "new york is big"), (2L, "new york city"), (3L, "big city"))
      .toDF("doc_id", "text")
    val got = Corpus.topPmiBigrams(df, "text", "doc_id", minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(("new", "york", 2L, r6(math.log(6.75)))),
      s"got ${got.toSeq}")
  }

  test("globalRowNumber: equals the single-reducer definition, ties, skew, repartition") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    // values with heavy ties and skew: 40% of rows share value 7
    val rows = (1 to 500).map(i => (i.toLong, if (i % 5 < 2) 7L else (i % 83).toLong))
    val df = rows.toDF("id", "v").repartition(11)
    val got = Corpus.globalRowNumber(df, "v", "id", buckets = 16)
      .select("id", "global_row").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = df.withColumn("global_row",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "global_row").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == naive)
    // constant column: degenerates to one bucket but stays correct
    val const = (1 to 50).map(i => (i.toLong, 1L)).toDF("id", "v")
    val gotC = Corpus.globalRowNumber(const, "v", "id", buckets = 8)
      .select("id", "global_row").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotC == (1 to 50).map(i => i.toLong -> i.toLong).toMap)
    // SAMPLED-cuts path (n > sampleCap): boundaries come from a hash
    // sample, the numbering must stay exactly the definition anyway
    val gotS = Corpus.globalRowNumber(df, "v", "id", buckets = 16, sampleCap = 100L)
      .select("id", "global_row").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotS == naive)
    // null order values: dedicated bucket BELOW every value bucket, so
    // the numbering matches Spark's own nulls-first window exactly (they
    // must not fall through the CASE chain into the last bucket)
    val withNulls = (1 to 200).map(i =>
      (i.toLong, if (i % 7 == 0) None else Some((i % 31).toLong)))
      .toDF("id", "v").repartition(5)
    val gotN = Corpus.globalRowNumber(withNulls, "v", "id", buckets = 8)
      .select("id", "global_row").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naiveN = withNulls.withColumn("global_row",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "global_row").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(gotN == naiveN)
    // sampled-cuts path with nulls present (nulls are excluded from the
    // cut sample, numbered via their own bucket all the same)
    val gotNS = Corpus.globalRowNumber(withNulls, "v", "id", buckets = 8, sampleCap = 100L)
      .select("id", "global_row").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotNS == naiveN)
    // ALL-null order column: the cut frame is empty, which must NOT drop
    // rows through the crossJoin — every row is numbered 1..n by id
    val allNull = (1 to 40).map(i => (i.toLong, None: Option[Long]))
      .toDF("id", "v").repartition(3)
    val gotAN = Corpus.globalRowNumber(allNull, "v", "id", buckets = 8)
      .select("id", "global_row").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotAN == (1 to 40).map(i => i.toLong -> i.toLong).toMap)
    // mostly-null at n > sampleCap: the sample fraction must come from
    // the NON-null count (computed from the total it would under-sample
    // the few orderable rows to an empty cut table and drop everything)
    val sparse = (1 to 300).map(i =>
      (i.toLong, if (i <= 5) Some(i.toLong) else None))
      .toDF("id", "v").repartition(4)
    val gotSp = Corpus.globalRowNumber(sparse, "v", "id", buckets = 8, sampleCap = 100L)
      .select("id", "global_row").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naiveSp = sparse.withColumn("global_row",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "global_row").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(gotSp == naiveSp && gotSp.size == 300)
  }

  test("winsorize: exact-rank band, clamp both tails, pass-through interior") {
    import spark.implicits._
    // one group, values 1..20: lo = value at ceil(0.05·20)=rank 1 → 1,
    // hi = value at ceil(0.95·20)=rank 19 → 19; only 20 clips (→19)
    val df = (1 to 20).map(i => ("g", i.toLong)).toDF("grp", "v")
    val got = Corpus.winsorize(df, "grp", "v", 0.05, 0.95)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(20L) == 19L)
    assert(got(1L) == 1L && got(10L) == 10L && got(19L) == 19L)
    // second group with a low outlier: lo clamps upward
    val df2 = (Seq(("h", -100L)) ++ (1 to 19).map(i => ("h", i.toLong))).toDF("grp", "v")
    val got2 = Corpus.winsorize(df2, "grp", "v", 0.05, 0.95)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got2(-100L) == -100L || got2(-100L) == 1L) // rank-1 value IS -100 at n=20
    // with pLo at 0.1 the cut moves above the outlier
    val got3 = Corpus.winsorize(df2, "grp", "v", 0.1, 0.95)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got3(-100L) == 1L, s"low outlier must clamp to p10=1, got ${got3(-100L)}")
  }

  test("bm25Scores: hand-computed score, rare-term idf dominance, no-match zero") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark spark"),   // tf(spark)=3, dl=3
      (2L, "spark query"),         // both terms, dl=2
      (3L, "other words only"))    // no query terms → 0
      .toDF("doc_id", "text")
    val got = Corpus.bm25Scores(df, "text", "doc_id", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, avgdl=(3+2+3)/3; df(spark)=2, df(query)=1
    val n = 3.0; val avgdl = 8.0 / 3
    def idf(dfT: Double) = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
    def norm(tf: Double, dl: Double) =
      tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(3L) == 0.0)
    assert(got(1L) == r6(idf(2) * norm(3, 3)))
    assert(got(2L) == r6(idf(2) * norm(1, 2) + idf(1) * norm(1, 2)))
    // the rarer term (query, df=1) must out-idf the common one
    assert(idf(1) > idf(2))
  }

  test("weightedSampleK: determinism, seed redraw, zero-weight exclusion, weight bias") {
    import spark.implicits._
    val df = (1 to 200).map(i =>
      (i.toLong, "g", if (i <= 20) 50.0 else 1.0)).toDF("id", "grp", "w")
    def pick(seed: String) = Corpus.weightedSampleK(df, "grp", "id", "w", 10, seed)
      .select("id").collect().map(_.getLong(0)).toSet
    val a = pick("s1")
    assert(a == pick("s1"), "same seed must redraw the identical sample")
    assert(a != pick("s2"), "a fresh seed must redraw")
    assert(a.size == 10)
    // partition invariance
    val ar = Corpus.weightedSampleK(df.repartition(13), "grp", "id", "w", 10, "s1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ar == a)
    // zero/negative weights can never be drawn
    val z = (1 to 5).map(i => (i.toLong, "g", 0.0)) ++ Seq((6L, "g", -1.0), (7L, "g", 2.0))
    assert(Corpus.weightedSampleK(z.toDF("id", "grp", "w"), "grp", "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(7L))
    // bias: ids 1-20 hold weight 1000 of 1180 (~85%); over 8 seeds × k=10
    // picks, the heavy block must clearly dominate (binomial tail makes
    // < 48/80 astronomically unlikely)
    val heavy = (1 to 8).map(s => pick(s"seed$s").count(_ <= 20)).sum
    assert(heavy >= 48, s"weight bias too weak: $heavy/80 heavy picks")
  }

  test("kneserNeyNegLogProb: hand-computed discount/backoff, continuation semantics") {
    import spark.implicits._
    // corpus: "a b", "c b", "a d" → cb all 1; cp(a)=2 n1r(a)=2, cp(c)=1;
    // nl(b)=2, nl(d)=1; B=3 bigram types, V=4 → Pc(b)=3/7, Pc(d)=2/7
    val df = Seq((1L, "a b"), (2L, "c b"), (3L, "a d")).toDF("doc_id", "text")
    val got = Corpus.kneserNeyNegLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pBA = 0.25 / 2.0 + (0.75 * 2.0 / 2.0) * (3.0 / 7)  // P(b|a)
    val pBC = 0.25 / 1.0 + (0.75 * 1.0 / 1.0) * (3.0 / 7)  // P(b|c)
    val pDA = 0.25 / 2.0 + (0.75 * 2.0 / 2.0) * (2.0 / 7)  // P(d|a)
    assert(got(1L) == ((1L, r6(-math.log(pBA)))))
    assert(got(2L) == ((1L, r6(-math.log(pBC)))))
    assert(got(3L) == ((1L, r6(-math.log(pDA)))))
    // continuation semantics: "francisco" is FREQUENT but single-context,
    // "cat" rarer per-bigram but multi-context — KN's backoff mass makes
    // the multi-context continuation cheaper than raw frequency suggests:
    // within the shared context "the", P(cat|the) > P(francisco|the)
    // would need both; instead assert on the backoff-visible effect that
    // a single-context word scores WORSE than a multi-context word of
    // equal bigram count in a fresh context pairing
    val corpus = ((1 to 5).map(i => (10L + i, "san francisco")) ++
      Seq((20L, "the cat"), (21L, "a cat"), (22L, "my cat"), (23L, "big cat"),
        (30L, "san cat"))).toSeq.toDF("doc_id", "text")
    val scores = Corpus.kneserNeyNegLogProb(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // counts: B = 6 bigram types, V = 7 unigrams; cp(san) = 6, n1r(san) = 2;
    // nl(cat) = 5 (five distinct left contexts), nl(francisco) = 1.
    // (san,francisco) c=5 vs (san,cat) c=1 share the context — the c=5
    // bigram must outscore, and the c=1 bigram's exact value carries the
    // continuation mass: 0.75·(2/6)·Pc(cat) with Pc(cat) = (5+1)/(6+7)
    assert(scores(11L) < scores(30L), "c=5 bigram must outscore c=1")
    val pSanCat = (1 - 0.75) / 6.0 + (0.75 * 2.0 / 6.0) * ((5.0 + 1) / (6.0 + 7.0))
    assert(scores(30L) == r6(-math.log(pSanCat)))
  }

  test("kmv: capped sorted sketch, exact branch, estimate band, dup/partition invariance") {
    import spark.implicits._
    val big = (1 to 1000).map(i => ("g", s"key$i")).toDF("grp", "k")
    val sk = Corpus.kmvSketch(big, "grp", "k", k = 32).collect().head.getSeq[Long](1)
    assert(sk.length == 32 && sk == sk.sorted && sk.distinct.length == 32)
    // estimator band on 1000 distinct at k=32 (std err ~ 1/sqrt(k-2) ≈ 18%)
    val est = Corpus.kmvDistinct(big, "grp", "k", k = 32)
      .collect().head.getDouble(2)
    info(s"KMV k=32 estimate for 1000 distinct = $est")
    assert(math.abs(est - 1000) / 1000.0 < 0.6, s"estimate off: $est")
    // exact branch: fewer distinct keys than k → the count itself
    val small = (1 to 7).map(i => ("g", s"key$i")).toDF("grp", "k")
    val row = Corpus.kmvDistinct(small, "grp", "k", k = 32).collect().head
    assert(row.getLong(1) == 7 && row.getDouble(2) == 7.0)
    // duplicates and partitioning cannot move a k-min-distinct sketch —
    // the map-side-capped merge is order/shard independent (100 TB property)
    val dup = Corpus.kmvSketch(big.union(big).repartition(17), "grp", "k", k = 32)
      .collect().head.getSeq[Long](1)
    assert(dup == sk)
  }

  test("kmvOverlapReport: identical groups jaccard 1, disjoint 0, half-overlap sane") {
    import spark.implicits._
    val a = (1 to 400).map(i => ("a", s"key$i"))
    val sameAsA = (1 to 400).map(i => ("b", s"key$i"))
    val disjoint = (1 to 400).map(i => ("c", s"other$i"))
    val half = (201 to 600).map(i => ("d", s"key$i"))
    val df = (a ++ sameAsA ++ disjoint ++ half).toDF("grp", "k")
    val rep = Corpus.kmvOverlapReport(df, "grp", "k", k = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(5), r.getDouble(6)))).toMap
    val (jAb, _) = rep(("a", "b"))
    assert(jAb == 1.0, s"identical groups must estimate jaccard 1, got $jAb")
    val (jAc, iAc) = rep(("a", "c"))
    assert(jAc == 0.0 && iAc == 0.0)
    // a vs d: true jaccard 200/600 = 1/3; the ρ/k estimator at k=32 is
    // coarse — accept a generous band, the oracle pins exact values
    val (jAd, _) = rep(("a", "d"))
    assert(jAd > 0.05 && jAd < 0.7, s"half-overlap estimate off: $jAd")
  }

  test("cms: never under-counts, exact on light load, shard counters sum to whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    // skewed stream: "hot" ×500, "warm" ×50, 200 singletons
    val rows = Seq.fill(500)("hot") ++ Seq.fill(50)("warm") ++
      (1 to 200).map(i => s"t$i")
    val df = rows.toDF("k")
    val cand = (Seq("hot", "warm", "t1", "absent")).toDF("k")
    val counters = Corpus.cmsCounters(df, "k")
    val est = Corpus.cmsEstimate(counters, cand, "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS property: estimate >= truth; at 750 items over 4×1024 counters
    // collisions are rare, so the heavy keys should be near-exact
    assert(est("hot") >= 500 && est("hot") <= 510)
    assert(est("warm") >= 50 && est("warm") <= 60)
    assert(est("t1") >= 1)
    assert(est("absent") >= 0) // an absent key may collide but never goes negative
    // mergeability: counters from two shards SUM to the whole-corpus frame
    val (a, b) = (rows.take(300), rows.drop(300))
    val merged = Corpus.cmsCounters(a.toDF("k"), "k")
      .union(Corpus.cmsCounters(b.toDF("k"), "k"))
      .groupBy("__j", "__b").agg(sum("c").as("c"))
    val estM = Corpus.cmsEstimate(merged, cand, "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estM == est)
  }

  test("exactQuantiles: hand-checked rank picks, ties, single-row groups") {
    import spark.implicits._
    // group a: values 1..10 → p50 = rank ceil(5.0)=5 → 5; p90 = rank 9; p99 = rank 10
    // group b: all-equal values; group c: a single row
    val df = ((1 to 10).map(i => ("a", i.toLong)) ++
      Seq(("b", 7L), ("b", 7L), ("b", 7L), ("c", 42L))).toDF("g", "v")
    val got = Corpus.exactQuantiles(df, "g", "v", Seq(0.5, 0.9, 0.99))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 5L, 9L, 10L), ("b", 7L, 7L, 7L), ("c", 42L, 42L, 42L)))
    // partition-parallel window — never a global range sort
    val plan = Corpus.exactQuantiles(df, "g", "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      "per-group quantiles must hash-partition by group, not range-sort globally")
  }

  test("quantileSketch: exact below 2^(subBits+1), bucket lower bounds, error band vs exact") {
    import spark.implicits._
    // group a: values 1..200 at subBits 2 — values < 8 exact, larger
    // ones keep their top 3 bits: 200 = 0b11001000 → bucket 0b11000000=192
    val df = (1 to 200).map(i => ("a", i.toLong)).toDF("g", "v")
    val sk = Corpus.quantileSketch(df, "g", "v", subBits = 2)
    val buckets = sk.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(buckets(1L) == 1L && buckets(7L) == 1L)      // exact region
    assert(buckets(192L) == 9L)                          // 192..200
    // every bucket id is its own lower bound: only the top 3 bits set
    assert(buckets.keys.filter(_ >= 8).forall { b =>
      val s = 64 - java.lang.Long.numberOfLeadingZeros(b) - 3
      (b >> s) << s == b
    })
    assert(sk.agg(org.apache.spark.sql.functions.sum("c")).head.getLong(0) == 200L)
    // estimates bracket the exact quantiles from below within 2^-subBits
    val est = Corpus.quantileSketchEstimate(sk, "g", Seq(0.5, 0.9, 0.99)).head
    val exact = Corpus.exactQuantiles(df, "g", "v", Seq(0.5, 0.9, 0.99)).head
    Seq(1, 2, 3).foreach { i =>
      val e = est.getLong(i).toDouble; val t = exact.getLong(i).toDouble
      assert(e <= t && t < e * (1 + 1.0 / 4) + 1, s"col $i: est $e vs true $t")
    }
  }

  test("quantileSketch: merge of shard frames equals the whole-corpus frame") {
    import spark.implicits._
    val a = (1 to 500).map(i => ("g", (i * 37 % 1000).toLong)).toDF("g", "v")
    val b = (1 to 300).map(i => ("g", (i * 91 % 5000).toLong)).toDF("g", "v")
    val whole = Corpus.quantileSketch(a.union(b), "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Corpus.quantileSketch(a, "g", "v")
      .union(Corpus.quantileSketch(b, "g", "v"))
      .groupBy("g", "bucket").agg(org.apache.spark.sql.functions.sum("c").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("quantileSketch: negative values fail fast, nulls drop") {
    import spark.implicits._
    val bad = Seq(("g", 5L), ("g", -1L)).toDF("g", "v")
    val ex = intercept[Exception] {
      Corpus.quantileSketch(bad, "g", "v").collect()
    }
    assert(ex.getMessage != null)
    val withNull = Seq(("g", Some(5L)), ("g", None)).toDF("g", "v")
    assert(Corpus.quantileSketch(withNull, "g", "v")
      .agg(org.apache.spark.sql.functions.sum("c")).head.getLong(0) == 1L)
  }

  test("zvalue: hand-computed Morton codes on a 4x4 grid, locality property") {
    import spark.implicits._
    // x, y in {0, 1, 2, 3} with bits = 2 → the textbook 16-cell Z curve:
    // z = interleave(x bit i → 2i, y bit i → 2i+1); bounds are [0, 3] so
    // the min/max scale maps each coordinate to itself
    val grid = (for { x <- 0 to 3; y <- 0 to 3 } yield (x * 4 + y, x, y)).toDF("id", "x", "y")
    val got = Layout.withZValue(grid, Seq("x", "y"), bits = 2)
      .select("x", "y", "zvalue").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def morton(x: Int, y: Int) =
      ((x & 1) | ((y & 1) << 1) | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)).toLong
    for { x <- 0 to 3; y <- 0 to 3 }
      assert(got((x, y)) == morton(x, y), s"($x,$y): ${got((x, y))} != ${morton(x, y)}")
    // locality: sorting by z, consecutive cells are near in (x, y) —
    // total Manhattan distance along the curve beats the row-major sort
    val byZ = got.toSeq.sortBy(_._2).map(_._1)
    def pathCost(p: Seq[(Int, Int)]) =
      p.sliding(2).map { case Seq(a, b) => (a._1 - b._1).abs + (a._2 - b._2).abs }.sum
    val rowMajor = (for { x <- 0 to 3; y <- 0 to 3 } yield (x, y)).toSeq
    assert(pathCost(byZ) < pathCost(rowMajor.sortBy(c => (c._2, c._1))) + 10)
    // constant column contributes zero bits
    val flat = Seq((1, 7, 5), (2, 7, 9)).toDF("id", "c", "v")
    val zs = Layout.withZValue(flat, Seq("c", "v"), bits = 4)
      .select("id", "zvalue").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(zs(1) == 0L) // v=min → scaled 0; c constant → 0
    assert(zs(2) == (0 to 3).map(i => 1L << (2 * i + 1)).sum) // v=max → all v-bits set
  }

  test("profileColumns: row/null counts exact, distinct estimate sane, null-only column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Option.empty[String]),
      (2L, Some("b"), None),
      (3L, None, None),
      (4L, Some("a"), None)).toDF("id", "s", "dead")
    val got = Corpus.profileColumns(df, Seq("id", "s", "dead"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toList
    val byName = got.map(x => x._1 -> x).toMap
    assert(byName("id") == ("id", 4L, 0L, byName("id")._4))
    assert(byName("s")._3 == 1L) // one null
    assert(byName("dead") == ("dead", 4L, 4L, -1.0)) // all-null → no estimate
    // distinct estimates in the right ballpark (m=16 → generous bands)
    assert(byName("id")._4 > 1 && byName("id")._4 < 12)
    assert(byName("s")._4 > 0.5 && byName("s")._4 < 8)
  }

  test("repetition query joins per-doc bigram stats without broadcasting them") {
    val plan = graft.SparkEntry.catalog.find(_.name == "q_curate_repetition").get
      .fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "per-doc bigram aggregate (corpus-sized) must not be broadcast")
  }

  test("nbQualityScore matches a hand-computed Naive Bayes log-odds") {
    import spark.implicits._
    // training corpus: 2 reference docs, 2 crawl docs
    //   pos tokens: good good fine | good text   → tp=5, cp(good)=3 cp(fine)=1 cp(text)=1
    //   neg tokens: spam spam      | spam text   → tn=4, cn(spam)=3 cn(text)=1
    // vocab = {good, fine, text, spam} → V=4; priors dp=dn=2 → prior 0
    val train = Seq(
      (0L, "good good fine", true), (1L, "good text", true),
      (2L, "spam spam", false), (3L, "spam text", false))
      .toDF("doc_id", "text", "is_ref")
    def w(cp: Long, cn: Long): Double =
      math.log((cp + 1.0) / (5 + 4)) - math.log((cn + 1.0) / (4 + 4))
    val expect = Map(
      // "good spam": w(good)=ln(4/9)-ln(1/8), w(spam)=ln(1/9)-ln(4/8)
      10L -> (w(3, 0) + w(0, 3)),
      // OOV-only doc: 2 unseen tokens, each the smoothing-floor constant
      11L -> 2 * w(0, 0),
      // zero tokens → exactly the (zero) prior
      12L -> 0.0)
    val score = Seq((10L, "good spam"), (11L, "zz yy"), (12L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.nbQualityScore(train, "is_ref", score, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    expect.foreach { case (id, e) =>
      assert(math.abs(got(id) - BigDecimal(e).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc $id: got ${got(id)} want $e")
    }
    // and n_tokens rides along
    val nt = Corpus.nbQualityScore(train, "is_ref", score, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nt == Map(10L -> 2L, 11L -> 2L, 12L -> 0L))
  }

  test("dsirScores/dsirSelect: target-like docs outrank crawl-like docs") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "alpha beta alpha"), (1L, "beta alpha beta"), (2L, "alpha beta"),
      (3L, "noiseqq noisevv"), (4L, "noiseww noisexx"), (5L, "noiseyy noisezz"),
      (6L, "")).toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta alpha beta"),
      (101L, "beta alpha")).toDF("doc_id", "text")
    val scores = Corpus.dsirScores(corpus, target, "text", "doc_id", dim = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // DSIR guarantees the ORDERING, not the sign: the source model is
    // fit on the whole corpus, so target-like mass is in both models and
    // Laplace smoothing shifts absolute values — but every
    // target-vocabulary doc must outrank every noise doc, and the
    // zero-token doc scores exactly 0 (empty product)
    val targetMin = Seq(0L, 1L, 2L).map(scores).min
    val noiseMax = Seq(3L, 4L, 5L).map(scores).max
    assert(targetMin > noiseMax, scores.toString)
    assert(scores(6L) == 0.0)
    // top-3: the empty doc's 0 ranks first here (all scores negative on
    // this tiny corpus), then doc 2, then the 0-vs-1 exact tie (both
    // texts are symmetric under the symmetric alpha/beta weights) broken
    // to the smaller id
    val picked = Corpus.dsirSelect(corpus, target, "text", "doc_id",
      k = 3, dim = 256).collect().map(_.getLong(0)).toSet
    assert(picked == Set(6L, 2L, 0L), picked.toString)
  }

  test("pplBuckets: per-language tertile labels ordered by score, zero-token → null") {
    import spark.implicits._
    // lang a: six scoreable docs with strictly increasing rare-word
    // fraction (the common word 'w' scores low under the corpus LM,
    // singletons score high) → neg_logp strictly increasing with doc_id,
    // so the tertiles must split 2/2/2 in id order; lang b gets its OWN
    // cuts (1/1/1 over three docs), independent of lang a's distribution.
    val docs = Seq(
      (0L, "w w w w w w", "a"), (1L, "w w w w w r1", "a"),
      (2L, "w w w w r2 r3", "a"), (3L, "w w w r4 r5 r6", "a"),
      (4L, "w w r7 r8 r9 r10", "a"), (5L, "w r11 r12 r13 r14 r15", "a"),
      (6L, "", "a"),
      (7L, "w w w", "b"), (8L, "w r16 r17", "b"), (9L, "r18 r19 r20", "b"))
      .toDF("doc_id", "text", "lang")
    val got = Corpus.pplBuckets(docs, "text", "doc_id", "lang").collect()
      .map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(got(6L).isEmpty, "zero-token doc must bucket to null")
    assert(Seq(0L, 1L).forall(got(_).contains("head")))
    assert(Seq(2L, 3L).forall(got(_).contains("middle")))
    assert(Seq(4L, 5L).forall(got(_).contains("tail")))
    assert(got(7L).contains("head") && got(8L).contains("middle") &&
      got(9L).contains("tail"))
  }

  test("nbQualityScore rejects a single-class (or empty) training set") {
    import spark.implicits._
    val score = Seq((0L, "anything")).toDF("doc_id", "text")
    // all-positive: the prior log(dp/dn) would be +Infinity
    val allPos = Seq((0L, "good", true), (1L, "fine", true))
      .toDF("doc_id", "text", "is_ref")
    val e1 = intercept[IllegalArgumentException] {
      Corpus.nbQualityScore(allPos, "is_ref", score, "text", "doc_id")
    }
    assert(e1.getMessage.contains("both classes"))
    // empty training frame: both counts zero
    intercept[IllegalArgumentException] {
      Corpus.nbQualityScore(allPos.limit(0), "is_ref",
        score, "text", "doc_id")
    }
  }

  test("nbQualityScore separates the classes it trained on") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val posWords = Array("theorem", "lemma", "proof", "therefore", "analysis")
    val negWords = Array("click", "win", "free", "casino", "pills")
    val docs = (0L until 60L).map { i =>
      val w = if (i % 2 == 0) posWords else negWords
      (i, Seq.fill(12)(w(rng.nextInt(w.length))).mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "is_ref")
    val scored = Corpus.nbQualityScore(docs, "is_ref", docs, "text", "doc_id")
      .join(docs.select("doc_id", "is_ref"), "doc_id").collect()
    scored.foreach { r =>
      val (odds, pos) = (r.getDouble(2), r.getBoolean(3))
      assert(if (pos) odds > 0 else odds < 0,
        s"doc ${r.getLong(0)} pos=$pos scored $odds")
    }
  }

  test("pplBuckets: corpus-sized joins are shuffle joins, only the cut table broadcasts") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.pplBuckets(d, "text", "doc_id", "lang")
      .queryExecution.executedPlan.toString
    // legitimate broadcasts: the 1-row unigram total and the |langs|-row
    // cut table. The term-count probe, the per-doc re-attach, and the
    // lang attach are all corpus/vocab-sized and must be shuffle joins.
    assert(plan.linesIterator.count(_.contains("ShuffledHashJoin")) >= 3,
      s"expected term-probe + per-doc + lang attach as shuffle joins:\n$plan")
  }

  test("dsirScores: only the dim-bounded weight table broadcasts") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.dsirScores(
      d, d.filter(org.apache.spark.sql.functions.col("source") === "src0"),
      "text", "doc_id", dim = 256)
      .queryExecution.executedPlan.toString
    // the weight attach broadcasts (≤ dim rows — legitimate, like
    // encodeTokens' vocab); the per-doc score re-attach is corpus-sized
    // and must be a shuffle join
    assert(plan.contains("ShuffledHashJoin"),
      s"per-doc re-attach must be a shuffle join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the dim-bounded weight attach should broadcast:\n$plan")
  }

  test("nbQualityScore never broadcasts the vocab-sized term table") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.nbQualityScore(
      d.withColumn("is_ref", org.apache.spark.sql.functions.col("source") === "src0"),
      "is_ref", d, "text", "doc_id")
      .queryExecution.executedPlan.toString
    // every broadcast is a 1-row constants attach (totals × priors,
    // consumed twice): IdentityBroadcastMode nested-loop crosses. The
    // vocab-sized term table and the corpus-sized perDoc frame must ride
    // ShuffledHashJoins — a BroadcastHASHJoin anywhere means the planner
    // driver-built one of them.
    assert(!plan.contains("BroadcastHashJoin"),
      "vocab/corpus-sized frame was broadcast")
    assert(plan.linesIterator.count(_.contains("ShuffledHashJoin")) == 2,
      "term-table probe and per-doc attach must both be shuffle joins")
  }
}
