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

  test("repetition query joins per-doc bigram stats without broadcasting them") {
    val plan = graft.SparkEntry.catalog.find(_.name == "q_curate_repetition").get
      .fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "per-doc bigram aggregate (corpus-sized) must not be broadcast")
  }
}
