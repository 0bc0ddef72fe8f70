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

  test("repetition query joins per-doc bigram stats without broadcasting them") {
    val plan = graft.SparkEntry.catalog.find(_.name == "q_curate_repetition").get
      .fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "per-doc bigram aggregate (corpus-sized) must not be broadcast")
  }
}
