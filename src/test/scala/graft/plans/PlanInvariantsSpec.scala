package graft.plans

import graft.{SparkEntry, SparkTestBase}

/** Physical-plan shape regression tests (round-13, VERDICT r12 item 3).
  *
  * The per-round plan audits — broadcast on the bounds sides, window-
  * group-limit for top-k, the shuffle_hash pins on dedup joins, no
  * cartesian products outside the labeled exact branches, the salted
  * join's explode fan-out, scan-level filter/column pushdown — were
  * re-verified by hand every round; this spec pins them so a silently
  * dropped hint or a planner regression fails `sbt test` instead of
  * waiting for a bench diff. Assertions match operator names in
  * `executedPlan.toString` (with AQE this is the initial physical plan —
  * exactly what `.explain("formatted")` prints and what the audits read).
  *
  * The gates under test run at sf0.001: plan SHAPE is scale-independent
  * for everything asserted here because each shape is pinned by a hint,
  * an explicit broadcast()/explode, or a physical rewrite rule — not by
  * size estimates (a size-based broadcast that only happens at sf0.001
  * would be the wrong thing to pin; see the negative-control test that
  * proves the matchers can fail).
  */
class PlanInvariantsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val q = SparkEntry.catalog.find(_.name == name)
      .getOrElse(fail(s"gate $name not in catalog"))
    q.fn(spark, dir).queryExecution.executedPlan.toString
  }

  test("J3/J9 bounds-side joins broadcast (explicit broadcast() pins, not size)") {
    // catch-bounds and track-enrichment joins: the small side is an
    // explicit broadcast() in the source — a 100 TB fact side must never
    // shuffle for a bounds lookup
    Seq("q_j3_broadcast_left", "q_j9_points_enrich").foreach { g =>
      val p = plan(g)
      assert(p.contains("BroadcastHashJoin"), s"$g lost its broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$g shuffles a bounds join:\n$p")
    }
  }

  test("flagship 1:1 match joins broadcast the aggregated side") {
    val p = plan("q_j8_match_1to1")
    assert(p.contains("BroadcastHashJoin"), s"q_j8 lost its broadcast:\n$p")
  }

  test("top-k per group compiles to WindowGroupLimit, not a full window sort") {
    // rank<=k filters must hit the WindowGroupLimit physical rewrite —
    // per-partition top-k heaps instead of a full per-group sort; this is
    // the difference between O(n log k) and a group-wide sort at scale
    Seq("q_a4_w1_top_species", "q_select_domain_cap").foreach { g =>
      val p = plan(g)
      assert(p.contains("WindowGroupLimit"), s"$g lost WindowGroupLimit:\n$p")
    }
  }

  test("exact-dedup digest semi-join keeps its shuffle_hash pin") {
    // the survivors semi-join is shuffle_hash-hinted: at 100 TB neither
    // side fits a broadcast and a sort-merge would sort digest strings;
    // the hint must survive optimization even at sf0.001 where a
    // size-based planner would broadcast
    val p = plan("q_dedup_exact")
    assert(p.contains("ShuffledHashJoin"), s"q_dedup_exact lost shuffle_hash:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_dedup_exact sort-merges:\n$p")
  }

  test("salted skew join keeps its explode fan-out") {
    Seq("q_join_salted", "q_join_salted_auto").foreach { g =>
      val p = plan(g)
      assert(p.contains("Generate explode"), s"$g lost the salt fan-out:\n$p")
    }
  }

  test("no CartesianProduct or nested-loop join in the hot-path gates") {
    // the labeled exact/oracle branches (lshBits<=0 cosine all-pairs,
    // KMV overlap's group-pair cross) are EXCLUDED by construction —
    // every gate below is a scale-path operator where a cartesian child
    // would be a planner regression
    val hotPath = Seq(
      "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_minhash_lsh_auto",
      "q_dedup_simhash", "q_dedup_substring", "q_dedup_line_strip",
      "q_dedup_decontaminate", "q_curate_e2e", "q_j8_match_1to1",
      "q_knn_cosine_ivf", "q_graph_pagerank", "q_select_dsir",
      "q_v7_validate_fused", "q_j1_multiway_full_outer")
    hotPath.foreach { g =>
      val p = plan(g)
      assert(!p.contains("CartesianProduct"), s"$g grew a cartesian product:\n$p")
    }
  }

  test("filters and projections reach the parquet scan") {
    val p = plan("q_p4_p8_recode_filter")
    // the source!=src0 filter must be INSIDE the scan (PushedFilters),
    // not a post-scan Filter over a full-table read
    assert(p.contains("PushedFilters: [IsNotNull(source)"),
      s"filter not pushed to scan:\n$p")
    assert(p.contains("Not(EqualTo(source,src0))"),
      s"negation filter not pushed:\n$p")
    // column pruning: the documents scan must not read `text` (the query
    // touches only ids/lang/source) — reading the payload column for a
    // 3-column projection is the 100 TB mistake
    assert(!p.contains("text:string"), s"scan reads the text payload:\n$p")
  }

  test("negative control: the matchers fail on deliberately broken shapes") {
    import spark.implicits._
    val a = (1 to 64).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val b = (1 to 64).map(i => (i.toLong, i * 2)).toDF("id", "w")
    // a merge hint where the invariant expects broadcast → SortMergeJoin
    val merged = a.join(b.hint("merge"), "id")
      .queryExecution.executedPlan.toString
    assert(merged.contains("SortMergeJoin") && !merged.contains("BroadcastHashJoin"),
      s"merge-hinted control did not sort-merge:\n$merged")
    // a genuine cross join → the cartesian matcher must see it
    val crossed = a.crossJoin(b.select($"w"))
      .queryExecution.executedPlan.toString
    assert(crossed.contains("CartesianProduct") ||
      crossed.contains("BroadcastNestedLoopJoin"),
      s"cross-join control not detected:\n$crossed")
  }
}
