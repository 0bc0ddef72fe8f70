package graft.ops

import graft.SparkTestBase

/** [[Graph.pageRank]] — hand-computed fixpoints and the documented
  * dangling/multiplicity semantics.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle is stationary at 1/2 each") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = ranksOf(Graph.pageRank(edges, "src", "dst", iters = 8))
    assert(got == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("dangling node's mass drops — the documented Pregel-style variant") {
    // 1 → 2, node 2 has no out-edges. r1(1) = 0.15/2; from iteration 2
    // on, r(2) = 0.15/2 + 0.85·(0.15/2) — stationary, total mass < 1.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = ranksOf(Graph.pageRank(edges, "src", "dst", iters = 8))
    assert(got(1L) == 0.075)
    assert(got(2L) == 0.13875)
  }

  test("duplicate edges carry multiplicity (weighted-graph encoding)") {
    // 1 → 2 twice, 1 → 3 once: out-degree 3, node 2 receives 2/3 of
    // node 1's rank. One iteration from the uniform start (N = 3):
    //   r1(1) = 0.05, r1(2) = 0.05 + 0.85·(2/9), r1(3) = 0.05 + 0.85·(1/9)
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("src", "dst")
    val got = ranksOf(Graph.pageRank(edges, "src", "dst", iters = 1))
    assert(got(1L) == 0.05)
    assert(got(2L) == BigDecimal(0.05 + 0.85 * ((1.0 / 3) * 2 / 3))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2L) > got(3L) && got(3L) > got(1L))
  }
}
