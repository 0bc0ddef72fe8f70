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

  private def hitsOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double)] =
    df.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

  test("HITS: hand-computed hub/authority on a 3-node DAG, exact integers") {
    // 1→2, 2→3, 1→3. h0 = 1 everywhere.
    //   a1 = (0, 1, 2); h1 = (a1(2)+a1(3), a1(3), 0) = (3, 2, 0)
    //   a2 = (0, h1(1), h1(1)+h1(2)) = (0, 3, 5); h2 = (3+5, 5, 0) = (8, 5, 0)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val got = hitsOf(Graph.hits(edges, "src", "dst", iters = 2))
    assert(got == Map(
      1L -> ((8.0, 0.0)), 2L -> ((5.0, 3.0)), 3L -> ((0.0, 5.0))))
  }

  test("HITS: duplicate edges carry multiplicity; cycle stays symmetric") {
    // 1→2 twice: a1(2) = 2, h1(1) = 2·a1(2) = 4
    val dup = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst")
    val gotDup = hitsOf(Graph.hits(dup, "src", "dst", iters = 1))
    assert(gotDup == Map(1L -> ((4.0, 0.0)), 2L -> ((0.0, 2.0))))
    // 2-cycle: hubs and auths stay equal across nodes every iteration
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val gotCyc = hitsOf(Graph.hits(cyc, "src", "dst", iters = 4))
    assert(gotCyc(1L) == gotCyc(2L))
    assert(gotCyc(1L)._1 == gotCyc(1L)._2) // hub = auth by symmetry
  }

  private def trisOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCount: K4, direction/multiplicity/self-loop insensitivity") {
    // K4: every node sits in C(3,2) = 3 triangles
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toDF("src", "dst")
    assert(trisOf(Graph.triangleCount(k4, "src", "dst")) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // reversed duplicates, self-loops and multi-edges change nothing
    val noisy = k4.unionByName(
      Seq((2L, 1L), (3L, 1L), (1L, 1L), (1L, 2L), (4L, 3L)).toDF("src", "dst"))
    assert(trisOf(Graph.triangleCount(noisy, "src", "dst")) ==
      trisOf(Graph.triangleCount(k4, "src", "dst")))
  }

  test("triangleCount: triangle + pendant + triangle-free square") {
    // triangle 1-2-3 with pendant 4 on node 3; square 5-6-7-8 (no diagonal)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L)).toDF("src", "dst")
    val got = trisOf(Graph.triangleCount(edges, "src", "dst"))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L))
  }
}
