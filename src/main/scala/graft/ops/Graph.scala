package graft.ops

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Join-based iterative graph operators. The near-dup clustering path
  * already has large-star/small-star connected components
  * ([[graft.ops.Dedup]]); this file holds the rank-propagation side —
  * the domain-authority signal web-corpus curation filters on (a page's
  * crawl priority / quality prior is routinely gated on the rank of its
  * domain in the link graph).
  */
object Graph {

  /** Fixed-iteration PageRank over an edge list:
    * `r₀ = 1/N`, `r_{t+1}(v) = (1−d)/N + d·Σ_{u→v} r_t(u)/outdeg(u)`.
    *
    * Deterministic variant: a FIXED iteration count (no convergence
    * test — a float-threshold test would make the iteration count
    * data/engine-dependent) and NO dangling-mass redistribution (the
    * Pregel-style simplification: rank flowing into a node with no
    * out-edges leaves the system; normalize externally if a
    * distribution is needed). Duplicate edges carry multiplicity —
    * out-degree counts them and each contributes separately, so a
    * weighted graph can be expressed by edge repetition.
    *
    * Scale shape: per iteration, ONE shuffle join of the edge list
    * against the current rank frame (both Θ(edges)/Θ(nodes), pinned
    * shuffle_hash — the planner's post-aggregate estimates would
    * otherwise broadcast a corpus-sized frame) plus one hash aggregate
    * of contributions; the rank frame is eagerly localCheckpoint-ed
    * each step so step t+1 starts from materialized rows instead of
    * replaying the whole chain (the [[graft.ops.Similarity
    * .ivfCentroids]] discipline — without it the lineage, and the plan,
    * doubles per iteration). Ranks round to 9 decimals at the END only;
    * the per-iteration double sums are order-dependent at ~1e-16 per
    * step, far below the rounding — the same cross-engine discipline
    * every LM gate uses.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 8, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(damping > 0 && damping < 1, s"damping=$damping must be in (0,1)")
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()
      .lineageCut()
    val n = nodes.count()
    val deg = edges.groupBy(col(srcCol).as("__src"))
      .agg(count(lit(1)).as("__deg"))
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(deg.hint("shuffle_hash"), Seq("__src"))
      .lineageCut()
    val base = lit((1.0 - damping) / n)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "__src").hint("shuffle_hash"),
          Seq("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("rank") / col("__deg").cast(DoubleType)).as("__in"))
      ranks = nodes
        .join(contribs.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
        .lineageCut()
    }
    ranks.select(col("node"), round(col("rank"), 9).as("rank"))
  }

  /** Fixed-iteration HITS (Kleinberg): `a_t(v) = Σ_{u→v} h_{t−1}(u)`,
    * `h_t(u) = Σ_{u→v} a_t(v)` — the hub/authority split [[pageRank]]'s
    * single score can't express (a link-farm page can have high hub and
    * zero authority; a cited-everywhere page the reverse).
    *
    * Deterministic variant: fixed iterations, and UNNORMALIZED — h₀ = 1,
    * so every intermediate value is an exact INTEGER carried in doubles
    * (integer-valued double sums are order-independent: every partial
    * sum is itself an integer below 2⁵³, no rounding ever occurs), which
    * makes the result bit-reproducible across engines and partitionings
    * with no rounding discipline at all. The price: values grow like
    * (mean degree)^{2·iters}, so iters stays small (default 4 → degree⁸;
    * rankings are scale-invariant, normalize post-hoc if a distribution
    * is needed — dividing at the END is one deterministic op, while
    * per-iteration normalization would feed order-dependent non-integer
    * doubles back into the sums). Duplicate edges carry multiplicity,
    * as in [[pageRank]].
    *
    * Scale shape per half-iteration: ONE shuffle join of the edge list
    * against the current score frame (shuffle_hash-pinned — both sides
    * Θ(edges)/Θ(nodes)) plus one hash aggregate; score frames are
    * eagerly localCheckpoint-ed per step (the ivfCentroids lineage
    * discipline). Nodes with no in-edges hold authority 0, no
    * out-edges hub 0.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()
      .lineageCut()
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .lineageCut()
    var hub = nodes.withColumn("hub", lit(1.0))
    var auth = nodes.withColumn("auth", lit(0.0))
    for (_ <- 1 to iters) {
      val aIn = e
        .join(hub.withColumnRenamed("node", "__src").hint("shuffle_hash"),
          Seq("__src"))
        .groupBy(col("__dst").as("node")).agg(sum(col("hub")).as("__a"))
      auth = nodes.join(aIn.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), coalesce(col("__a"), lit(0.0)).as("auth"))
        .lineageCut()
      val hOut = e
        .join(auth.withColumnRenamed("node", "__dst").hint("shuffle_hash"),
          Seq("__dst"))
        .groupBy(col("__src").as("node")).agg(sum(col("auth")).as("__h"))
      hub = nodes.join(hOut.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), coalesce(col("__h"), lit(0.0)).as("hub"))
        .lineageCut()
    }
    nodes
      .join(hub.hint("shuffle_hash"), Seq("node"))
      .join(auth.hint("shuffle_hash"), Seq("node"))
      .select(col("node"), col("hub"), col("auth"))
  }

  /** Per-node triangle count over the UNDIRECTED simple graph (direction,
    * multiplicity and self-loops dropped) — the local clustering signal
    * (spam link-farms are triangle-dense; organic link neighborhoods are
    * sparse) and the classic skew-prone graph kernel done right:
    *
    * DEGREE ORIENTATION is the scale move. Every undirected edge is
    * directed from its lower-(degree, id) endpoint to the higher; each
    * triangle then has exactly ONE apex with out-edges to both others,
    * counted by joining the apex's out-wedges against the oriented edge
    * set. Wedge volume is Σ outdeg(v)² with outdeg ≤ O(√m) under this
    * orientation (Chiba–Nishizeki) — a celebrity node with 10⁷ followers
    * generates ~10¹⁴ naive wedges but only ~m√m oriented ones, because
    * every low-degree fan points AT the celebrity, never out of it.
    * Deterministic (degree, id) tiebreak; all joins shuffle_hash-pinned
    * (Θ(edges) frames). Isolated-in-no-edge nodes don't appear (the node
    * set is edge-derived, as [[pageRank]]).
    *
    * Output: (node, n_triangles), one row per node in the edge set.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .lineageCut()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .lineageCut()
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("__du")).hint("shuffle_hash"), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("__dv")).hint("shuffle_hash"), Seq("v"))
    val uFirst = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      when(uFirst, col("__dv")).otherwise(col("__du")).as("__bd"))
      .lineageCut()
    val w1 = oriented.select(col("a"), col("b"), col("__bd"))
    val w2 = oriented.select(col("a"), col("b").as("c"), col("__bd").as("__cd"))
    val wedges = w1.join(w2.hint("shuffle_hash"), Seq("a"))
      .filter(col("__bd") < col("__cd") ||
        (col("__bd") === col("__cd") && col("b") < col("c")))
    val tri = wedges
      .join(oriented.select(col("a").as("b"), col("b").as("c")).hint("shuffle_hash"),
        Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
    val counts = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.select("node")
      .join(counts.hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
