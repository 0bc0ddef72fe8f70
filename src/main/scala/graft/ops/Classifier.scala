package graft.ops

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distributed linear quality-classifier training — the in-cluster
  * counterpart to [[Corpus.nbQualityScore]]'s counting-only model: a
  * real curation pipeline trains a lightweight "keep/drop" classifier
  * on labeled documents (fastText-style quality filters in the GPT-3 /
  * CCNet lineage) rather than shipping one in. This is full-batch
  * gradient descent on a binary linear model; each iteration is ONE
  * aggregation pass over the feature frame (Spark compiles the
  * multi-`sum` agg to partial aggregation — the `treeAggregate` shape:
  * map-side partial sums, one F+1-column reduce), and the coefficient
  * vector is bounded model state on the driver, the
  * [[Similarity.ivfCentroids]] contract.
  *
  * Determinism discipline (the repo's cross-engine reproducibility
  * rules, same as the Lloyd/BPE/WordPiece replays):
  *
  *   - **No transcendentals.** The link is the softsign sigmoid
  *     `p = 0.5 + 0.5·z/(1+|z|)` — algebraically equivalent shape to
  *     the logistic curve (bounded, monotone, p(0)=½) but built from
  *     `+ − × ÷ |·|` only, which IEEE-754 fixes bit-for-bit on every
  *     engine. `exp()` differs in the last ulp between libm builds and
  *     the JVM, and an iterative trainer AMPLIFIES a 1-ulp divergence
  *     across rounds — so the logistic link is unreplayable in
  *     principle, the softsign link exactly replayable.
  *   - **Quantized gradient terms.** Per row and feature the
  *     contribution `(p−y)·xⱼ` is quantized to a long —
  *     `⌊(p−y)·xⱼ·scale + ½⌋` — so the gradient sum is an integer sum:
  *     order-independent under Spark's nondeterministic partition
  *     order and exactly reproducible in DuckDB (which sums BIGINT in
  *     HUGEINT — also exact). Caller contract: `scale · max|xⱼ| · n`
  *     must fit a signed long; the default 1e8 with unit-scaled
  *     features holds to ~10¹⁰ rows — raise features' scale rather
  *     than `scale` at the extreme (quantization error is ≤ ½/scale
  *     per row, far below any gradient signal).
  *   - **Fixed evaluation order.** z is the left-associated chain
  *     `w₀·x₀ + w₁·x₁ + …` and the update is
  *     `wⱼ − lr·(Σg/scale/n)` — both written identically in the
  *     DuckDB oracle, so driver-side Scala arithmetic and the SQL
  *     replay produce bit-identical doubles at every iteration.
  *
  * The feature frame is materialized once ([[Materialize.cut]]) and
  * re-read each iteration; features must be non-null doubles (compose
  * with [[Text.qualityStruct]], whose ratios are total). No
  * regularization: the intended use is a handful of bounded,
  * pre-scaled quality features where L2 adds a tuning knob without
  * changing the replay structure.
  *
  * Reference context: the reference scores quality with fixed
  * per-field validation bounds (R/validation.R); the trainable
  * classifier is the LLM-curation extension of that idea, not a port.
  */
object Classifier {

  /** Coefficients after one training iteration (intercept first). */
  final case class LrIter(iter: Int, weights: Seq[Double])

  /** Softsign link: bounded to (0,1), exact under IEEE arithmetic. */
  private def softsignP(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** Left-associated `w₀·x₀ + w₁·x₁ + …` — the oracle writes the same
    * chain, so the fold order is part of the cross-engine contract.
    */
  private def zOf(weights: Seq[Double], xs: Seq[Column]): Column =
    weights.zip(xs).map { case (w, x) => lit(w) * x }.reduceLeft(_ + _)

  /** Train `nIters` full-batch GD iterations; weights start at zero.
    * Returns the coefficient trajectory (iteration 1..nIters,
    * intercept first) — the trajectory, not just the endpoint, is the
    * oracle surface: every update is replayed decision-for-decision.
    */
  def lrTrain(df: DataFrame, featureCols: Seq[String], labelCol: String,
              nIters: Int, lr: Double = 1.0, scale: Double = 1e8): Seq[LrIter] = {
    require(nIters >= 1 && nIters <= 1000, s"nIters=$nIters")
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    val nf = featureCols.size + 1
    val xs = lit(1.0).as("__x0") +: featureCols.zipWithIndex.map {
      case (c, i) => col(c).cast(DoubleType).as(s"__x${i + 1}")
    }
    val feats = df
      .select(col(labelCol).cast(DoubleType).as("__y") +: xs: _*)
      .lineageCut()
    val n = feats.count().toDouble
    require(n > 0, "training frame is empty")
    var w = Vector.fill(nf)(0.0)
    val out = scala.collection.mutable.ArrayBuffer.empty[LrIter]
    for (t <- 1 to nIters) {
      val z = zOf(w, (0 until nf).map(i => col(s"__x$i")))
      val p = softsignP(z)
      val gs = (0 until nf).map(i =>
        sum(floor((p - col("__y")) * col(s"__x$i") * lit(scale) + lit(0.5))
          .cast(LongType)).as(s"__g$i"))
      val row = feats.agg(gs.head, gs.tail: _*).head()
      w = Vector.tabulate(nf)(i =>
        w(i) - lr * (row.getLong(i).toDouble / scale / n))
      out += LrIter(t, w)
    }
    feats.unpersist()
    out.toSeq
  }

  /** The coefficient trajectory as a DataFrame — the trainer gate's
    * surface: one row per (iteration, feature), intercept named
    * `_intercept`.
    */
  def lrTrainTable(df: DataFrame, featureCols: Seq[String], labelCol: String,
                   nIters: Int, lr: Double = 1.0, scale: Double = 1e8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val names = "_intercept" +: featureCols
    lrTrain(df, featureCols, labelCol, nIters, lr, scale)
      .flatMap(it => names.zip(it.weights).map {
        case (nm, wj) => (it.iter, nm, wj)
      })
      .toDF("iter", "feature", "weight")
  }

  /** Score with a trained coefficient vector (intercept first — the
    * [[lrTrain]] layout): `(idCol, score, pred)` where score is the
    * softsign probability and pred the ½-threshold class. The weights
    * ride the plan as literals (bounded model state), so scoring is
    * one narrow codegen'd scan — no join, no shuffle.
    */
  def lrScore(df: DataFrame, featureCols: Seq[String], weights: Seq[Double],
              idCol: String): DataFrame = {
    require(weights.size == featureCols.size + 1,
      s"weights=${weights.size} for ${featureCols.size} features + intercept")
    val xs = lit(1.0) +: featureCols.map(c => col(c).cast(DoubleType))
    val p = softsignP(zOf(weights, xs))
    df.select(col(idCol), p.as("score"),
      when(p >= 0.5, lit(1)).otherwise(lit(0)).as("pred"))
  }

  // ---------------------------------------------------- oracle builders

  private def num(d: Double): String = {
    val s = d.toString // Scala double toString round-trips exactly
    if (s.contains('E') || s.contains('e') || s.contains('.')) s else s + ".0"
  }

  /** The shared iteration chain as a spliceable CTE list (no leading
    * `WITH`): `feats` (from `featsSql`, which must yield columns
    * `y, x0=1.0, x1..xF` plus any carried id columns), then per
    * iteration a quantized-gradient CTE and an updated-weights CTE,
    * each written with the exact arithmetic and association order the
    * engine uses. Public so composed-pipeline oracles (the curate
    * LR-screen gate) can splice the replay into their own WITH chain;
    * CTE names (`feats`/`cnt`/`it*`/`g*`) are the splice contract.
    */
  private[graft] def lrOracleCtes(featsSql: String, nf: Int, nIters: Int,
                                  lr: Double = 1.0,
                                  scale: Double = 1e8): String = {
    val sb = new StringBuilder
    val idx = 0 until nf
    sb.append(s"feats AS MATERIALIZED ($featsSql),\n")
    sb.append("cnt AS (SELECT COUNT(*) AS n FROM feats),\n")
    sb.append("it0 AS (SELECT " +
      idx.map(i => s"0.0 AS w$i").mkString(", ") + ")")
    for (t <- 1 to nIters) {
      val prev = s"it${t - 1}"
      val zChain = idx.map(i => s"w.w$i * f.x$i").mkString(" + ")
      sb.append(s""",
        |g$t AS (
        |  SELECT ${idx.map(i =>
             s"SUM(CAST(FLOOR((p - y) * x$i * ${num(scale)} + 0.5) AS BIGINT)) AS g$i")
             .mkString(", ")}
        |  FROM (SELECT y, ${idx.map(i => s"x$i").mkString(", ")},
        |               0.5 + 0.5 * z / (1.0 + ABS(z)) AS p
        |        FROM (SELECT f.*, $zChain AS z
        |              FROM feats f CROSS JOIN $prev w))),
        |it$t AS (
        |  SELECT ${idx.map(i =>
             s"w.w$i - ${num(lr)} * (CAST(g.g$i AS DOUBLE) / ${num(scale)} / CAST(c.n AS DOUBLE)) AS w$i")
             .mkString(",\n         ")}
        |  FROM $prev w CROSS JOIN g$t g CROSS JOIN cnt c)""".stripMargin)
    }
    sb.toString
  }

  /** Oracle for the trainer gate: the full coefficient trajectory,
    * `(iter, feature, weight)` ordered by (iter, feature).
    * `featureNames` must be the Spark call's `featureCols` (the
    * intercept row is named `_intercept` on both sides).
    */
  def lrTrainOracle(featsSql: String, featureNames: Seq[String],
                    nIters: Int, lr: Double = 1.0,
                    scale: Double = 1e8): String = {
    val names = "_intercept" +: featureNames
    val rows = (1 to nIters).flatMap(t => names.zipWithIndex.map {
      case (nm, i) => s"SELECT $t AS iter, '$nm' AS feature, w$i AS weight FROM it$t"
    }).mkString("\nUNION ALL\n")
    "WITH " + lrOracleCtes(featsSql, names.size, nIters, lr, scale) +
      s"\nSELECT iter, feature, weight FROM (\n$rows\n) ORDER BY iter, feature"
  }

  /** Oracle for the scorer gate: run the chain, score every document
    * with the final weights (same chain arithmetic), threshold at ½.
    * `featsSql` must carry the id column, named `idCol`.
    */
  def lrScoreOracle(featsSql: String, idCol: String, nFeatures: Int,
                    nIters: Int, lr: Double = 1.0,
                    scale: Double = 1e8): String = {
    val nf = nFeatures + 1
    val zChain = (0 until nf).map(i => s"w.w$i * f.x$i").mkString(" + ")
    "WITH " + lrOracleCtes(featsSql, nf, nIters, lr, scale) + s"""
      |SELECT $idCol, score, CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS pred
      |FROM (SELECT f.$idCol, 0.5 + 0.5 * z / (1.0 + ABS(z)) AS score
      |      FROM (SELECT f.$idCol, $zChain AS z
      |            FROM feats f CROSS JOIN it$nIters w) f)
      |ORDER BY $idCol""".stripMargin
  }
}
