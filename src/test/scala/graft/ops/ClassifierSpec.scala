package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Linear quality-classifier trainer/scorer ([[Classifier]]): the
  * determinism contract (bit-identical trajectories across runs), the
  * learning direction on a separable corpus, and the score surface's
  * bounds/threshold semantics.
  */
class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  /** Perfectly separable by x1: positives at x1=2, negatives at x1=-2. */
  private lazy val separable =
    ((1 to 40).map(i => (i.toLong, 1.0, 2.0)) ++
      (41 to 80).map(i => (i.toLong, 0.0, -2.0)))
      .toDF("id", "y", "x1")

  test("training is deterministic and moves the separating weight in the right direction") {
    val r1 = Classifier.lrTrain(separable, Seq("x1"), "y", nIters = 5)
    val r2 = Classifier.lrTrain(separable, Seq("x1"), "y", nIters = 5)
    assert(r1 == r2, "bit-identical trajectories across runs")
    assert(r1.size == 5)
    // positives sit at larger x1, so w1 must grow positive; the classes
    // are balanced so the intercept stays near zero
    val w = r1.last.weights
    assert(w(1) > 0.0, s"w1 should be positive: $w")
    assert(math.abs(w(0)) < math.abs(w(1)), s"intercept dominates: $w")
    // each iteration strictly improves the separator on this corpus
    assert(r1.map(_.weights(1)).sliding(2).forall { case Seq(a, b) => b > a })
  }

  test("scoring: softsign bounds, threshold semantics, perfect separation when learnable") {
    val w = Classifier.lrTrain(separable, Seq("x1"), "y", nIters = 8).last.weights
    val scored = Classifier.lrScore(separable, Seq("x1"), w, "id")
      .join(separable, Seq("id"))
    assert(scored.filter(col("score") <= 0.0 || col("score") >= 1.0).count() == 0,
      "softsign scores stay strictly inside (0,1)")
    assert(scored.filter((col("pred") === 1) =!= (col("score") >= 0.5)).count() == 0,
      "pred is exactly the half-threshold of score")
    assert(scored.filter(col("pred").cast("double") =!= col("y")).count() == 0,
      "separable corpus separates after 8 iterations")
  }

  test("plan shape: scoring is one exchange-free codegen'd projection") {
    // the weights ride the plan as literals (bounded model state), so
    // the scorer must compile to a narrow scan over the source: no
    // Exchange anywhere, one whole-stage codegen span — the scaladoc's
    // 100 TB claim as a pinned contract, not prose. A parquet-backed
    // frame, not a local relation (Catalyst folds a LocalTableScan's
    // projection away entirely, which proves nothing).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("double").as("x1"))
    val plan = Classifier.lrScore(docs, Seq("x1"), Seq(0.1, 0.2), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring plan shuffles:\n$plan")
    // `*(1)` is executedPlan.toString's whole-stage-codegen span marker;
    // the score/pred projection must sit inside stage 1 with the scan
    assert(plan.contains("*(1) Project"), s"scoring fell out of codegen:\n$plan")
    assert(plan.split("\n").count(_.contains("*(")) >= 1 &&
      !plan.contains("*(2)"), s"scoring spans more than one stage:\n$plan")
  }

  test("trainTable layout and contracts") {
    val t = Classifier.lrTrainTable(separable, Seq("x1"), "y", nIters = 3)
    assert(t.columns.toSeq == Seq("iter", "feature", "weight"))
    assert(t.count() == 6) // 3 iters x (intercept + 1 feature)
    assert(t.filter(col("feature") === "_intercept").count() == 3)
    intercept[IllegalArgumentException] {
      Classifier.lrTrain(separable.filter(lit(false)), Seq("x1"), "y", 1)
    }
    intercept[IllegalArgumentException] {
      Classifier.lrScore(separable, Seq("x1"), Seq(0.0), "id") // missing intercept
    }
  }

  test("real-corpus features: deterministic trajectory, and a known linear rule is recovered") {
    // The synthetic corpus's lang label carries essentially no surface-
    // statistics signal (its punct/upper ratios are constant-zero and
    // the stopword ratio overlaps across langs), so learnability is
    // pinned here with a label the features CAN express: a threshold on
    // mean token length. The gate keeps the natural lang label — it
    // verifies the replay, not model quality.
    // centered feature (mtl − 4.5): the rule's boundary sits at zero,
    // the conditioning a practitioner buys with feature scaling —
    // UNcentered mtl (mean ≈ 4.5, std ≈ 0.2) makes plain GD crawl along
    // the intercept/slope ridge for thousands of rounds
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), Text.qualityStruct(col("text")).as("q"))
      .select(col("doc_id"),
        (col("q.mean_token_len") - 4.5).as("mtlc"),
        col("q.stopword_hit_ratio").as("stop"))
      .withColumn("y", when(col("mtlc") > 0.0, 1.0).otherwise(0.0))
    val feats = Seq("mtlc", "stop")
    val t1 = Classifier.lrTrain(docs, feats, "y", nIters = 6)
    val t2 = Classifier.lrTrain(docs, feats, "y", nIters = 6)
    assert(t1 == t2, "real-double trajectories bit-identical across runs")
    val n = docs.count().toDouble
    val w = Classifier.lrTrain(docs, feats, "y", nIters = 60, lr = 4.0).last.weights
    val acc = Classifier.lrScore(docs, feats, w, "doc_id")
      .join(docs.select("doc_id", "y"), Seq("doc_id"))
      .filter(col("pred").cast("double") === col("y")).count() / n
    assert(acc > 0.95, s"rule recovery should be near-perfect: acc=$acc")
    assert(w(1) > 0.0, s"the rule's feature must carry positive weight: $w")
  }
}
