package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Vector similarity: fused expressions vs HOF builtins (bit parity) and
  * exact top-k correctness against a local computation.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private val vecs = Seq.tabulate(50)(i =>
    (i.toLong, Array.fill(16)(rng.nextDouble() * 2 - 1)))
  private val df = vecs.toDF("vec_id", "embedding")

  test("CosineSim expression is bit-identical to the HOF form") {
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("expr"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    pairs.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("HyperplaneBucket expression is bit-identical to the HOF form") {
    val out = df.select(
      Similarity.hyperplaneBucket(col("embedding"), 8).as("expr"),
      Similarity.hyperplaneBucketHof(col("embedding"), 8).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(out.map(_.getLong(0)).distinct.length > 1) // buckets actually spread
  }

  test("IVF with nprobe = nlist is exact (equals brute force)") {
    val exact = Similarity.bruteForceTopK(
      df.filter(col("vec_id") < 3), df, "vec_id", "embedding", "vec_id", "embedding", 4)
      .select("query_id", "rank", "neighbor_id").orderBy("query_id", "rank")
      .collect().map(_.toSeq)
    val ivf = Similarity.ivfTopK(
      df.filter(col("vec_id") < 3), df, "vec_id", "embedding", "vec_id", "embedding",
      k = 4, nlist = 8, nprobe = 8)
      .select("query_id", "rank", "neighbor_id").orderBy("query_id", "rank")
      .collect().map(_.toSeq)
    assert(ivf.toSeq == exact.toSeq)
  }

  test("IVF centroids: one Lloyd step produces nlist cells covering the corpus") {
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", 8).collect()
    assert(cents.length == 8)
    assert(cents.forall(_.getSeq[Double](1).length == 16))
  }

  test("bruteForceTopK matches a local exact computation") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val local = vecs.take(3).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(4).map(_._1)
    }.toMap
    val viaSpark = Similarity.bruteForceTopK(
      df.filter(col("vec_id") < 3), df, "vec_id", "embedding", "vec_id", "embedding", 4)
      .orderBy("query_id", "rank")
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getLong(1)).toSeq }
    assert(viaSpark == local.map { case (k, v) => k -> v.toSeq })
  }
}
