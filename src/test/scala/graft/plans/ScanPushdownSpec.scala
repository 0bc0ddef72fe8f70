package graft.plans

import graft.SparkTestBase

/** Scan-level contracts: predicates and column pruning must reach the
  * parquet scan (SURVEY.md §4). A scan reading every column for a
  * two-column projection, or re-filtering rows Spark already read, is
  * exactly the regression these pin down.
  */
class ScanPushdownSpec extends SparkTestBase {

  private def scanLines(name: String): Seq[String] = {
    val q = graft.SparkEntry.catalog.find(_.name == name).get
    q.fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).toSeq
  }

  test("knn query pushes the vec_id predicate into the embeddings scan") {
    val scans = scanLines("q_knn_cosine_topk")
    assert(scans.nonEmpty)
    // the query-side scan restricts vec_id < 16; the pushed filter must
    // appear at the file source, not only as a post-scan Filter node
    assert(scans.exists(_.matches(".*PushedFilters: \\[[^\\]]*LessThan\\(vec_id,16\\).*")),
      s"vec_id predicate not pushed:\n${scans.mkString("\n")}")
  }

  test("projection queries prune the parquet read schema") {
    // q_p2 projects a handful of columns from the wide landings scan —
    // the ReadSchema must not contain the dropped catch/gps noise columns
    val scans = scanLines("q_p2_drop_columns")
    assert(scans.nonEmpty)
    assert(!scans.exists(_.contains("gps_location")),
      s"dropped column still read:\n${scans.mkString("\n")}")
    // the documents-based fingerprint query needs only (doc_id, text):
    // lang/source/n_chars must not be read
    val doc = scanLines("q_text_fingerprint")
    assert(doc.nonEmpty)
    assert(!doc.exists(s => s.contains("n_chars") || s.contains("source")),
      s"unused documents columns read:\n${doc.mkString("\n")}")
  }
}
