package graft.plans

import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.RegExpReplace
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Plan-shape and semantics tests for [[ScrubPushdown]]: the scrub must
  * move below the Generate exactly when it is explode-independent, the
  * rewritten plan must produce identical rows, and the registration path
  * (spark.sql.extensions) must fire the rule inside a real optimizer run.
  */
class ScrubPushdownSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "call 555 1234 now"),
    (2L, "no digits here"),
    (3L, "a 1 b 2 c 3 d 4 e 5 f 6")).toDF("doc_id", "text")

  /** regexp_replace on the pre-explode text, written AFTER the explode —
    * the backwards ordering the rule exists to fix.
    */
  private def chunkThenScrub = docs
    .select(col("doc_id"), col("text"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    .select(col("doc_id"), col("pos"), col("tok"),
      regexp_replace(col("text"), "[0-9]+", "<NUM>").as("scrubbed"))

  /** Does any Project ABOVE (resp. BELOW) the Generate contain a
    * RegExpReplace? Walks the plan tree once, flipping at the Generate.
    */
  private def scrubPosition(plan: LogicalPlan): (Boolean, Boolean) = {
    var above = false
    var below = false
    var seenGenerate = false
    plan.foreach {
      case p: Project =>
        val hasScrub = p.projectList.exists(_.exists(_.isInstanceOf[RegExpReplace]))
        if (hasScrub) { if (seenGenerate) below = true else above = true }
      case _: Generate => seenGenerate = true
      case _ => ()
    }
    (above, below)
  }

  test("pushes an explode-independent scrub below the Generate, same rows") {
    val optimized = chunkThenScrub.queryExecution.optimizedPlan
    assert(scrubPosition(optimized) == ((true, false)),
      s"precondition: scrub above the Generate\n$optimized")
    val rewritten = ScrubPushdown(optimized)
    assert(scrubPosition(rewritten) == ((false, true)),
      s"scrub should sit below the Generate after rewrite\n$rewritten")
    val expected = chunkThenScrub.orderBy("doc_id", "pos").collect().toSeq
    val actual = GraftShim.ofRows(spark, rewritten)
      .orderBy("doc_id", "pos").collect().toSeq
    assert(actual == expected)
  }

  test("deduplicates semantically equal scrub chains into one pushed column") {
    val twice = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")),
        col("text"))
      .select(col("doc_id"), col("pos"),
        regexp_replace(col("text"), "[0-9]+", "<NUM>").as("s1"),
        upper(regexp_replace(col("text"), "[0-9]+", "<NUM>")).as("s2"))
    val rewritten = ScrubPushdown(twice.queryExecution.optimizedPlan)
    val pushedCols = rewritten.collect {
      case p: Project => p.projectList.count(_.name.startsWith("__scrub_pushed"))
    }.sum
    assert(pushedCols == 1, s"equal chains must push ONE column\n$rewritten")
    val expected = twice.orderBy("doc_id", "pos").collect().toSeq
    val actual = GraftShim.ofRows(spark, rewritten).orderBy("doc_id", "pos").collect().toSeq
    assert(actual == expected)
  }

  test("pushes through a Project -> Filter -> Generate chain, same rows") {
    // post-explode filter between the scrub and the Generate: the filter
    // keys on the GENERATED column so the optimizer cannot sink it, and
    // the scrub must commute past both operators
    val filtered = docs
      .select(col("doc_id"), col("text"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("pos") > 0)
      .select(col("doc_id"), col("pos"), col("tok"),
        regexp_replace(col("text"), "[0-9]+", "<NUM>").as("scrubbed"))
    val optimized = filtered.queryExecution.optimizedPlan
    assert(scrubPosition(optimized) == ((true, false)),
      s"precondition: scrub above Filter-over-Generate\n$optimized")
    val rewritten = ScrubPushdown(optimized)
    assert(scrubPosition(rewritten) == ((false, true)),
      s"scrub should sit below the Generate after rewrite\n$rewritten")
    val expected = filtered.orderBy("doc_id", "pos").collect().toSeq
    val actual = GraftShim.ofRows(spark, rewritten)
      .orderBy("doc_id", "pos").collect().toSeq
    assert(actual == expected)
  }

  test("pushes through a Project -> Project -> Generate chain, same rows") {
    // a nondeterministic middle column keeps CollapseProject from merging
    // the stacked projects, so the rule sees the two-Project shape; the
    // pushed attribute must get threaded through the middle project list
    val stacked = docs
      .select(col("doc_id"), col("text"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), col("tok"), col("text"), rand().as("r"))
      .select(col("doc_id"), col("pos"), col("r"),
        regexp_replace(col("text"), "[0-9]+", "<NUM>").as("scrubbed"))
    val optimized = stacked.queryExecution.optimizedPlan
    // precondition: the stacked-Project shape survived optimization
    val shapes = optimized.collect { case Project(_, Project(_, _: Generate)) => () }
    assert(shapes.nonEmpty, s"precondition: stacked projects over Generate\n$optimized")
    assert(scrubPosition(optimized) == ((true, false)))
    val rewritten = ScrubPushdown(optimized)
    assert(scrubPosition(rewritten) == ((false, true)),
      s"scrub should sit below the Generate after rewrite\n$rewritten")
    val expected = stacked.orderBy("doc_id", "pos")
      .select("doc_id", "pos", "scrubbed").collect().toSeq
    val actual = GraftShim.ofRows(spark, rewritten)
      .orderBy("doc_id", "pos").select("doc_id", "pos", "scrubbed").collect().toSeq
    assert(actual == expected)
  }

  test("does NOT push a scrub that references a column the middle project renames") {
    // the intermediate aliases text -> t2 with an actual transformation,
    // so the scrub's reference is NOT the generator-child's attribute and
    // the conservative child-output check must refuse the push
    val renamed = docs
      .select(col("doc_id"), col("text"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), concat(col("text"), col("tok")).as("t2"), rand().as("r"))
      .select(col("doc_id"), col("pos"), col("r"),
        regexp_replace(col("t2"), "[0-9]+", "<NUM>").as("scrubbed"))
    val optimized = renamed.queryExecution.optimizedPlan
    val rewritten = ScrubPushdown(optimized)
    assert(rewritten == optimized,
      s"scrub of a renamed/transformed column must stay put\n$rewritten")
  }

  test("does NOT push a scrub that references the generated column") {
    val dependent = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        regexp_replace(col("tok"), "[0-9]+", "<NUM>").as("scrubbed"))
    val optimized = dependent.queryExecution.optimizedPlan
    val rewritten = ScrubPushdown(optimized)
    assert(rewritten == optimized,
      s"explode-dependent scrub must stay put\n$rewritten")
  }

  test("spark.sql.extensions registration fires the rule in a real optimizer run") {
    val base = graft.SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      val d = Seq((1L, "x 9 y")).toDF("doc_id", "text")
        .select(col("doc_id"), col("text"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("tok"),
          regexp_replace(col("text"), "[0-9]+", "<NUM>").as("scrubbed"))
      val optimized = d.queryExecution.optimizedPlan
      // the rule fired iff the pushed alias exists below the Generate; on
      // a LocalRelation the optimizer then constant-folds the regex away
      // entirely (ConvertToLocalRelation), so don't look for the
      // RegExpReplace node itself — only that no scrub remains ABOVE
      val (above, _) = scrubPosition(optimized)
      assert(!above && optimized.toString.contains("__scrub_pushed"),
        s"extension-registered rule should have pushed the scrub\n$optimized")
      assert(d.orderBy("pos").select("scrubbed").as[String].collect()
        .toSeq == Seq.fill(3)("x <NUM> y"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
