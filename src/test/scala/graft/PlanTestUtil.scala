package graft

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Shared executed-plan walkers for the no-reshuffle contracts
  * (IncrementalIndexSpec on the batch probe, TrackStreamSpec on the
  * bucketed streaming sink). Factored out in round 14 so both specs
  * assert the SAME predicate — the two hard-won details live here once:
  * the walk must pierce AQE query-stage boundaries (`QueryStageExec
  * .children` is Nil, so a naive child walk vacuously passes), and scans
  * are identified by OUTPUT COLUMNS (bucketed tables scan through
  * FileSourceScanExec whether catalog- or path-addressed).
  */
object PlanTestUtil {

  /** Every node of the executed plan, descending through adaptive roots,
    * query stages and reused exchanges.
    */
  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(nodes)
  }

  /** File scans whose output covers `cols` — the column-fingerprint way
    * to find a specific table's scan without depending on path strings.
    */
  def scansOf(p: SparkPlan, cols: Set[String]): Seq[SparkPlan] =
    nodes(p).collect {
      case s: FileSourceScanExec if cols.subsetOf(s.output.map(_.name).toSet) => s
    }

  /** The history-side contract, precisely: some join consuming the
    * `cols`-fingerprinted scan receives it WITHOUT any shuffle exchange
    * between scan and join. (Exchanges ABOVE the join are fine — they
    * move the candidate pairs, a batch-sized object, not the history.)
    */
  def historySideShuffleFree(p: SparkPlan, cols: Set[String]): Boolean = {
    val joins = nodes(p).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    joins.exists(_.children.exists { side =>
      scansOf(side, cols).nonEmpty && !nodes(side).exists {
        case e: ShuffleExchangeLike => scansOf(e, cols).nonEmpty
        case _ => false
      }
    })
  }
}
