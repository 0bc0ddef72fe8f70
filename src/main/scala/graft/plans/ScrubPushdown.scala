package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression, RegExpReplace}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pushes `regexp_replace` scrub chains below row-multiplying Generate
  * operators (explode / posexplode / inline) when the scrubbed input is
  * produced BELOW the generator — i.e. the scrub is explode-independent.
  *
  * Motivation: the PII-scrub → chunk ordering of a curation pipeline is
  * easy to get backwards. Written as chunk-then-scrub, the plan is
  *
  *   Project [regexp_replace(text, …) …]        ← runs once per CHUNK
  *     Generate posexplode(chunks(text))
  *       Relation [doc_id, text]
  *
  * and the regex engine runs fan-out× more often than needed (a 32/24
  * token chunker multiplies rows ~n_tokens/24 times; the regex cost is
  * O(len) each). Since the scrubbed column comes from the generator's
  * CHILD, the scrub commutes with the explode:
  *
  *   Project [__scrub_pushed_0 …]
  *     Generate posexplode(chunks(text))
  *       Project [doc_id, text, regexp_replace(text, …) AS __scrub_pushed_0]
  *         Relation [doc_id, text]
  *
  * The rule rewrites every maximal deterministic RegExpReplace subtree in
  * a Project directly above a Generate whose references are all satisfied
  * by the generator's child, deduplicating semantically-equal subtrees
  * (a scrub chain referenced by several output columns is computed once).
  * Appending — never reordering — the child's output keeps the Generate's
  * `unrequiredChildIndex` positions valid.
  *
  * Registered via [[graft.functions.GraftExtensions]] (optimizer-rule
  * injection); idempotent: after one rewrite the Project above the
  * Generate holds plain attribute references, so the rule no longer
  * matches. A Generate with `outer=false` can also DROP rows (empty
  * arrays); pushing below means scrubbing rows that are later dropped —
  * deterministic extra work, never a semantics change, and at corpus
  * scale the multiply direction dominates.
  */
object ScrubPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList, g @ Generate(_, _, _, _, _, child)) =>
      val childOut = child.outputSet
      val pushed = mutable.ArrayBuffer.empty[(Expression, Alias)]
      def pushRef(rr: RegExpReplace): Expression =
        pushed.find(_._1.semanticEquals(rr)) match {
          case Some((_, a)) => a.toAttribute
          case None =>
            val a = Alias(rr, s"__scrub_pushed_${pushed.size}")()
            pushed += ((rr, a))
            a.toAttribute
        }
      val newProjectList = projectList.map { ne =>
        ne.transformDown {
          case rr: RegExpReplace
            if rr.deterministic && rr.references.nonEmpty &&
              rr.references.subsetOf(childOut) => pushRef(rr)
        }.asInstanceOf[NamedExpression]
      }
      if (pushed.isEmpty) p
      else Project(newProjectList,
        g.copy(child = Project(child.output ++ pushed.map(_._2), child)))
  }
}
