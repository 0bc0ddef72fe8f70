package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression, RegExpReplace}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
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
  * The rule rewrites every maximal deterministic RegExpReplace subtree
  * whose references are all satisfied by the generator's child, in a
  * Project sitting either directly above the Generate or one operator
  * removed from it:
  *
  *   - Project → Generate (the base shape),
  *   - Project → Filter → Generate (a post-explode filter between them;
  *     scrubbing rows the filter would drop is deterministic extra work,
  *     same trade as a row-dropping Generate, and the multiply direction
  *     still dominates),
  *   - Project → Project → Generate (a pass-through intermediate: the
  *     pushed attributes are threaded through the middle project list;
  *     scrubs referencing columns the intermediate RENAMES don't satisfy
  *     the child-output check and stay put).
  *
  * Semantically-equal subtrees are deduplicated (a scrub chain referenced
  * by several output columns is computed once). Appending — never
  * reordering — the child's output keeps the Generate's
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

  /** Rewrite `projectList` against the generator-child's output: every
    * maximal deterministic RegExpReplace subtree satisfied by `genChild`
    * becomes an attribute reference, with the deduplicated aliases to
    * plant below the Generate. None = nothing pushable.
    */
  private def rewrite(projectList: Seq[NamedExpression], genChild: LogicalPlan)
      : Option[(Seq[NamedExpression], Seq[Alias])] = {
    val childOut = genChild.outputSet
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
    if (pushed.isEmpty) None else Some((newProjectList, pushed.map(_._2).toSeq))
  }

  /** The Generate with the pushed-scrub Project planted below it. */
  private def planted(g: Generate, aliases: Seq[Alias]): Generate =
    g.copy(child = Project(g.child.output ++ aliases, g.child))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // Project → Filter → Generate: the filter passes attributes through
    // unchanged, so the child-output check is identical; the filter
    // condition keeps referencing the preserved child output
    case p @ Project(projectList, f @ Filter(_, g: Generate)) =>
      rewrite(projectList, g.child).fold(p: LogicalPlan) { case (npl, aliases) =>
        Project(npl, f.copy(child = planted(g, aliases)))
      }
    // Project → Project → Generate: thread the pushed attributes through
    // the intermediate project list (append-only, positions stable)
    case p @ Project(projectList, mid @ Project(midList, g: Generate)) =>
      rewrite(projectList, g.child).fold(p: LogicalPlan) { case (npl, aliases) =>
        Project(npl,
          mid.copy(projectList = midList ++ aliases.map(_.toAttribute),
            child = planted(g, aliases)))
      }
    // Project → Generate (the base shape)
    case p @ Project(projectList, g: Generate) =>
      rewrite(projectList, g.child).fold(p: LogicalPlan) { case (npl, aliases) =>
        Project(npl, planted(g, aliases))
      }
  }
}
