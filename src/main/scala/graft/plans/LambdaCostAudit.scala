package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Detector for the interpreted-higher-order-function cost bug class.
  *
  * Spark evaluates higher-order functions (`transform`, `filter`,
  * `aggregate`, `zip_with`, …) interpreted, and any expression subtree
  * CAPTURED inside the lambda body — as opposed to passed in as the HOF's
  * argument — is re-evaluated once per array element. A lambda body that
  * captures a `regexp_extract_all` over the row therefore re-runs the full
  * regex for every element: O(n²) work per row that is invisible to any
  * shuffle/scan census, because the plan *shape* stays perfect (this is
  * exactly how the original `TextAnalysis.bpePairCounts` — q73 — shipped a
  * 10-15× slowdown past PlanGuardSpec's exchange budgets).
  *
  * The audit walks the optimized logical plan (post-CollapseProject, so
  * aliases that the optimizer inlines INTO a lambda are caught too),
  * collects every [[LambdaFunction]] body, and flags expression classes
  * whose per-evaluation cost is large enough that per-element
  * re-evaluation is always a bug: regex engines, JSON/CSV parsers, and
  * O(len²) string metrics. Lambda bodies referencing only their own
  * variables plus cheap scalar ops (arithmetic, length, substring,
  * comparisons) pass untouched.
  */
object LambdaCostAudit {

  /** Per-evaluation-expensive expression classes. Cheap-per-call string
    * ops (Length, Substring, Ascii, Lower, Concat, In/InSet) are
    * deliberately NOT listed: inside a lambda they cost O(element), which
    * is the price of visiting the element at all. */
  private def isExpensive(e: Expression): Boolean = e match {
    case _: RegExpExtractAll | _: RegExpExtract | _: RegExpReplace |
         _: RegExpCount | _: RegExpInStr | _: RegExpSubStr => true
    case _: JsonToStructs | _: GetJsonObject | _: JsonTuple |
         _: CsvToStructs => true
    case _: StringSplit | _: Levenshtein => true
    case _ => false
  }

  /** An expensive node operating on the lambda's OWN variable (e.g.
    * `transform(arr, x => regexp_replace(x, …))`) is the necessary
    * once-per-element work, linear overall — only an expensive subtree
    * CAPTURED from outside the lambda (no lambda-variable reference
    * anywhere beneath it) re-evaluates row-level work per element and
    * goes quadratic. */
  private def capturesNoLambdaVar(e: Expression): Boolean =
    !e.exists { case _: NamedLambdaVariable => true; case _ => false }

  /** All (lambda, expensive-node) hits in the plan — including subquery
    * plans (scalar/EXISTS/IN subqueries host their own trees, and a q73-
    * shaped lambda inside one would otherwise pass unseen). Empty = the
    * plan is free of per-element re-evaluation of parser/regex work. */
  def violations(plan: LogicalPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    def walk(p: LogicalPlan): Unit = p.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case lf: LambdaFunction =>
            lf.function.foreach { e =>
              if (isExpensive(e) && capturesNoLambdaVar(e))
                out += s"${e.getClass.getSimpleName} evaluated per-element inside lambda: ${lf.simpleString(120)}"
            }
          case sub: PlanExpression[_] =>
            sub.plan match {
              case lp: LogicalPlan => walk(lp)
              case _ => ()
            }
          case _ => ()
        }
      }
    }
    walk(plan)
    out.result().distinct
  }

  def violations(df: DataFrame): Seq[String] =
    violations(df.queryExecution.optimizedPlan)
}
