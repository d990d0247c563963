package graft.plans

import graft.functions.{ChunkDocsExpr, MinHashSigExpr, NormTokenCountExpr, QueryTfExpr, ShinglePosHashesExpr, ShingleSetExpr, TextStatsExpr, TokenDictExpr, TokenTfExpr}

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, ExprId, GreaterThan, IsNotNull, Literal, Size}
import org.apache.spark.sql.catalyst.expressions.{ExplodeBase, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Removes the redundant scan-side re-evaluation of an expensive graft
  * kernel that `InferFiltersFromGenerate` + predicate pushdown create
  * under a non-outer explode.
  *
  * The mechanism (plan-verified in round 8): a user writes
  * `select(shingle_set(text).as("hs")).select(explode($"hs"))`. The
  * generator child is then an ATTRIBUTE, so the infer rule adds
  * `isnotnull(hs) && size(hs) > 0` — cheap on the attribute — and
  * predicate pushdown substitutes the alias on the way to the scan,
  * leaving `size(shingle_set(text)) > 0 && isnotnull(shingle_set(text))`
  * in a Filter one operator BELOW the Project that computes the kernel.
  * Filter and Project are separate codegen operators with no
  * cross-operator subexpression elimination, so the tokenize+hash
  * kernel runs TWICE per row. (A direct `explode(shingle_set(text))`
  * is skipped by the infer rule as non-cheap — only the two-step
  * alias shape is hit.)
  *
  * Those conjuncts are pure optimizations: a non-outer explode of a
  * null or empty array emits no rows anyway, so dropping the rows
  * early and letting the explode drop them are row-for-row identical.
  * This rule walks the Project/Filter chain under each non-outer
  * ExplodeBase Generate, de-aliases the generator child through the
  * chain's Projects, and strips exactly the `IsNotNull(k)` /
  * `Size(k) > 0` conjuncts whose `k` semantically equals the
  * generator's kernel-bearing input. Anything else — other conjuncts,
  * filters not on the Generate's input chain, non-kernel generators —
  * is untouched, and a filter left with no conjuncts disappears.
  *
  * Runs AFTER the operator-optimization batch (pre-CBO slot at
  * builder time, the user-provided batch via
  * [[graft.GraftExtensions.register]] post-start), so it cannot
  * oscillate with the infer rule's fixpoint.
  */
class StripRedundantKernelFilters extends Rule[LogicalPlan] with PredicateHelper {

  private def isKernel(e: Expression): Boolean = e.exists {
    case _: ShingleSetExpr | _: ShinglePosHashesExpr | _: MinHashSigExpr |
        _: TokenTfExpr | _: TokenDictExpr | _: QueryTfExpr |
        _: ChunkDocsExpr | _: NormTokenCountExpr | _: TextStatsExpr => true
    case _ => false
  }

  /** Substitute accumulated Project aliases until fixpoint (bounded by
    * chain depth; each pass inlines one alias layer).
    */
  private def dealias(e: Expression, aliases: Map[ExprId, Expression]): Expression = {
    var cur = e
    var i = 0
    while (i < 16) {
      val next = cur.transformUp {
        case a: AttributeReference if aliases.contains(a.exprId) => aliases(a.exprId)
      }
      if (next.fastEquals(cur)) return cur
      cur = next
      i += 1
    }
    cur
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case g @ Generate(ge: ExplodeBase, _, false, _, _, _) =>
      val stripped = strip(g.child, ge.child, Map.empty)
      if (stripped.fastEquals(g.child)) g else g.copy(child = stripped)
  }

  /** Walk only Project/Filter nodes (anything else — an aggregate, a
    * join, a limit — observes the rows the filter drops, so stripping
    * past it would change semantics) and remove the redundant
    * conjuncts.
    */
  private def strip(
      node: LogicalPlan,
      genChild: Expression,
      aliases: Map[ExprId, Expression]): LogicalPlan = node match {
    case p @ Project(list, child) =>
      val newAliases = aliases ++
        list.collect { case a: Alias => a.exprId -> a.child }
      val strippedChild = strip(child, genChild, newAliases)
      if (strippedChild.fastEquals(child)) p else p.copy(child = strippedChild)
    case f @ Filter(cond, child) =>
      val target = dealias(genChild, aliases)
      if (!isKernel(target)) f
      else {
        val kept = splitConjunctivePredicates(cond).filterNot {
          case IsNotNull(e) => e.semanticEquals(target)
          case GreaterThan(Size(e, _), Literal(0, _)) => e.semanticEquals(target)
          case _ => false
        }
        val strippedChild = strip(child, genChild, aliases)
        if (kept.isEmpty) strippedChild
        else {
          val newCond = kept.reduce(org.apache.spark.sql.catalyst.expressions.And)
          if (newCond.fastEquals(cond) && strippedChild.fastEquals(child)) f
          else Filter(newCond, strippedChild)
        }
      }
    case other => other
  }
}
