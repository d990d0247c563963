package graft.mql

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Literal, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for MQL: `spark.sql("SELECT ... FROM t WHERE mql('x > 5')")`.
  *
  * The reference exposes MQL only through its client API
  * (`find(query, ...)`, metrique/sqlalchemy.py:753-785); on Spark the
  * natural extra surface is a SQL function, so MQL predicates compose
  * with plain Spark SQL. Compilation needs the input schema (array vs
  * scalar field routing, parse.py:139-162), which a function builder
  * does not have — so `mql('...')` first becomes an [[MqlPredicate]]
  * placeholder, and a plan rule rewrites it against the child plan's
  * output attributes. Two wirings:
  *
  *  - session built with `spark.sql.extensions=graft.GraftExtensions`:
  *    [[ResolveMqlPredicate]] runs as an analyzer resolution rule — the
  *    compiled predicate joins the plan *before* optimization, so it
  *    participates in every pushdown/pruning rule like a hand-written
  *    filter (at 100 TB this is what keeps the parquet scan selective);
  *  - already-running session (`GraftExtensions.register(spark)`):
  *    the same rewrite is appended to
  *    `spark.experimental.extraOptimizations`. That batch runs last in
  *    the logical optimizer, which still precedes physical planning —
  *    V1 file-source pushdown and column pruning happen in
  *    `FileSourceStrategy`, so a `WHERE mql(...)` directly over a
  *    parquet table still reaches the scan as `PushedFilters`.
  */
case class MqlPredicate(query: String) extends LeafExpression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def sql: String = s"mql('$query')"
}

object MqlSql {

  /** Function builder: `mql('<query string literal>')`. */
  def builder(args: Seq[Expression]): Expression = args match {
    case Seq(Literal(s: UTF8String, StringType)) => MqlPredicate(s.toString)
    case _ => throw new IllegalArgumentException(
      "mql() expects a single string literal MQL query")
  }

  private[mql] def schemaOf(plan: LogicalPlan): StructType =
    StructType(plan.children.flatMap(_.output)
      .map(a => StructField(a.name, a.dataType, a.nullable)))

  private[mql] def hasPlaceholder(plan: LogicalPlan): Boolean =
    plan.expressions.exists(_.exists(_.isInstanceOf[MqlPredicate]))
}

/** Analyzer rule: replace [[MqlPredicate]] with the compiled predicate.
  * Emitted sub-expressions (attribute refs, higher-order-function
  * lambdas from array semantics) are left unresolved — the analyzer's
  * own fixed point resolves them on the next pass.
  */
class ResolveMqlPredicate extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case p if p.childrenResolved && MqlSql.hasPlaceholder(p) =>
      val schema = MqlSql.schemaOf(p)
      p.transformExpressions {
        case MqlPredicate(q) =>
          GraftColumnBridge.catalystExpression(Compiler.compile(q, schema))
      }
  }
}

/** Post-analysis rewrite for running sessions
  * (`spark.experimental.extraOptimizations`): the compiled predicate
  * must come out fully resolved (the analyzer will not run again), so
  * resolve it by pushing a synthetic `Filter` through the session
  * analyzer against the already-resolved child.
  */
class RewriteMqlPredicate(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // childless nodes (SELECT mql('..') with no FROM) have no schema to
    // compile against — leave the placeholder for execution to reject
    case p if p.children.nonEmpty && MqlSql.hasPlaceholder(p) =>
      val schema = MqlSql.schemaOf(p)
      val child = p.children.head
      p.transformExpressions {
        case MqlPredicate(q) =>
          val compiled = GraftColumnBridge.catalystExpression(Compiler.compile(q, schema))
          spark.sessionState.analyzer.execute(Filter(compiled, child)) match {
            case Filter(cond, _) => cond
            case other => throw new IllegalStateException(
              s"mql() resolution produced unexpected plan: $other")
          }
      }
  }
}
