package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** BARE-NAME reads of registered graft tables: `SELECT ... FROM t`
  * resolves like `FROM graft_table('t')` — the shape an analyst coming
  * from Athena types (reference `README.md:98`), with zero TVF
  * syntax. An analyzer RESOLUTION rule, injected via
  * [[graft.functions.GraftExtensions]]:
  *
  *   - it only ever matches a STILL-UNRESOLVED single-part relation,
  *     so the session catalog wins by construction — Spark's own
  *     `ResolveRelations` runs earlier in the same fixed-point batch,
  *     and a temp view or catalog table named `t` has already replaced
  *     the node before this rule sees it (precedence parity with how
  *     Delta defers to the metastore);
  *   - the substituted plan IS [[GraftSql.tableFunction]]'s — the same
  *     logical plan the Scala API and the TVF build, so predicate
  *     pushdown, partition pruning, and the
  *     [[graft.lake.GraftScanPruning]] manifest file-skipping rule all
  *     apply untouched;
  *   - the plan is wrapped in a `SubqueryAlias` carrying the bare name
  *     so qualified references (`t.col`) resolve;
  *   - streaming relations and multi-part names (`db.t`) are left
  *     alone — the registry is a flat namespace.
  */
class GraftRelationResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation
          if !u.isStreaming && u.multipartIdentifier.size == 1 &&
            GraftSql.table(u.multipartIdentifier.head).isDefined =>
        val name = u.multipartIdentifier.head
        SubqueryAlias(name,
          GraftSql.tableFunction(Seq(Literal(name))))
    }
}
