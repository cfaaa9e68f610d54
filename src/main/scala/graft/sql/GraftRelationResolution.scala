package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}

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

  private def registeredName(plan: LogicalPlan): Option[String] = plan match {
    case u: UnresolvedRelation
        if !u.isStreaming && u.multipartIdentifier.size == 1 &&
          GraftSql.table(u.multipartIdentifier.head).isDefined =>
      Some(u.multipartIdentifier.head)
    case _ => None
  }

  // TOP-DOWN: RelationTimeTravel must match BEFORE its child
  // UnresolvedRelation is rewritten to the live read (bottom-up would
  // strip the version clause's anchor first)
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      // SQL time travel on a bare name (Delta's `VERSION AS OF` /
      // `TIMESTAMP AS OF` clause syntax, which Spark's parser wraps in
      // RelationTimeTravel): route to readVersion / readAsOf — the
      // same snapshot reads the Scala API and the 2-arg TVF build.
      case RelationTimeTravel(rel, ts, ver)
          if registeredName(rel).isDefined =>
        val name = registeredName(rel).get
        val t = GraftSql.table(name).get.withSession(spark)
        val df = (ver, ts) match {
          case (Some(v), _) => t.readVersion(v.toLong)
          case (_, Some(e)) if e.foldable =>
            (e.eval(), e.dataType) match {
              case (micros: java.lang.Long, TimestampType) =>
                t.readAsOf(java.time.Instant.EPOCH
                  .plusNanos(micros * 1000L))
              case (s, StringType) =>
                t.readAsOf(java.sql.Timestamp
                  .valueOf(String.valueOf(s).replace("T", " ")).toInstant)
              case (v, dt) => throw new IllegalArgumentException(
                s"graft time travel: unsupported TIMESTAMP AS OF " +
                  s"literal $v of type $dt")
            }
          case _ => t.read()
        }
        SubqueryAlias(name, df.queryExecution.logical)
      case u: UnresolvedRelation if registeredName(u).isDefined =>
        val name = u.multipartIdentifier.head
        SubqueryAlias(name,
          GraftSql.tableFunction(Seq(Literal(name))))
    }
}
