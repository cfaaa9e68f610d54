package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Manifest-level file skipping as an OPTIMIZER RULE (the Delta
  * `PrepareDeltaScan` shape, registered via
  * `spark.sql.extensions=graft.functions.GraftExtensions`): a `Filter`
  * the optimizer has pushed down to a lake table's parquet relation
  * (directly, or across the projection that re-attaches manifest
  * partition values) is compiled against the table's manifest —
  * per-file min/max stats, bloom sidecars, partition values when the
  * layout carries them natively
  * ([[MergeTable.scanEntriesByCondition]], the same planner behind
  * `scan(predicate)`) — and the relation is swapped for one over only
  * the files that may match. Parquet footer pruning still applies
  * WITHIN the surviving files; this rule removes the files Spark would
  * otherwise open at all — at 100 TB the difference between touching
  * every file of a table and the handful a point/range predicate
  * admits.
  *
  * Consumers get it for free: the `graft_table` TVF expansion,
  * `spark.sql` over it, or a Scala-API `t.read().filter(...)` — any
  * relation whose file set IS a registered table's live snapshot —
  * without calling `scan()` explicitly. (A predicate on the PARTITION
  * column of a multi-commit-dir table lives on the other side of the
  * partition-value re-attach join, so it prunes ROWS but not files
  * through this rule — `scan(predicate)` remains the explicit surface
  * that file-prunes every predicate class, and compacted single-dir
  * layouts regain native partition file pruning anyway.)
  *
  * Safety gates, in match order:
  *   - every attribute the condition references must be an output of
  *     the relation ITSELF (by ExprId, not name — an alias shadowing a
  *     stats column's name can never mis-prune);
  *   - the relation's file set must EQUAL the table's live snapshot (a
  *     time-travel read's file set differs → untouched: pruning a
  *     historical relation against the LIVE manifest would be wrong);
  *   - the pruned rebuild must contain exactly one parquet relation
  *     with the original's schema (deletion-vector tables divert to
  *     the anti-join read → untouched);
  *   - the predicate compiles under the same keep-everything-on-
  *     unknown-shapes discipline as `scan()` — `scan(p) ≡
  *     read().filter(p)` is spec-pinned, and the full `Filter` stays
  *     on top as the row-level residual either way;
  *   - a relation once examined is tagged and never re-examined, so
  *     the fixed-point optimizer does the manifest probe at most once
  *     per relation per query.
  */
class GraftScanPruning(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftScanPruning.Examined

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, child) =>
      rewrite(cond, child).map(Filter(cond, _)).getOrElse(f)
  }

  /** Walk the Project chain under a Filter down to the relation; if it
    * is a registered table's live read, substitute the pruned relation
    * in place (everything above keeps its expressions and ExprIds). */
  private def rewrite(cond: Expression, plan: LogicalPlan)
      : Option[LogicalPlan] = plan match {
    case rel: LogicalRelation if rel.getTagValue(Examined).isEmpty =>
      rel.setTagValue(Examined, true)
      prunedRelation(cond, rel)
    case p @ Project(_, inner) =>
      rewrite(cond, inner).map(nc => p.copy(child = nc))
    case _ => None
  }

  /** The pruned replacement for `rel`, or None to leave it alone. */
  private def prunedRelation(cond: Expression,
      rel: LogicalRelation): Option[LogicalPlan] = {
    // no registered tables → nothing to own any relation; skip before
    // materializing the (possibly very wide) root-path set
    val registry = graft.sql.GraftSql.registered
    if (registry.isEmpty) return None
    // alias-shadowing guard: prune only on the relation's own attrs
    if (!cond.references.forall(rel.outputSet.contains)) return None
    val fsRel = rel.relation match {
      case h: HadoopFsRelation => h
      case _                   => return None
    }
    val relFiles = fsRel.location.rootPaths.map(_.toUri.getPath).toSet
    if (relFiles.isEmpty) return None
    val owner = registry.iterator.map(_._2)
      .flatMap { t =>
        val rootPath = t.root.toAbsolutePath.normalize.toString
        if (!relFiles.forall(_.startsWith(rootPath + "/"))) None
        else {
          val live = t.liveEntries()
          val livePaths = live.map(e =>
            t.root.resolve(e.relPath).toAbsolutePath.normalize.toString)
            .toSet
          // EQUALITY, not containment: a version read's set also lives
          // under root but differs from live
          if (livePaths == relFiles) Some((t, live)) else None
        }
      }.find(_ => true)
    owner.flatMap { case (t, live) =>
      val pruned = t.scanEntriesByCondition(live, cond)
      if (pruned.size == live.size) None
      else if (pruned.isEmpty) Some(LocalRelation(rel.output))
      else {
        // Structure-preserving substitution (the Delta PrepareDeltaScan
        // move): keep the ORIGINAL relation — schemas, options, format,
        // output ExprIds — and swap only its file index for one over
        // the admitted files. This survives both physical layouts (the
        // multi-dir plain-file read whose partition values re-attach
        // via the manifest join, and the compacted hive read whose
        // partition column is native — the original partitionSchema is
        // re-used for inference so value-subset type drift can't
        // happen).
        val prunedPaths = pruned.map(e => new org.apache.hadoop.fs.Path(
          t.root.resolve(e.relPath).toUri))
        val idx = new org.apache.spark.sql.execution.datasources
          .InMemoryFileIndex(spark, prunedPaths, fsRel.options,
            if (fsRel.partitionSchema.nonEmpty) Some(fsRel.partitionSchema)
            else None)
        val out = rel.copy(relation = fsRel.copy(location = idx)(spark))
        out.setTagValue(Examined, true)
        Some(out)
      }
    }
  }
}

object GraftScanPruning {
  /** Examined-marker: the fixed-point optimizer re-runs its batches;
    * the manifest probe happens at most once per relation per query. */
  private[lake] val Examined = TreeNodeTag[Boolean]("graft.scan.examined")
}
