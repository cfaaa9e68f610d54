package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of per-group SUM/COUNT aggregates from a
  * [[MergeTable]] change feed — materialized-view maintenance, the
  * canonical CDF consumer (and the reason Delta's CDF emits BOTH update
  * images): instead of recomputing an aggregate table from the full
  * base table after every commit, apply only the delta between two
  * versions.
  *
  * Scale shape: the delta aggregate runs over the CHANGE FEED (log-pruned
  * to touched partitions, typically ≪ table) and collapses to one row per
  * touched group; the apply step is a group-keyed full-outer join against
  * the aggregate frame (group-cardinality-sized, ≪ base table). The base
  * table is never rescanned.
  *
  * SUM/COUNT are self-maintainable under insert/update/delete with only
  * the feed (signed contributions); MIN/MAX are not (a deleted extremum
  * needs the base) — callers needing those recompute only the affected
  * groups.
  */
object IncrementalAgg {

  /** Signed per-group delta of `sum(valCol)` and row count from a
    * `changes(..., updateImages = true)` slice: insert/update_postimage
    * contribute +, delete/update_preimage contribute −. Groups whose
    * net contribution is zero still surface (delta 0) only if they had
    * feed rows — harmless to apply. */
  def sumCountDelta(cdf: DataFrame, groupCol: String,
      valCol: String): DataFrame =
    cdf
      .withColumn("_sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy(col(groupCol))
      .agg(
        sum(col(valCol) * col("_sign")).as("delta_sum"),
        sum(col("_sign")).as("delta_rows"))

  /** Fold a delta into a `(groupCol, total_sum, n_rows)` aggregate frame;
    * groups emptied by deletes drop out, brand-new groups appear. */
  def applyDelta(agg: DataFrame, delta: DataFrame,
      groupCol: String): DataFrame =
    agg.join(delta, Seq(groupCol), "full_outer")
      .select(
        col(groupCol),
        (coalesce(col("total_sum"), lit(0.0)) +
          coalesce(col("delta_sum"), lit(0.0))).as("total_sum"),
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("delta_rows"), lit(0L))).as("n_rows"))
      .filter(col("n_rows") > 0)

  /** The full aggregate of `base` in the same shape [[applyDelta]]
    * maintains — the initial materialization and the recompute oracle. */
  def fullAggregate(base: DataFrame, groupCol: String,
      valCol: String): DataFrame =
    base.groupBy(col(groupCol))
      .agg(sum(col(valCol)).as("total_sum"), count(lit(1)).as("n_rows"))
}
