package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-validation + dedup, one pass, fully distributed.
  *
  * The reference computes the valid set then re-derives the rejects with
  * `DataFrame.subtract` — a second scan plus an EXCEPT-DISTINCT shuffle
  * (ref: product_etl.py:54-58). Here a single predicate splits the cached
  * scan into complements, and the reject branch carries its reason column
  * (ref: product_etl.py:65-67).
  */
object Validation {

  /** Validation outcome: `valid` and `rejected` are complements of `input`
    * (rejected carries `rejection_reason`). The split shares one cached scan;
    * callers MUST [[Split.unpersist]] once both branches are consumed —
    * Spark's cache manager matches by logical plan, so a leaked cache of
    * `read(dir)` silently serves STALE data to a later identical read of the
    * same dir (re-ingestion would see the previous batch). */
  final case class Split(valid: DataFrame, rejected: DataFrame,
      private val cached: DataFrame) {
    def unpersist(): Unit = { cached.unpersist(); () }
  }

  /** P2/P3/P7 — NOT-NULL validation on a required-column subset
    * (ref: product_etl.py:54-57, orders_etl.py:57-59). */
  def requireNotNull(df: DataFrame, required: Seq[String]): Split = {
    val pred = required.map(col(_).isNotNull).reduce(_ && _)
    split(df, pred, "Missing required fields")
  }

  /** General rule-based split; rules are (predicate, reasonIfViolated).
    * Rows violating several rules report the first reason (stable order).
    * Includes the DOC-ONLY rules implemented for real: value ranges
    * (docs/full_implementation_guide.md:142-143). */
  def withRules(df: DataFrame, rules: Seq[(Column, String)]): Split = {
    val reason = rules.foldRight(lit(null: String)) {
      case ((pred, why), acc) => when(!coalesce(pred, lit(false)), why)
        .otherwise(acc)
    }
    val tagged = df.withColumn("rejection_reason", reason).cache()
    Split(
      valid = tagged.filter(col("rejection_reason").isNull)
        .drop("rejection_reason"),
      rejected = tagged.filter(col("rejection_reason").isNotNull),
      cached = tagged)
  }

  private def split(df: DataFrame, pred: Column, why: String): Split =
    withRules(df, Seq(pred -> why))

  /** A1 — deterministic key-dedup. `dropDuplicates(pk)` keeps an arbitrary
    * row per key (partition-order dependent — breaks idempotent re-runs and
    * hash-compared oracles); rank by an explicit tiebreak instead.
    * `tiebreak` columns order ascending; first row per key wins.
    */
  def dedupByKey(df: DataFrame, pk: String, tiebreak: Seq[Column]): DataFrame = {
    val order = if (tiebreak.nonEmpty) tiebreak else Seq(lit(1))
    val w = Window.partitionBy(col(pk)).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** S7 — quarantine sink for rejected rows
    * (ref: product_etl.py:64-70 — CSV, header, overwrite). */
  def writeQuarantine(rejected: DataFrame, path: String): Unit =
    if (!rejected.isEmpty)
      rejected.write.mode("overwrite").option("header", "true").csv(path)
}
