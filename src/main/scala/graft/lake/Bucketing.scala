package graft.lake

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables — the co-location tool for repeated big-big
  * joins and aggregations on a stable key.
  *
  * A table bucketed AND sorted by its join key carries its partitioning
  * in metadata: joining two tables bucketed the same way (same key, same
  * bucket count) plans a SortMergeJoin with NO Exchange on either side —
  * at 100 TB that deletes the two largest shuffles of a fact-fact join.
  * Aggregations on the bucket key likewise skip their shuffle. This is
  * the Spark-native equivalent of the reference's partition-layout
  * choices (SURVEY §4 'partition pruning via layout'), applied to join
  * co-location instead of scan pruning ([[BucketedJoinSpec]] proves the
  * no-Exchange plan).
  */
object Bucketing {

  /** Write `df` as a bucketed + in-bucket-sorted managed parquet table.
    * Re-bucketing an ingest output once pays one shuffle to save one per
    * downstream join. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
