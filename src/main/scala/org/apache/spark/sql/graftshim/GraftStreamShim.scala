package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** The ONE `private[sql]` bridge the graft streaming source needs —
  * isolated in its own `org.apache.spark.sql` subpackage (the same
  * technique Delta's `org.apache.spark.sql.delta` uses; everything
  * else in this library sticks to public API).
  *
  * A V1 `Source.getBatch` must return a DataFrame whose logical plan
  * is tagged `isStreaming = true` (`MicroBatchExecution` asserts it:
  * "DataFrame returned by getBatch ... did not have isStreaming=true").
  * The only way to wrap an arbitrary batch-computed plan that way is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`,
  * which is `private[sql]` — exactly how `FileStreamSource` and
  * Delta's `DeltaSource` build their per-batch frames. The RDD stays
  * lazy and fully distributed; nothing is materialized on the driver.
  */
object GraftStreamShim {

  /** `df`'s rows as a streaming-tagged DataFrame with `df`'s schema. */
  def asStreamingBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val qe = df.queryExecution
    spark.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(qe.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse bridge, for the graft streaming SINK: a V1
    * `Sink.addBatch` receives a DataFrame backed by the engine's
    * incremental execution whose plan still carries streaming sources —
    * calling `.write` on it throws ("Queries with streaming sources
    * must be executed with writeStream"). Re-wrapping the SAME lazy
    * `toRdd` as a batch-tagged frame (isStreaming = false) is how
    * Delta's `DeltaSink` hands micro-batch rows to its batch writer;
    * nothing materializes on the driver. */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val qe = df.queryExecution
    spark.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(qe.toRdd, df.schema, isStreaming = false)
  }

  /** An EMPTY streaming-tagged DataFrame with `schema`. */
  def emptyStreamingBatch(spark: SparkSession,
      schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[InternalRow], schema, isStreaming = true)
  }

  /** Unload every cached StateStoreProvider. A long-lived JVM running
    * MANY distinct streaming queries (the benchmark suite: 13+
    * stateful pipelines × repeated runs, each with a fresh checkpoint)
    * accumulates one provider set per query per run — retained state
    * maps plus background maintenance work that contaminates later
    * timings (r13 measured q_stream_sessions_cs at 14→74 s ACROSS RUNS
    * in-suite vs a stable ~9 s isolated). Production sessions keep the
    * cache — it is what makes a restarted query's state load cheap —
    * so this is benchmark/test hygiene only, exposed through the shim
    * because `StateStore` is `private[sql]`. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** A DataFrame over an arbitrary analyzed-or-not logical plan —
    * `Dataset.ofRows` is `private[sql]`. The graft manifest-backed
    * scan ([[graft.lake.ManifestFileIndex]]) needs it to hand Spark a
    * `LogicalRelation(HadoopFsRelation(...))` whose FileIndex serves
    * file statuses from MANIFEST metadata instead of driver-side
    * listing — the same construction Delta's `TahoeLogFileIndex`
    * reaches through its own `org.apache.spark.sql` subpackage. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[ClassicSession], plan)
}
