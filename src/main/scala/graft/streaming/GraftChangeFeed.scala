package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.GraftStreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.lake.MergeTable
import graft.sql.GraftSql

/** A [[MergeTable]] as a STRUCTURED STREAMING SOURCE — the change data
  * feed as a subscription (Delta's `readStream.format("delta")` with
  * `readChangeFeed`, the canonical way a downstream MV or replica
  * follows a lake table; reference anchor: the event-driven cadence of
  * `trigger_lakehouse_stepfn_on_upload/lambda_function.py:28-37`,
  * where every upstream commit wakes the downstream pipeline):
  *
  * {{{
  *   GraftSql.register("t", table)
  *   spark.readStream.format("graft-cdf")
  *     .option("table", "t").option("pk", "o_orderkey")
  *     .load()                 // rows: pk, <cols...>, _change_type
  * }}}
  *
  * THE COMMIT LOG IS THE WAL — version = offset:
  *  - `latestOffset` is one driver-side `latestVersion()` log listing
  *    (admission-controlled: `maxVersionsPerTrigger` caps each batch,
  *    and `Trigger.AvailableNow` pins the drain head at query start —
  *    first-class via [[SupportsTriggerAvailableNow]], so a capped
  *    drain runs SEVERAL batches to exactly that head and stops, with
  *    no single-batch fallback);
  *  - batch (vA, vB] is `changes(vA, vB, pk, updateImages = true)` —
  *    log-pruned to partitions whose file sets differ, computed lazily
  *    and fully distributed (the driver never holds row data);
  *  - offsets are checkpointed by the engine, so a RESTART resumes
  *    from the last committed version and re-emits nothing — and a
  *    re-executed batch replays IDENTICALLY because both snapshot
  *    bounds are immutable committed versions (exactly-once across the
  *    foreachBatch/idempotent-sink contract, same as Delta's source);
  *  - the first batch is `changes(startingVersion, v)`: with the
  *    default `startingVersion = 0` that is the INITIAL SNAPSHOT as
  *    inserts (Delta's default), or pass the version to start after.
  *
  * Tables resolve through the [[GraftSql]] registry (the handle owns
  * the layout contract), rebound to the session running the stream.
  * Vacuum interplay: the default 7-day retention window protects every
  * version a restarting stream can need; `vacuum(0)` under a live
  * subscription voids that (documented trade, as in Delta).
  *
  * Schema is FIXED at stream start (the engine requires it): renames /
  * drops / evolveSchema merges UNDER a live subscription change the
  * feed's columns and fail the stream on the next batch — restart the
  * stream to adopt the new schema (Delta's source has the same
  * contract). */
class GraftChangeFeedSource(
    spark: SparkSession,
    t: MergeTable,
    pk: String,
    startVersion: Long,
    declared: StructType,
    maxVersionsPerTrigger: Option[Long] = None) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  override def schema: StructType = declared

  /** Pinned at query start by [[prepareForTriggerAvailableNow]]: an
    * AvailableNow run drains to exactly THIS head — possibly across
    * several rate-limited batches — then stops, even if the source
    * table keeps committing underneath (the AvailableNow contract;
    * same design as `FileStreamSource.allFilesForTriggerAvailableNow`).
    * One source instance serves one query run, so plain `var`s under
    * the engine's single-threaded offset protocol. */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(t.latestVersion())

  /** `maxVersionsPerTrigger` rides the engine's admission-control
    * channel as a [[ReadMaxRows]] — "rows" at this layer are whatever
    * unit the source admits by (cf. FileStreamSource's maxFiles); only
    * this source ever interprets its own limit, in [[latestOffset]]. */
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val from = Option(start).map(version).getOrElse(startVersion)
    val head = availableNowCap.getOrElse(t.latestVersion())
    val to = limit match {
      case r: ReadMaxRows => math.min(from + r.maxRows(), head)
      case _              => head
    }
    if (to <= from) null else LongOffset(to)
  }

  override def reportLatestOffset(): V2Offset = LongOffset(t.latestVersion())

  /** The engine routes admission-control sources through
    * [[latestOffset]]; the legacy entry point must not be reachable. */
  override def getOffset: Option[V1Offset] =
    throw new UnsupportedOperationException(
      "graft-cdf implements SupportsAdmissionControl — latestOffset is the entry point")

  private def version(o: V2Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    // restart path variants deserialize to a JSON-carrying offset —
    // LongOffset's json IS the bare number
    case other               => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(version).getOrElse(startVersion)
    val to = version(end)
    if (to <= from)
      return GraftStreamShim.emptyStreamingBatch(spark, declared)
    val feed = t.changes(from, to, pk, updateImages = true)
      // pin the declared column order/set — the engine aligns batch
      // output to the source schema positionally
      .select(declared.fieldNames.map(col).toSeq: _*)
    GraftStreamShim.asStreamingBatch(spark, feed)
  }

  override def stop(): Unit = ()
}

/** `format("graft-cdf")` provider (registered via
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`,
  * or addressable by fully-qualified class name). Options:
  * `table` (registered name, required), `pk` (the key column the feed
  * diffs on, required — same contract as [[MergeTable.changes]]),
  * `startingVersion` (emit changes AFTER this version; default 0 =
  * initial snapshot as inserts), `startingTimestamp` (resolve that
  * version from a wall-clock instant instead — mutually exclusive
  * with `startingVersion`), `maxVersionsPerTrigger` (bound each
  * micro-batch to at most this many source versions — the X144
  * bounded-backfill discipline for subscriptions: a long-idle consumer
  * catches up in capped, individually-committed windows instead of one
  * giant batch; default unbounded). */
class GraftChangeFeedProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def resolve(parameters: Map[String, String],
      spark: SparkSession): (MergeTable, String, Long) = {
    val name = parameters.getOrElse("table", throw new IllegalArgumentException(
      "graft-cdf: option 'table' (a GraftSql-registered name) is required"))
    val pk = parameters.getOrElse("pk", throw new IllegalArgumentException(
      "graft-cdf: option 'pk' (the change-feed key column) is required"))
    val t = GraftSql.table(name).getOrElse(throw new IllegalArgumentException(
      s"graft-cdf: no table registered as '$name' — call GraftSql.register " +
        "(or REGISTER GRAFT TABLE) first"))
    val bound = t.withSession(spark)
    val startV = (parameters.get("startingVersion"),
        parameters.get("startingTimestamp")) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "graft-cdf: startingVersion and startingTimestamp are mutually " +
          "exclusive")
      case (Some(v), None) => v.toLong
      // Delta's startingTimestamp: emit changes AFTER the newest
      // version committed at or before the instant (the snapshot a
      // reader at that wall-clock time would have seen)
      case (None, Some(ts)) =>
        bound.versionAsOf(graft.sql.GraftSql.parseTs(ts))
      case (None, None) => 0L
    }
    (bound, pk, startV)
  }

  private def maxVersions(parameters: Map[String, String]): Option[Long] = {
    val v = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    v.foreach(n => require(n > 0,
      s"graft-cdf: maxVersionsPerTrigger must be positive, got $n"))
    v
  }

  /** The feed schema: pk first, then the table's remaining columns in
    * table order, then `_change_type` — exactly
    * [[MergeTable.changes]]'s column order. Metadata-scale to compute
    * (one manifest read; no jobs). */
  private def feedSchema(t: MergeTable, pk: String): StructType = {
    val base = t.read().schema
    require(base.fieldNames.contains(pk),
      s"graft-cdf: pk '$pk' is not a column of the table")
    StructType(
      base.fields.filter(_.name == pk) ++
        base.fields.filterNot(_.name == pk) :+
        StructField(MergeTable.ChangeType, StringType, nullable = true))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (t, pk, _) = resolve(parameters, sqlContext.sparkSession)
    (shortName(), schema.getOrElse(feedSchema(t, pk)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val (t, pk, startV) = resolve(parameters, spark)
    new GraftChangeFeedSource(spark, t, pk, startV,
      schema.getOrElse(feedSchema(t, pk)), maxVersions(parameters))
  }
}
