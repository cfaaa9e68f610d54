package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.lake.MergeTable

/** Streaming-shaped ingestion (SURVEY.md §2.9): the reference's event-driven
  * per-file pipeline — S3 upload → Lambda trigger → Step Function → Glue job
  * with marker-file idempotency
  * (lambda/trigger_lakehouse_stepfn_on_upload/lambda_function.py:28-37,
  * lambda/lakehouse_check_processed_marker/lambda_function.py:17-28) —
  * re-expressed as file-source Structured Streaming:
  *
  *   - the file source discovers new files in the raw zone (the Lambda
  *     trigger);
  *   - the streaming checkpoint records which files each batch consumed
  *     (the `_processed_log` marker system, subsumed);
  *   - `Trigger.AvailableNow` drains everything currently available then
  *     stops (event-driven batch semantics, restart-safe);
  *   - `foreachBatch` MERGE-upserts each micro-batch into the lake table,
  *     so replays after a crash between checkpoint and commit are
  *     idempotent on the primary key (effective exactly-once).
  *
  * At scale this is the canonical continuous-ingest shape: executors list
  * and read files in parallel, per-batch work is the same distributed
  * merge as batch ingestion, and no driver-side row data ever appears.
  */
object StreamIngest {

  /** Batch key-count bound for the CDC guards' LITERAL file-skipping
    * probe — up to this many distinct batch pks collect (driver
    * metadata) and prune the guard-side table reads; wider batches
    * keep file skipping through the RELATION-valued probe (the key
    * set never leaves the cluster), falling back to the full read
    * only when the batch carries NULL pks the sampled key window
    * cannot rule out (the guards join null-safely, so a stored null
    * row must stay visible). Tunable via the `graft.guard.probe.
    * maxKeys` system property (specs exercise the over-wide path with
    * a tiny cap). */
  private[graft] def GuardProbeMaxKeys: Int =
    sys.props.get("graft.guard.probe.maxKeys")
      .flatMap(_.toIntOption).getOrElse(100000)

  /** The shared raw-zone file source. `maxFilesPerTrigger` caps each
    * micro-batch's file count; `Trigger.AvailableNow` honors it, so a
    * backfill drain becomes N bounded commits. */
  private def sourceStream(spark: SparkSession, rawDir: String,
      schema: StructType, maxFilesPerTrigger: Option[Int]): DataFrame = {
    val base = spark.readStream
      .format("csv")
      .option("header", "true")
      .schema(schema)
    maxFilesPerTrigger
      .fold(base)(n => base.option("maxFilesPerTrigger", n.toString))
      .load(rawDir)
  }

  /** Drain all currently-available files under `rawDir` into `table`.
    * Returns the number of micro-batches that carried rows.
    *
    * `maxFilesPerTrigger` bounds each micro-batch to that many input
    * files — `Trigger.AvailableNow` respects it, so a large backfill
    * drains as N bounded MERGE commits instead of ONE giant one (peak
    * shuffle ∝ cap, not ∝ backlog). Unset = whole backlog in one batch,
    * fine for steady-state event cadence; SET IT for backfills at
    * scale. */
  def runAvailableNow(
      spark: SparkSession,
      rawDir: String,
      schema: StructType,
      table: MergeTable,
      pk: String,
      checkpoint: String,
      transform: DataFrame => DataFrame = identity,
      maxFilesPerTrigger: Option[Int] = None): Long = {
    val stream = sourceStream(spark, rawDir, schema, maxFilesPerTrigger)
    @volatile var batchesWithRows = 0L
    val query = transform(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // C6 — empty-input early exit (ref: orders_etl.py:66-69)
        if (!batch.isEmpty) {
          table.merge(batch, pk)
          batchesWithRows += 1
        }
      }
      .start()
    query.awaitTermination()
    batchesWithRows
  }

  /** Streaming SCD Type-2: drain all currently-available files under
    * `rawDir` and maintain dimension HISTORY in `table` via
    * [[graft.lake.Scd2.merge]] — the CDC-dims-to-warehouse shape (a
    * change stream in, point-in-time-queryable history out).
    *
    * Each row carries its batch label in `labelCol` (a sortable
    * effective date, e.g. ISO); a micro-batch may span several labels —
    * they are applied in label order, so history stays monotone even
    * when the drain catches up over many days at once. The distinct
    * label list per batch is label-cardinality metadata (a few strings
    * to the driver), never row data. One row per (pk, label) is the
    * source contract (the same row-grain the reference's dim feeds
    * have).
    *
    * Exactly-once: the checkpoint dedups input FILES across restarts,
    * and [[graft.lake.Scd2]] is idempotent per (pk, label) wave — a
    * crash between checkpoint and commit replays the batch into a
    * no-op merge, so history never double-opens. */
  def runScd2AvailableNow(
      spark: SparkSession,
      rawDir: String,
      schema: StructType,
      table: MergeTable,
      pk: String,
      labelCol: String,
      checkpoint: String,
      transform: DataFrame => DataFrame = identity,
      maxFilesPerTrigger: Option[Int] = None): Long = {
    val stream = sourceStream(spark, rawDir, schema, maxFilesPerTrigger)
    @volatile var waves = 0L
    val query = transform(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val cached = batch.cache()
          try {
            val labels = cached
              .select(org.apache.spark.sql.functions.col(labelCol))
              .distinct().collect().map(_.get(0).toString).sorted
            labels.foreach { lab =>
              graft.lake.Scd2.merge(
                table,
                cached.filter(
                  org.apache.spark.sql.functions.col(labelCol) === lab)
                  .drop(labelCol),
                pk, lab)
              waves += 1
            }
          } finally cached.unpersist()
        }
      }
      .start()
    query.awaitTermination()
    waves
  }

  /** CDC stream → `APPLY CHANGES INTO` (composition X13 + X94): drain a
    * raw zone of change-event files — rows tagged
    * [[MergeTable.ChangeType]] plus a per-key-unique sequence column —
    * into `table` via [[MergeTable.mergeCdc]], one atomic commit per
    * micro-batch.
    *
    * Cross-batch ordering is the part a per-batch mergeCdc alone can't
    * give: a LATE event (its sequence at or below the target's stored
    * sequence for that key) arriving in a later batch must be ignored,
    * not applied last-writer-wins. The sequence column therefore lives
    * ON in the table as a regular column, and each batch is guarded by
    * one pk equi-join against the target's current (pk, seq) — exactly
    * Delta Live Tables' stored `__apply_changes` sequence discipline.
    * Within a batch, events collapse to each key's newest by sequence
    * first (ties fail fast via mergeCdc's contract).
    *
    * Exactly-once: the checkpoint dedups input files; a crash between
    * checkpoint and commit replays the batch, whose events are then all
    * at-or-below the stored sequences — the guard turns the replay into
    * an empty apply.
    *
    * A DELETE drops the key's guard row with it, so the stored (pk, seq)
    * alone can't reject a stale PRE-delete event arriving in a later
    * batch — it would silently resurrect the key. Deletes therefore
    * also record (pk, deleted-at seq) in a `_tombstones` sidecar
    * MergeTable under the target's root (safe there: the parent's
    * vacuum only touches commit-* dirs, and its reads are
    * manifest-driven), and every batch is additionally guarded against
    * it: an event at or below its key's tombstone sequence is rejected.
    * A legitimate re-insert (sequence ABOVE the tombstone) passes and
    * resurrects the key; its stale tombstone stays behind harmlessly —
    * the live (pk, seq) guard owns ordering from there. Tombstones are
    * written AFTER the data commit, so a crash between the two replays
    * into a no-op delete plus the tombstone write. This is Delta Live
    * Tables' `__apply_changes` tombstone retention; `tombstoneLateness`
    * wires the retention window to the drain's sequence high-water mark
    * (see [[expireTombstones]] for the bounded-lateness contract) so
    * the sidecar stays bounded at CDC cadence — unset keeps tombstones
    * forever (maximum safety, unbounded sidecar).
    *
    * Returns the number of micro-batches that applied at least one
    * event. */
  def runCdcAvailableNow(
      spark: SparkSession,
      rawDir: String,
      schema: StructType,
      table: MergeTable,
      pk: String,
      seqCol: String,
      checkpoint: String,
      transform: DataFrame => DataFrame = identity,
      maxFilesPerTrigger: Option[Int] = None,
      tombstoneLateness: Option[Long] = None): Long = {
    import org.apache.spark.sql.functions.{col, max}
    require(schema.fieldNames.contains(MergeTable.ChangeType),
      s"CDC stream schema needs a ${MergeTable.ChangeType} column")
    require(schema.fieldNames.contains(seqCol),
      s"CDC stream schema needs the sequence column $seqCol")
    val tombstones = MergeTable(spark,
      table.root.resolve("_tombstones").toString)
    val stream = sourceStream(spark, rawDir, schema, maxFilesPerTrigger)
    @volatile var applied = 0L
    // High-water sequence across the drain (1-row agg per batch, only
    // computed when a lateness bound asks for expiry) — anchors the
    // post-drain tombstone age-out below.
    @volatile var maxSeqSeen: Option[Long] = None
    val query = transform(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Preimages out FIRST: a full-image feed (the exact shape
        // MergeTable.changes(updateImages=true) emits) carries pre/post
        // rows sharing the event's sequence — ranking before filtering
        // could let the preimage win and silently drop the update. The
        // per-key newest-by-sequence collapse (and its duplicate-
        // sequence fail-fast) is mergeCdc's SEQUENCE BY, not ours;
        // keepSequence stores the sequence as a regular column so the
        // cross-batch guard below can read it back.
        // Cached for the batch: the guards, the key collect and the
        // merge feed all reread it — uncached, each action re-scanned
        // the batch's source files (r14 job diet: the q_stream_cdc
        // drain ran 75 flat ~0.2 s jobs, so the fix is fewer jobs).
        val events =
          batch.filter(col(MergeTable.ChangeType) =!= "update_preimage")
            .cache()
        try {
          // ONE collect answers "any events?" AND feeds the probe: the
          // distinct key set is empty iff the batch is (a null pk
          // surfaces as a null key, so all-null batches stay visible).
          val batchKeys = events.select(col(pk)).distinct()
            .limit(GuardProbeMaxKeys + 1).collect().map(_.get(0)).toSeq
        if (batchKeys.nonEmpty) {
          if (tombstoneLateness.nonEmpty) {
            val row = events.agg(max(col(seqCol).cast("long"))).head()
            if (!row.isNullAt(0)) {
              val mx = row.getLong(0)
              maxSeqSeen = Some(maxSeqSeen.fold(mx)(math.max(_, mx)))
            }
          }
          // Both guards below only need the stored rows whose pk
          // appears IN THIS BATCH — at scale that is the difference
          // between a per-batch full-table read and O(files containing
          // batch keys). The batch's distinct keys are batch-scale
          // driver metadata; they feed [[MergeTable.probeKeys]] (file
          // skipping via pk stats/bloom when the table records them —
          // tables without degrade to the full read, never to a miss),
          // and the guards' pk joins ARE the row-level residual the
          // probe contract requires. Over-wide batches stay file-
          // skipped through the relation-valued probe; only a batch
          // that may carry NULL pks reads the guard tables whole (the
          // <=> joins must still see stored null rows, and the probe
          // relation drops nulls).
          val cap = GuardProbeMaxKeys
          lazy val overWideHasNulls =
            !events.filter(col(pk).isNull).isEmpty
          def guardSide(t: MergeTable): org.apache.spark.sql.DataFrame =
            if (batchKeys.size <= cap && !batchKeys.contains(null))
              t.probeKeys(pk, batchKeys)
            else if (!overWideHasNulls)
              t.probeKeys(pk, events.select(col(pk)))
            else t.read()
          // BOTH rejection guards in ONE join (r15 job diet — the two
          // separate joins each materialized their own broadcast per
          // batch): an event must outrank its key's newest TOMBSTONE
          // sequence (a pre-delete straggler must not resurrect a
          // deleted key — the live guard can't reject it, the delete
          // removed its row) AND its key's stored LIVE sequence (late
          // events for live keys). `seq > tomb ∧ seq > cur` ≡
          // `seq > max(tomb, cur)`, so the two guard relations union
          // into one newest-sequence-per-key view first. The sidecar
          // is APPEND-ONLY (one (pk, seq) row per delete event until
          // [[expireTombstones]] ages them out) — the groupBy max is
          // the same one-row-per-key collapse the old per-batch
          // tombstone MERGE maintained (r14 job diet).
          val guardRels =
            (if (tombstones.latestVersion() == 0L) Nil
             else Seq(guardSide(tombstones)
               .select(col(pk), col(seqCol)))) ++
            (if (table.latestVersion() == 0L) Nil
             else Seq(guardSide(table).select(col(pk), col(seqCol))))
          val guarded = (
            if (guardRels.isEmpty) events
            else events.join(
              guardRels.reduce(_ unionByName _)
                .groupBy(col(pk).as("__graft_guard_pk"))
                .agg(max(col(seqCol)).as("__graft_guard_seq")),
              col(pk) <=> col("__graft_guard_pk"), "left")
              .filter(col("__graft_guard_seq").isNull ||
                col(seqCol) > col("__graft_guard_seq"))
              .drop("__graft_guard_pk", "__graft_guard_seq")
          ).cache()
          // ONE aggregation pass (materializing the cache) answers
          // both "did anything survive the guards?" and "any deletes
          // to tombstone?" — the previous two isEmpty probes each cost
          // a job
          val ctCounts = guarded
            .groupBy(col(MergeTable.ChangeType)).count().collect()
            .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1))
            .toMap
          if (ctCounts.valuesIterator.sum > 0L) {
            table.mergeCdc(guarded, pk,
              sequenceBy = Some(seqCol), keepSequence = true)
            // Record this batch's deletes AFTER the data commit (a
            // crash between the two replays into a no-op delete plus
            // this write). One row per key: the newest delete sequence.
            if (ctCounts.getOrElse("delete", 0L) > 0L) {
              val deletes = guarded
                .filter(col(MergeTable.ChangeType) === "delete")
                .groupBy(col(pk)).agg(max(col(seqCol)).as(seqCol))
              tombstones.append(deletes)
            }
            applied += 1
          }
          guarded.unpersist()
          ()
        }
        } finally events.unpersist()
      }
      .start()
    query.awaitTermination()
    // Watermark-wired tombstone retention: under the bounded-lateness
    // contract (no event ever arrives sequenced below highWater −
    // lateness), a tombstone strictly below that bound can never reject
    // anything again — each drain ages out exactly those, so the
    // sidecar stays bounded at CDC cadence instead of growing forever.
    // Rejection INSIDE the bound is untouched.
    for (lat <- tombstoneLateness; mx <- maxSeqSeen)
      expireTombstones(spark, table, seqCol, mx - lat)
    applied
  }

  /** Tombstone retention window for [[runCdcAvailableNow]]'s sidecar:
    * drop tombstones whose deleted-at sequence is below `below`. Sound
    * ONLY under a bounded-lateness contract with the source — if no
    * event can arrive sequenced below `below` (Delta's
    * `pipelines.cdc.tombstoneGCThresholdInSeconds` makes the same
    * assumption), a tombstone there can never reject anything again. An
    * event later violating the contract is admitted as if the delete
    * never happened — age-out trades storage for that risk, which is
    * why the window is the caller's explicit choice and not automatic.
    * Returns the number of tombstones dropped (0 if no sidecar
    * exists). */
  def expireTombstones(spark: SparkSession, table: MergeTable,
      seqCol: String, below: Long): Long = {
    import org.apache.spark.sql.functions.col
    val tombstones = MergeTable(spark,
      table.root.resolve("_tombstones").toString)
    if (tombstones.latestVersion() == 0L) 0L
    else {
      val expired = tombstones.read().filter(col(seqCol) < below).count()
      if (expired > 0L) tombstones.delete(col(seqCol) < below)
      expired
    }
  }
}
