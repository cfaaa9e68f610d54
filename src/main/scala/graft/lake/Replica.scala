package graft.lake

import java.nio.file.Files

import scala.jdk.CollectionConverters._
import scala.util.Using

/** Table replication driven by the change data feed — the lakehouse
  * pattern for keeping a downstream copy (DR region, reporting store,
  * test environment) in sync WITHOUT rescanning the source: each sync
  * ships only [[MergeTable.changes]] between the last-applied source
  * version and the source's head, applied to the replica as one atomic
  * [[MergeTable.mergeCdc]] commit. The reference copies tables by full
  * re-read (ref: product_etl.py:40-47 re-reads the whole raw zone per
  * run); at 100 TB a full copy per sync is unrunnable, while a CDF
  * sync's cost tracks the CHANGED partitions only.
  *
  * The replica remembers the last source version it applied in a
  * watermark file under its own root (`_graft_replica/<v>.sync`,
  * published create-if-absent like commit deltas). Crash between the
  * mergeCdc commit and the watermark publish replays that window on the
  * next sync — safe, because applying a snapshot diff twice is a
  * logical no-op (upserts re-assert rows the replica already has,
  * deletes hit absent keys).
  *
  * Scale notes:
  *  - Sync IO is O(changed partitions), via changes()'s log-level
  *    partition pruning; an idle source costs one directory listing.
  *  - The watermark is one empty file per sync; [[prune]] keeps only
  *    the newest (older ones are never read — same discipline as
  *    vacuum's log pruning).
  *  - Bootstrap needs no special path: from version 0, changes() emits
  *    the full snapshot as inserts, and mergeCdc on an empty replica
  *    writes it directly.
  */
object Replica {
  private val SyncDir = "_graft_replica"
  private val SyncSuffix = ".sync"

  /** Last source version applied to `replica` (0 = never synced). */
  def syncedVersion(replica: MergeTable): Long = {
    val dir = replica.root.resolve(SyncDir)
    if (!Files.isDirectory(dir)) 0L
    else Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(SyncSuffix))
        .map(_.stripSuffix(SyncSuffix).toLong)
        .foldLeft(0L)(math.max)
    }
  }

  private def publishWatermark(replica: MergeTable, v: Long): Unit = {
    val dir = replica.root.resolve(SyncDir)
    Files.createDirectories(dir)
    val target = dir.resolve(f"$v%020d$SyncSuffix")
    // Create-if-absent: a concurrent sync that already published this
    // watermark is fine — both applied the same window.
    try Files.createFile(target)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  /** Catch `replica` up to `source`'s head — data via the change feed,
    * then CHECK-constraint metadata reconciled to match the source (a
    * replica that doesn't enforce the source's invariants would accept
    * local writes the source rejects). Constraint-only source commits
    * produce an empty feed — the watermark still advances, without an
    * empty data commit. Returns the source version the replica now
    * reflects. No-op when the replica is already current. */
  def sync(source: MergeTable, replica: MergeTable, pk: String): Long = {
    val from = syncedVersion(replica)
    val to = source.latestVersion()
    require(from <= to,
      s"replica at ${replica.root} is ahead of source (synced $from, " +
        s"source head $to) — is it tracking a different table?")
    if (to > from) {
      val feed = source.changes(from, to, pk)
      if (!feed.isEmpty) replica.mergeCdc(feed, pk)
      // Reconcile AFTER the data lands: a constraint the source added is
      // satisfied by the source's data, hence by the freshly-synced
      // replica data — addConstraint's existing-row validation passes.
      val want = source.constraints
      val have = replica.constraints
      have.keysIterator.filterNot(want.contains)
        .foreach(replica.dropConstraint)
      want.foreach { case (n, p) =>
        if (!have.get(n).contains(p)) {
          if (have.contains(n)) replica.dropConstraint(n)
          replica.addConstraint(n, p)
        }
      }
      publishWatermark(replica, to)
    }
    to
  }

  /** CONTINUOUS replication — the [[sync]] loop as a SUBSCRIPTION
    * through the X153 `graft-cdf` streaming source: the replica
    * follows a REGISTERED source table's change feed, each emitted
    * batch applied as one atomic [[MergeTable.mergeCdc]] commit. The
    * engine's offset checkpoint replaces the watermark files —
    * version-as-offset IS the watermark, with the engine owning
    * restart semantics: a drain after a crash or restart resumes from
    * the last committed source version and re-applies at most the
    * in-flight window, which is a logical no-op on the replica
    * (upserts re-assert rows it already has, deletes hit absent keys —
    * the same idempotence argument [[sync]] makes for its
    * crash-between-commit-and-watermark window).
    *
    * `AvailableNow` drains to the source head and returns — the cron /
    * event-driven shape (the reference's per-upload trigger cadence);
    * a `Trigger.ProcessingTime` variant of the same plan would tail
    * continuously. Bootstrap needs no special path: the source's
    * initial batch is its snapshot as inserts. */
  def subscribeAvailableNow(spark: org.apache.spark.sql.SparkSession,
      sourceName: String, replica: MergeTable, pk: String,
      checkpointDir: String): Unit = {
    val q = spark.readStream.format("graft-cdf")
      .option("table", sourceName).option("pk", pk).load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) replica.mergeCdc(b, pk)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drop all but the newest watermark file (housekeeping; old
    * watermarks are never read). */
  def prune(replica: MergeTable): Unit = {
    val keep = syncedVersion(replica)
    val dir = replica.root.resolve(SyncDir)
    if (Files.isDirectory(dir)) {
      Using.resource(Files.list(dir)) { s =>
        s.iterator().asScala.toSeq
      }.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(SyncSuffix) && n.stripSuffix(SyncSuffix).toLong < keep
      }.foreach(Files.deleteIfExists(_))
    }
  }
}
