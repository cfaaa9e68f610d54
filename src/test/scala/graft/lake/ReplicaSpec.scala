package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** mergeCdc (APPLY CHANGES INTO) and Replica (CDF-driven table sync). */
class ReplicaSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  private def contents(df: DataFrame): Set[(String, String, Double)] =
    df.select("order_id", "date", "amount")
      .as[(String, String, Double)].collect().toSet

  private def feed(rows: (String, String, Double, String)*): DataFrame =
    rows.toDF("order_id", "date", "amount", MergeTable.ChangeType)

  test("mergeCdc applies insert + update + delete in ONE commit") {
    val t = MergeTable(spark, tmpDir("cdc").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val v0 = t.latestVersion()
    t.mergeCdc(feed(
      ("o1", "2024-01-01", 11.0, "update"),
      ("o2", "2024-01-02", 20.0, "delete"),
      ("o3", "2024-01-03", 30.0, "insert")), "order_id")
    assert(t.latestVersion() === v0 + 1)
    assert(contents(t.read()) ===
      Set(("o1", "2024-01-01", 11.0), ("o3", "2024-01-03", 30.0)))
  }

  test("mergeCdc ignores update_preimage rows (full-image feeds apply)") {
    val t = MergeTable(spark, tmpDir("cdc").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t.mergeCdc(feed(
      ("o1", "2024-01-01", 10.0, "update_preimage"),
      ("o1", "2024-01-01", 12.0, "update_postimage")), "order_id")
    assert(contents(t.read()) === Set(("o1", "2024-01-01", 12.0)))
  }

  test("mergeCdc delete of an absent key rewrites nothing") {
    val t = MergeTable(spark, tmpDir("cdc").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    val filesBefore = t.liveEntries().map(_.relPath).toSet
    t.mergeCdc(feed(("zz", "2024-09-09", 0.0, "delete")), "order_id")
    assert(contents(t.read()) === Set(("o1", "2024-01-01", 10.0)))
    assert(t.liveEntries().map(_.relPath).toSet === filesBefore,
      "absent-key delete must carry every live file over untouched")
  }

  test("mergeCdc only rewrites touched partitions") {
    val t = MergeTable(spark, tmpDir("cdc").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val untouchedBefore = t.liveEntries()
      .filter(_.partitionValue.contains("2024-01-02")).map(_.relPath).toSet
    t.mergeCdc(feed(("o1", "2024-01-01", 99.0, "update")), "order_id")
    val untouchedAfter = t.liveEntries()
      .filter(_.partitionValue.contains("2024-01-02")).map(_.relPath).toSet
    assert(untouchedAfter === untouchedBefore)
  }

  test("mergeCdc SEQUENCE BY collapses an out-of-order multi-event feed") {
    val t = MergeTable(spark, tmpDir("cdc").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val events = Seq(
      // o1: update@2 arrives before insert-ish update@1 — latest (seq 3)
      // is a delete, so o1 must end up gone.
      ("o1", "2024-01-01", 50.0, "update", 2L),
      ("o1", "2024-01-01", 40.0, "update", 1L),
      ("o1", "2024-01-01", 40.0, "delete", 3L),
      // o3: delete@1 then insert@2 (key re-created) — must survive.
      ("o3", "2024-01-03", 33.0, "delete", 1L),
      ("o3", "2024-01-03", 31.0, "insert", 2L)
    ).toDF("order_id", "date", "amount", MergeTable.ChangeType, "seq")
    t.mergeCdc(events, "order_id", sequenceBy = Some("seq"))
    assert(contents(t.read()) ===
      Set(("o2", "2024-01-02", 20.0), ("o3", "2024-01-03", 31.0)))
  }

  test("mergeCdc SEQUENCE BY rejects a tie at a key's newest sequence") {
    val t = MergeTable(spark, tmpDir("cdc").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    val tied = Seq(
      ("o1", "2024-01-01", 1.0, "update", 7L),
      ("o1", "2024-01-01", 2.0, "update", 7L)
    ).toDF("order_id", "date", "amount", MergeTable.ChangeType, "seq")
    val e = intercept[IllegalArgumentException] {
      t.mergeCdc(tied, "order_id", sequenceBy = Some("seq"))
    }
    assert(e.getMessage.contains("unique per key"))
  }

  test("Replica.sync bootstraps an empty replica from version 0") {
    val src = MergeTable(spark, tmpDir("src").toString, Some("date"))
    val rep = MergeTable(spark, tmpDir("rep").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val v = Replica.sync(src, rep, "order_id")
    assert(v === src.latestVersion())
    assert(contents(rep.read()) === contents(src.read()))
    assert(Replica.syncedVersion(rep) === v)
  }

  test("Replica.sync catches up incrementally across merge/update/delete") {
    val src = MergeTable(spark, tmpDir("src").toString, Some("date"))
    val rep = MergeTable(spark, tmpDir("rep").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    Replica.sync(src, rep, "order_id")
    src.merge(orders(("o2", "2024-01-02", 99.0), ("o3", "2024-01-03", 30.0)),
      "order_id")
    src.update(col("order_id") === "o1", Map("amount" -> lit(11.0)))
    src.delete(col("order_id") === "o3")
    val repVersionsBefore = rep.latestVersion()
    Replica.sync(src, rep, "order_id")
    assert(contents(rep.read()) === contents(src.read()))
    // three source commits arrive as ONE replica commit (atomic window)
    assert(rep.latestVersion() === repVersionsBefore + 1)
  }

  test("Replica.sync is a no-op when already current") {
    val src = MergeTable(spark, tmpDir("src").toString, Some("date"))
    val rep = MergeTable(spark, tmpDir("rep").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0)))
    Replica.sync(src, rep, "order_id")
    val v = rep.latestVersion()
    Replica.sync(src, rep, "order_id")
    assert(rep.latestVersion() === v, "current replica must not commit")
  }

  test("replaying a sync window is logically idempotent (crash recovery)") {
    val src = MergeTable(spark, tmpDir("src").toString, Some("date"))
    val rep = MergeTable(spark, tmpDir("rep").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    Replica.sync(src, rep, "order_id")
    src.merge(orders(("o1", "2024-01-01", 11.0)), "order_id")
    src.delete(col("order_id") === "o2")
    val head = src.latestVersion()
    // simulate crash-after-commit-before-watermark: apply the window
    // manually, then run sync (which replays the same window).
    rep.mergeCdc(src.changes(Replica.syncedVersion(rep), head, "order_id"),
      "order_id")
    Replica.sync(src, rep, "order_id")
    assert(contents(rep.read()) === contents(src.read()))
    assert(Replica.syncedVersion(rep) === head)
  }

  test("subscribeAvailableNow: the replica follows the source via the " +
      "graft-cdf stream, restart applies only the new window") {
    val src = MergeTable(spark, tmpDir("srep_src").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    graft.sql.GraftSql.register("srep_src", src)
    val rep = MergeTable(spark, tmpDir("srep_rep").toString, Some("date"))
    val ckpt = tmpDir("srep_ck").toString
    // drain 1: bootstrap — the initial snapshot arrives as inserts
    Replica.subscribeAvailableNow(spark, "srep_src", rep, "order_id", ckpt)
    assert(contents(rep.read()) === contents(src.read()))
    val repCommitsAfterBootstrap = rep.latestVersion()
    // source moves on: update + delete + insert
    src.merge(orders(("o1", "2024-01-01", 11.0), ("o3", "2024-01-03", 30.0)),
      "order_id")
    src.delete(col("order_id") === "o2")
    // drain 2 = a RESTARTED subscription on the same checkpoint
    Replica.subscribeAvailableNow(spark, "srep_src", rep, "order_id", ckpt)
    assert(contents(rep.read()) ===
      Set(("o1", "2024-01-01", 11.0), ("o3", "2024-01-03", 30.0)))
    assert(contents(rep.read()) === contents(src.read()))
    // the restart applied ONE net window, not a replayed bootstrap
    assert(rep.latestVersion() === repCommitsAfterBootstrap + 1)
    // nothing new → no batch, no commit
    Replica.subscribeAvailableNow(spark, "srep_src", rep, "order_id", ckpt)
    assert(rep.latestVersion() === repCommitsAfterBootstrap + 1)
  }

  test("Replica.prune keeps only the newest watermark") {
    val src = MergeTable(spark, tmpDir("src").toString, Some("date"))
    val rep = MergeTable(spark, tmpDir("rep").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0)))
    Replica.sync(src, rep, "order_id")
    src.merge(orders(("o2", "2024-01-02", 20.0)), "order_id")
    Replica.sync(src, rep, "order_id")
    Replica.prune(rep)
    val dir = rep.root.resolve("_graft_replica")
    val files = {
      val s = Files.list(dir)
      try {
        val l = new java.util.ArrayList[java.nio.file.Path]()
        s.forEach(p => { l.add(p); () })
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toList
      } finally s.close()
    }
    assert(files.size === 1)
    assert(Replica.syncedVersion(rep) === src.latestVersion())
  }

  test("restore rolls back to an old snapshot as a new auditable commit") {
    val t = MergeTable(spark, tmpDir("restore").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val v1 = t.latestVersion()
    t.merge(orders(("o1", "2024-01-01", 99.0), ("o3", "2024-01-03", 30.0)),
      "order_id")
    t.delete(col("order_id") === "o2")
    val restoredTo = t.restore(v1)
    assert(restoredTo === t.latestVersion() && restoredTo === 4L,
      "rollback is a NEW commit, history intact")
    assert(contents(t.read()) ===
      Set(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    // the pre-restore state is still reachable (auditable + revertable)
    assert(contents(t.readVersion(3L)) ===
      Set(("o1", "2024-01-01", 99.0), ("o3", "2024-01-03", 30.0)))
    // the restore commit carries only the file DELTA (metadata-only)
    val h = t.history().select("version", "n_added", "n_removed")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(h(4L)._1 > 0 && h(4L)._2 > 0)
    // restoring the current version commits nothing
    val v = t.latestVersion()
    t.restore(v)
    assert(t.latestVersion() === v)
    // the change feed across the restore shows the rollback
    val feed = t.changes(3L, 4L, "order_id")
      .select("order_id", MergeTable.ChangeType)
      .as[(String, String)].collect().toSet
    assert(feed === Set(("o1", "update"), ("o2", "insert"), ("o3", "delete")))
  }

  test("shallow clone copies no data and diverges copy-on-write") {
    import scala.jdk.CollectionConverters._
    def parquetsUnder(p: java.nio.file.Path): Seq[String] = {
      val s = Files.walk(p)
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toList
      finally s.close()
    }
    val src = MergeTable(spark, tmpDir("clsrc").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val cloneRoot = tmpDir("clone")
    val clone = src.cloneTo(cloneRoot.toString)

    // metadata-only: identical content, zero parquet under the clone
    assert(contents(clone.read()) === contents(src.read()))
    assert(parquetsUnder(cloneRoot).isEmpty, "shallow = no data copied")

    // divergence: a merge on the clone touches only o1's partition —
    // the new file lands in the CLONE root, the source is unchanged,
    // and o2's entry still points at the source file
    clone.merge(orders(("o1", "2024-01-01", 99.0)), "order_id")
    assert(contents(clone.read()) ===
      Set(("o1", "2024-01-01", 99.0), ("o2", "2024-01-02", 20.0)))
    assert(contents(src.read()) ===
      Set(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)),
      "source must never see clone writes")
    assert(parquetsUnder(cloneRoot).nonEmpty, "rewritten file is local")
    assert(clone.liveEntries().exists(_.relPath.contains("..")),
      "untouched partition still references the source")

    // the clone has its own history: v1 = clone point, v2 = the merge
    assert(clone.latestVersion() === 2L)
    assert(contents(clone.readVersion(1L)) ===
      Set(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
  }

  test("cloneTo refuses a non-empty destination") {
    val src = MergeTable(spark, tmpDir("clsrc").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0)))
    val dest = tmpDir("notempty")
    Files.writeString(dest.resolve("junk.txt"), "x")
    intercept[IllegalArgumentException] { src.cloneTo(dest.toString) }
  }

  test("cloneTo refuses a regular-file destination with the intended error") {
    val src = MergeTable(spark, tmpDir("clsrc").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0)))
    val file = tmpDir("asfile").resolve("plain.txt")
    Files.writeString(file, "x")
    // must fail the require (clear message), not surface later as a
    // FileAlreadyExistsException from createDirectories
    val e = intercept[IllegalArgumentException] { src.cloneTo(file.toString) }
    assert(e.getMessage.contains("not an empty directory"))
  }

  test("clone reads correctly when the source path has a commit-* ancestor") {
    // The rebased relPath climbs through "../commit-data/..." — an
    // ancestor that merely STARTS with "commit-" must not be mistaken
    // for the commit dir (that would corrupt basePath partition-column
    // restoration in hiveRead).
    val parent = tmpDir("anc").resolve("commit-data")
    Files.createDirectories(parent)
    val src = MergeTable(spark, parent.resolve("src").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val clone = src.cloneTo(tmpDir("clone2").toString)
    assert(contents(clone.read()) === contents(src.read()))
    assert(clone.read().columns.contains("date"),
      "partition column restored through the rebased path")
  }

  test("history lists every commit newest-first with add/remove counts") {
    val t = MergeTable(spark, tmpDir("hist").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    t.merge(orders(("o1", "2024-01-01", 11.0)), "order_id")
    t.delete(col("order_id") === "o2")
    val h = t.history()
      .select("version", "n_added", "n_removed", "has_checkpoint")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(h.map(_._1) === Seq(3L, 2L, 1L), "newest first")
    val byV = h.map(r => r._1 -> r).toMap
    assert(byV(1L)._2 === 2L && byV(1L)._3 === 0L, "overwrite adds 2 files")
    assert(byV(2L)._2 === 1L && byV(2L)._3 === 1L,
      "merge rewrote only o1's partition")
    assert(byV(3L)._2 >= 0L && byV(3L)._3 === 1L,
      "delete removed o2's file")
    assert(t.history().schema.fieldNames.contains("committed_at"))
    // operation labels (Delta's commitInfo): every commit carries its op
    t.compact()
    t.restore(3L)
    t.vacuum(java.lang.Long.MAX_VALUE / 2)
    val ops = t.history().select("version", "operation")
      .as[(Long, String)].collect().toMap
    assert(ops(1L) === "WRITE" && ops(2L) === "MERGE" &&
      ops(3L) === "DELETE" && ops(4L) === "OPTIMIZE" &&
      ops(5L) === "RESTORE" && ops(6L) === "VACUUM")
    val params = t.history().filter(col("version") === 3L)
      .select("operation_parameters").as[String].head()
    assert(params.contains("predicate="), s"DELETE params carry it: $params")
    // a PRE-FEATURE commit (2-field header) reads back with a NULL
    // operation, not an error
    val log1 = java.nio.file.Paths.get(t.root.toString, "_graft_log",
      f"${1L}%020d.txt")
    val lines = java.nio.file.Files.readAllLines(log1)
    lines.set(0, lines.get(0).split('\t').take(2).mkString("\t"))
    java.nio.file.Files.write(log1, lines)
    val legacy = t.history().filter(col("version") === 1L)
      .select("operation").collect().head
    assert(legacy.isNullAt(0), "legacy header -> null operation")
  }

  test("replica change feed mirrors the source window's net effect") {
    val src = MergeTable(spark, tmpDir("src").toString, Some("date"))
    val rep = MergeTable(spark, tmpDir("rep").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    Replica.sync(src, rep, "order_id")
    val repV0 = rep.latestVersion()
    src.merge(orders(("o1", "2024-01-01", 15.0), ("o3", "2024-01-03", 30.0)),
      "order_id")
    src.delete(col("order_id") === "o2")
    Replica.sync(src, rep, "order_id")
    val repFeed = rep.changes(repV0, rep.latestVersion(), "order_id")
      .select("order_id", MergeTable.ChangeType)
      .as[(String, String)].collect().toSet
    assert(repFeed === Set(
      ("o1", "update"), ("o2", "delete"), ("o3", "insert")))
  }

  test("Replica.sync reconciles CHECK constraints with the source") {
    val src = MergeTable(spark, tmpDir("src").toString, Some("date"))
    val rep = MergeTable(spark, tmpDir("rep").toString, Some("date"))
    src.overwrite(orders(("o1", "2024-01-01", 10.0)))
    src.addConstraint("amount_pos", "amount > 0")
    Replica.sync(src, rep, "order_id")
    // the replica enforces the source's invariant on LOCAL writes
    assert(rep.constraints === Map("amount_pos" -> "amount > 0"))
    intercept[IllegalArgumentException] {
      rep.merge(orders(("bad", "2024-01-09", -1.0)), "order_id")
    }
    // a constraint-only source commit advances the watermark without an
    // empty data commit on the replica
    src.dropConstraint("amount_pos")
    val repDataV = rep.latestVersion()
    Replica.sync(src, rep, "order_id")
    assert(Replica.syncedVersion(rep) === src.latestVersion())
    assert(rep.constraints.isEmpty)
    rep.merge(orders(("ok", "2024-01-10", -1.0)), "order_id")
    assert(rep.latestVersion() === repDataV + 2) // drop-commit + merge only
  }
}
