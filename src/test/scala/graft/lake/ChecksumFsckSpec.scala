package graft.lake

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Snapshot checksums (Delta's per-commit `.crc` / VERSION CHECKSUM)
  * and FSCK (log-vs-storage repair). The two are complements: the
  * checksum proves the LOG still folds to the state the committer
  * published; fsck proves STORAGE still holds the files the log
  * references. */
class ChecksumFsckSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  private def items(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("id", "date", "amount")

  private def crcFiles(root: String): Seq[Path] =
    Files.list(Paths.get(root).resolve("_graft_log")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".crc")).toSeq.sortBy(_.toString)

  test("every commit writes a crc sidecar; every version verifies " +
      "across checkpoint + retention boundaries, from a fresh handle") {
    val root = tmpDir("crc").toString
    // a feature-rich handle: partition + stats + DVs + bloom + row
    // tracking, so the entry lines carry every optional token the
    // checksum must round-trip through a checkpoint fold
    val t = MergeTable(spark, root, Some("date"), Seq("id"),
      deletionVectors = true, bloomCols = Seq("id"))
      .withRowTracking
    t.overwrite(items((1L, "d1", 1.0), (2L, "d1", 2.0), (5L, "d2", 5.0))
      .coalesce(1))
    (2 to 12).foreach { i =>
      t.append(items((100L + i, "d" + (i % 9 + 1), i.toDouble)))
    }
    t.delete($"id" === 2L) // partial DV on the two-row d1 file
    t.merge(items((1L, "d1", 9.0)), "id")
    val latest = t.latestVersion()
    assert(latest >= 14L)
    assert(crcFiles(root).size === latest.toInt)
    // fresh handle: no memoized state — every verification refolds the
    // log text, including versions that now anchor on a checkpoint, so
    // this also pins the parse/serialize round-trip byte-stability the
    // checksum depends on
    val t2 = MergeTable(spark, root, Some("date"), Seq("id"),
      deletionVectors = true, bloomCols = Seq("id"))
    (1L to latest).foreach { v =>
      assert(t2.verifyChecksum(v), s"version $v should verify")
    }
  }

  test("tampered log text fails verification loudly, naming the field") {
    val root = tmpDir("crc").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(orders(("o1", "da", 1.0)))
    t.append(orders(("o2", "db", 2.0)))
    t.append(orders(("o3", "dc", 3.0)))
    // tamper v2's delta: re-point its added file at a different path
    // (a mis-merged log copy / bit-rot shape)
    val d2 = Paths.get(root).resolve("_graft_log")
      .resolve(f"${2L}%020d.txt")
    val body = new String(Files.readAllBytes(d2), "UTF-8")
    assert(body.contains("A\t"))
    Files.write(d2, body.replace(".parquet", ".tampered").getBytes("UTF-8"))
    val t2 = MergeTable(spark, root, Some("date"))
    assert(t2.verifyChecksum(1L)) // below the tamper: still green
    val e2 = intercept[IllegalStateException](t2.verifyChecksum(2L))
    assert(e2.getMessage.contains("entryXor"))
    // the divergence folds forward: v3 carries the tampered entry too
    val e3 = intercept[IllegalStateException](t2.verifyChecksum(3L))
    assert(e3.getMessage.contains("MISMATCH"))
  }

  test("withChecksumVerification refuses a tampered snapshot before " +
      "serving it; plain handles stay permissive") {
    val root = tmpDir("crcv").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(orders(("o1", "da", 1.0)))
    t.append(orders(("o2", "db", 2.0)))
    // clean table: the verifying handle serves identical results
    val vt = MergeTable(spark, root, Some("date")).withChecksumVerification
    assert(vt.read().count() === 2L)
    // tamper v2's manifest partition token — the silent-corruption
    // shape: the data files stay readable, only the log lies
    val d2 = Paths.get(root).resolve("_graft_log")
      .resolve(f"${2L}%020d.txt")
    val body = new String(Files.readAllBytes(d2), "UTF-8")
    assert(body.contains("\tdb"))
    Files.write(d2, body.replace("\tdb", "\tzz").getBytes("UTF-8"))
    // a fresh PLAIN handle happily serves the lie (opt-in contract)...
    assert(MergeTable(spark, root, Some("date")).read().count() === 2L)
    // ...the verifying handle refuses at snapshot-resolution time
    val vt2 = MergeTable(spark, root, Some("date")).withChecksumVerification
    val e = intercept[IllegalStateException](vt2.read())
    assert(e.getMessage.contains("entryXor"))
    // and keeps refusing (a failed check is never memoized as passed)
    intercept[IllegalStateException](vt2.read())
  }

  test("a missing sidecar is absence (false), not corruption") {
    val root = tmpDir("crc").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 1.0)))
    assert(t.verifyChecksum())
    Files.delete(crcFiles(root).head)
    assert(!t.verifyChecksum(1L))
    assert(t.latestVersion() === 1L)
  }

  test("vacuum prunes crc sidecars with their deltas; survivors verify") {
    val root = tmpDir("crc").toString
    val t = MergeTable(spark, root, Some("date"))
    (1 to 12).foreach { i =>
      t.overwrite(orders((s"o$i", "2024-01-01", i.toDouble)))
    }
    t.vacuum(0L)
    val left = crcFiles(root).map(_.getFileName.toString)
    // only sidecars of still-resolvable versions survive
    val oldest = left.head.stripSuffix(".crc").toLong
    assert(oldest > 1L)
    assert(t.verifyChecksum())
  }

  test("fsck drops entries whose data file storage ate; reads recover") {
    val root = tmpDir("fsck").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 1.0), ("o2", "2024-01-02", 2.0)))
    assert(t.fsckDryRun().isEmpty)
    assert(t.fsck() === 0L) // clean table: no repair commit
    // storage eats one partition's file behind the log's back
    val victim = Files.walk(Paths.get(root)).iterator().asScala
      .find(p => p.toString.contains("date=2024-01-02") &&
        p.toString.endsWith(".parquet")).get
    Files.delete(victim)
    val dry = t.fsckDryRun()
    assert(dry.size === 1 && dry.head.contains("date=2024-01-02"))
    val v = t.fsck()
    assert(v > 1L)
    assert(t.fsckDryRun().isEmpty)
    assert(t.read().select("order_id").as[String].collect().toSet ===
      Set("o1"))
    // the repair is auditable from the log alone, and its own
    // checksum verifies
    val h = t.history().orderBy($"version".desc).limit(1)
      .select("operation").as[String].collect().head
    assert(h === "FSCK")
    assert(t.verifyChecksum())
  }

  test("incremental crc (r15): remove / in-place-replace / re-add " +
      "deltas derive the same digest a fresh handle's full refold " +
      "verifies") {
    val root = tmpDir("crci").toString
    val t = MergeTable(spark, root, Some("date"), Seq("id"),
      deletionVectors = true, bloomCols = Seq("id"))
    t.overwrite(items((1L, "d1", 1.0), (2L, "d1", 2.0),
      (3L, "d2", 3.0)).coalesce(1))
    t.append(items((4L, "d2", 4.0)))          // pure add
    t.delete($"id" === 2L)                    // in-place replace (DV re-add)
    t.merge(items((3L, "d2", 9.0)), "id")     // remove + add
    t.compact()                               // rewrite every partition
    t.restore(2L)                             // re-adds old state, removes new
    val latest = t.latestVersion()
    assert(latest >= 6L)
    // every sidecar after v1 was derived INCREMENTALLY from its
    // parent's (the committing handle had the parent snapshot
    // memoized); a fresh handle recomputes each digest from the raw
    // log — a divergence anywhere in the remove/replace/re-add
    // arithmetic would THROW here, not return false
    val fresh = MergeTable(spark, root, Some("date"), Seq("id"),
      deletionVectors = true, bloomCols = Seq("id"))
    (1L to latest).foreach { v =>
      assert(fresh.verifyChecksum(v), s"version $v should verify")
    }
  }

  test("fsck: when a concurrent repair already fixed everything, the " +
      "loser returns 0 and never publishes an empty FSCK commit") {
    val root = tmpDir("fsck-race").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0)))
    t.append(orders(("o2", "d2", 2.0)))
    val victim = Files.walk(Paths.get(root)).iterator().asScala
      .find(p => p.toString.contains("date=d2") &&
        p.toString.endsWith(".parquet")).get
    Files.delete(victim)
    val v0 = t.latestVersion()
    // two uncoordinated handles race the same repair: exactly one may
    // commit; the other — whether it loses the OCC race mid-flight or
    // plans after the winner landed — must see an empty replanned
    // delta and short-circuit to 0 instead of bumping the version
    // with an all-empty 'FSCK' commit (r14 ADVICE)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t2 = MergeTable(spark, root, Some("date"))
    val f1 = Future(t.fsck())
    val f2 = Future(t2.fsck())
    val rs = Seq(Await.result(f1, 120.seconds),
      Await.result(f2, 120.seconds)).sorted
    assert(rs.head === 0L, "the loser must report no-repair-needed")
    assert(rs.last === v0 + 1, "exactly one repair commit")
    assert(t.latestVersion() === v0 + 1,
      "no spurious version bump from an empty FSCK delta")
  }

  test("fsck drops an entry whose deletion vector is gone (never " +
      "resurrects deleted rows) and clears a dangling bloom ref " +
      "(never drops intact data)") {
    val root = tmpDir("fsck").toString
    val t = MergeTable(spark, root, Some("date"), Seq("id"),
      deletionVectors = true, bloomCols = Seq("id"))
    t.overwrite(items((1L, "d1", 1.0), (2L, "d1", 2.0),
      (3L, "d2", 3.0)).coalesce(1))
    t.delete($"id" === 1L) // partial DV on the d1 file
    // eat the DV dir: the 01-01 entry is unreadable-without-resurrection
    val dvRoot = Paths.get(root).resolve("_graft_dv")
    Files.list(dvRoot).iterator().asScala.foreach { d =>
      Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    // eat the bloom sidecars: pure index metadata on the surviving file
    val bfRoot = Paths.get(root).resolve("_graft_bloom")
    Files.walk(bfRoot).iterator().asScala.toSeq.reverse
      .filterNot(_ == bfRoot).foreach(Files.delete)
    val dry = t.fsckDryRun()
    // the dry run reports EVERYTHING the repair will touch: the d1
    // entry to drop AND the d2 entry's bloom-ref clear — an empty dry
    // run must always imply a no-op fsck
    assert(dry.size === 2)
    assert(dry.exists(p => p.contains("date=d1") &&
      !p.contains("(clear bloom ref)")))
    assert(dry.exists(p => p.contains("date=d2") &&
      p.contains("(clear bloom ref)")))
    assert(t.fsck() > 0L)
    // the DV'd file is gone whole (row 2 lost WITH row 1 — loudly, via
    // the dry run — instead of row 1 silently resurrected); row 3's
    // data survives with its bloom ref cleared, so point reads fall
    // back to scanning it instead of failing on the missing sidecar
    assert(t.read().select("id").as[Long].collect().toSet === Set(3L))
    assert(t.readPoint("id", 3L).count() === 1L)
    assert(t.readPoint("id", 1L).count() === 0L)
  }
}
