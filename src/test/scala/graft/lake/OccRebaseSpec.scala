package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Logical conflict detection in the optimistic commit (Delta's
  * ConflictChecker rebase): a commit losing the version race to a
  * PROVABLY-compatible concurrent commit must re-publish its delta at
  * the new head WITHOUT re-running the (possibly expensive) computation;
  * a true conflict must recompute exactly as before. Each case forces a
  * deterministic lost race through the LogStore seam: an instrumented
  * store lands a competing commit immediately before the first publish,
  * then the per-handle OCC counters pin which path ran. */
class OccRebaseSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  private def contents(df: DataFrame): Set[(String, String, Double)] =
    df.select("order_id", "date", "amount")
      .as[(String, String, Double)].collect().toSet

  /** A store that lets `interleave` land a competing commit immediately
    * before delegating the FIRST commit publish — a deterministic lost
    * race (checkpoint publishes, which use the `.ckpt` suffix, don't
    * trigger it). */
  private def sneaky(interleave: () => Unit): LogStore = new LogStore {
    private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    override def putIfAbsent(target: java.nio.file.Path,
        body: String): Boolean = {
      if (target.getFileName.toString.endsWith(".txt") &&
        fired.compareAndSet(false, true)) interleave()
      LogStore.Posix.putIfAbsent(target, body)
    }
  }

  test("append losing to a concurrent append REBASES — no recompute") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() => rival.append(orders(("o2", "d2", 2.0)))))
    t.append(orders(("o3", "d3", 3.0)))
    assert(t.occRebased.get() === 1L,
      "a blind append must rebase over a disjoint concurrent append")
    assert(t.occRecomputed.get() === 0L, "and never recompute for it")
    assert(contents(t.read()) ===
      Set(("o1", "d1", 1.0), ("o2", "d2", 2.0), ("o3", "d3", 3.0)))
    assert(t.latestVersion() === 3L, "both commits landed, versions dense")
  }

  test("a row-tracked append losing to a concurrent row-tracked append " +
      "REBASES, and the republication re-allots disjoint ids") {
    val root = tmpDir("occ").toString
    MergeTable(spark, root, Some("date")).withRowTracking
      .overwrite(orders(("o1", "d1", 1.0)))
    val rival = MergeTable(spark, root, Some("date")).withRowTracking
    val t = MergeTable(spark, root, Some("date")).withRowTracking
      .withLogStore(sneaky(() =>
        rival.append(orders(("o2", "d2", 2.0), ("o4", "d4", 4.0)))))
    t.append(orders(("o3", "d3", 3.0)))
    assert(t.occRebased.get() === 1L && t.occRecomputed.get() === 0L,
      "a concurrent W (row-id watermark) action is not a foreign " +
        "metadata conflict — the rebase path must still fire")
    val ids = t.readWithRowIds()
      .select("order_id", "row_id").as[(String, Long)].collect().toMap
    assert(ids.values.toSet.size === 4,
      "the republished allotment must not collide with the rival's")
    assert(ids("o3") >= 3L,
      "the loser re-allots ABOVE the winner's advanced high-water mark")
  }

  test("merge losing to a concurrent OPTIMIZE of an UNTOUCHED partition " +
      "REBASES — the compaction is content-preserving and disjoint") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0), ("o2", "d2", 2.0)))
    // second file in d1 so the compaction has something to bin-pack
    setup.append(orders(("o9", "d1", 9.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() => rival.compactWhere(col("date") === "d1")))
    // the merge touches ONLY d2 (matched key o2 + insert into d2)
    t.merge(orders(("o2", "d2", 20.0), ("o5", "d2", 5.0)), "order_id")
    assert(t.occRebased.get() === 1L,
      "a merge must rebase over a compaction of partitions it never read")
    assert(t.occRecomputed.get() === 0L,
      "the full MERGE recompute is exactly what the rebase avoids")
    assert(contents(t.read()) === Set(
      ("o1", "d1", 1.0), ("o9", "d1", 9.0),
      ("o2", "d2", 20.0), ("o5", "d2", 5.0)))
  }

  test("merge losing to a concurrent OPTIMIZE of a TOUCHED partition " +
      "RECOMPUTES — remove/remove overlap is a true conflict") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    setup.append(orders(("o9", "d1", 9.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() => rival.compactWhere(col("date") === "d1")))
    // the merge rewrites d1 — the same files the compaction rewrote
    t.merge(orders(("o1", "d1", 10.0)), "order_id")
    assert(t.occRecomputed.get() === 1L,
      "both sides rewrote d1's files — the merge must recompute")
    assert(t.occRebased.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o1", "d1", 10.0), ("o9", "d1", 9.0)))
  }

  test("merge losing to a concurrent APPEND recomputes — new rows could " +
      "match merge keys, so a data-changing commit never rebases under it") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() =>
        // the concurrent append lands the very key the merge carries —
        // a rebase would blindly insert a duplicate; the recompute
        // sees the row and UPDATES it instead
        rival.append(orders(("o7", "d7", 7.0)))))
    t.merge(orders(("o7", "d7", 70.0)), "order_id")
    assert(t.occRecomputed.get() === 1L)
    assert(t.occRebased.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o1", "d1", 1.0), ("o7", "d7", 70.0)),
      "the recomputed merge must update the concurrently-appended key")
  }

  test("compaction losing to a concurrent append REBASES — its output is " +
      "a pure function of the files it removes") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    setup.append(orders(("o2", "d1", 2.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() => rival.append(orders(("o3", "d1", 3.0)))))
    t.compact()
    assert(t.occRebased.get() === 1L,
      "the compaction consumed only its removed files — rebase, don't " +
        "re-run the rewrite")
    assert(t.occRecomputed.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o1", "d1", 1.0), ("o2", "d1", 2.0), ("o3", "d1", 3.0)),
      "the concurrently-appended file must survive the rebased compaction")
  }

  test("append losing to a concurrent METADATA commit recomputes — " +
      "constraints may have changed what the write must enforce") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() =>
        rival.addConstraint("amount_pos", "amount > 0")))
    t.append(orders(("o2", "d2", 2.0)))
    assert(t.occRecomputed.get() === 1L,
      "a concurrent schema/constraint commit invalidates any cached delta")
    assert(t.occRebased.get() === 0L)
    assert(contents(t.read()) === Set(("o1", "d1", 1.0), ("o2", "d2", 2.0)))
  }

  test("rebased commit keeps history coherent: op labels, timestamps " +
      "monotone, time travel to every version") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() => rival.append(orders(("o2", "d2", 2.0)))))
    t.append(orders(("o3", "d3", 3.0)))
    // v1 overwrite, v2 rival append, v3 rebased append
    assert(contents(t.readVersion(2L)) ===
      Set(("o1", "d1", 1.0), ("o2", "d2", 2.0)))
    assert(contents(t.readVersion(3L)) ===
      Set(("o1", "d1", 1.0), ("o2", "d2", 2.0), ("o3", "d3", 3.0)))
    val hist = t.history()
      .select("version", "committed_at", "operation")
      .as[(Long, java.sql.Timestamp, String)].collect().sortBy(_._1)
    assert(hist.length === 3)
    assert(hist.map(_._3).toSeq === Seq("WRITE", "WRITE", "WRITE"))
    val ts = hist.map(_._2.getTime).toSeq
    assert(ts === ts.sorted, "in-commit timestamps stay monotone on rebase")
  }

  // ---- r14 conflict-matrix widening (r13 verdict #6): the cells
  // Delta's ConflictChecker actually exercises, each pinned to the
  // provably-safe (rebase) or unsafe (recompute) path ----------------

  test("matrix: compaction losing to a concurrent MERGE on a DISJOINT " +
      "partition REBASES — its output is a function of its removed files") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0), ("o2", "d2", 2.0)))
    setup.append(orders(("o3", "d1", 3.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() =>
        // the merge rewrites ONLY d2 — none of the compaction's inputs
        rival.merge(orders(("o2", "d2", 20.0)), "order_id")))
    t.compactWhere(col("date") === "d1")
    assert(t.occRebased.get() === 1L,
      "a data-changing commit in a partition the compaction never " +
        "touched cannot invalidate the rewrite")
    assert(t.occRecomputed.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o1", "d1", 1.0), ("o3", "d1", 3.0), ("o2", "d2", 20.0)))
  }

  test("matrix: compaction losing to a concurrent MERGE of the SAME " +
      "partition RECOMPUTES — remove/remove is the lost-update cell") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    setup.append(orders(("o3", "d1", 3.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() =>
        rival.merge(orders(("o1", "d1", 10.0)), "order_id")))
    t.compactWhere(col("date") === "d1")
    assert(t.occRecomputed.get() === 1L,
      "both sides removed d1's files — replaying the stale rewrite " +
        "would resurrect the pre-merge rows")
    assert(t.occRebased.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o1", "d1", 10.0), ("o3", "d1", 3.0)))
  }

  test("matrix: append losing to a concurrent DV-attaching DELETE " +
      "REBASES — a blind write reads nothing a vector attach changes") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"), Nil,
      deletionVectors = true)
    // ONE part file holding both rows: the delete then ATTACHES a
    // vector (re-Add, no Remove) instead of fully erasing a file —
    // the cell under test; a fully-erasing delete removes files and
    // correctly RECOMPUTES under the undeclared-schema guard
    setup.overwrite(orders(("o1", "d1", 1.0), ("o2", "d1", 2.0))
      .coalesce(1))
    val rival = MergeTable(spark, root, Some("date"), Nil,
      deletionVectors = true)
    val t = MergeTable(spark, root, Some("date"), Nil,
      deletionVectors = true)
      .withLogStore(sneaky(() =>
        rival.delete(col("order_id") === "o2"))) // re-Add o2's file + DV
    t.append(orders(("o5", "d5", 5.0)))
    assert(t.occRebased.get() === 1L,
      "the DV re-Add touches no file the append removes — rebase")
    assert(t.occRecomputed.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o1", "d1", 1.0), ("o5", "d5", 5.0)))
  }

  test("matrix: DV-attaching DELETE losing to a concurrent OPTIMIZE of " +
      "an UNTOUCHED partition REBASES; losing to an APPEND recomputes") {
    // cell 1: compaction elsewhere is content-preserving and disjoint
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"), Nil,
      deletionVectors = true)
    setup.overwrite(orders(("o1", "d1", 1.0), ("o2", "d2", 2.0)))
    setup.append(orders(("o3", "d2", 3.0)))
    val rival = MergeTable(spark, root, Some("date"), Nil,
      deletionVectors = true)
    val t = MergeTable(spark, root, Some("date"), Nil,
      deletionVectors = true)
      .withLogStore(sneaky(() =>
        rival.compactWhere(col("date") === "d2")))
    t.delete(col("order_id") === "o1") // vectors d1 only
    assert(t.occRebased.get() === 1L,
      "compacting d2 cannot change what a d1-scoped delete read")
    assert(t.occRecomputed.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o2", "d2", 2.0), ("o3", "d2", 3.0)))

    // cell 2: an APPEND could add rows the predicate matches — the
    // stale vector set would silently miss them
    val root2 = tmpDir("occ").toString
    val setup2 = MergeTable(spark, root2, Some("date"), Nil,
      deletionVectors = true)
    setup2.overwrite(orders(("a1", "d1", 1.0)))
    val rival2 = MergeTable(spark, root2, Some("date"), Nil,
      deletionVectors = true)
    val t2 = MergeTable(spark, root2, Some("date"), Nil,
      deletionVectors = true)
      .withLogStore(sneaky(() =>
        rival2.append(orders(("a2", "d1", -2.0)))))
    t2.delete(col("amount") < 0.0)
    assert(t2.occRecomputed.get() === 1L,
      "the concurrent append landed a row the predicate matches — " +
        "the delete must recompute against the fresh snapshot")
    assert(t2.occRebased.get() === 0L)
    assert(contents(t2.read()) === Set(("a1", "d1", 1.0)),
      "the recomputed delete must also remove the appended negative row")
  }

  test("append losing to a concurrent SCHEMA-CHANGING overwrite on an " +
      "UNDECLARED-schema table recomputes — and the recompute's fresh " +
      "conformance check refuses the now-stale rows") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() =>
        // the rival REPLACES the table with a wider inferred schema —
        // a verbatim rebase of the 3-column append would publish rows
        // that no longer conform
        rival.overwrite(Seq(("o5", "d5", 5.0, "n"))
          .toDF("order_id", "date", "amount", "note"))))
    val err = intercept[IllegalArgumentException](
      t.append(orders(("o2", "d2", 2.0))))
    assert(err.getMessage.contains("append"),
      s"conformance failure expected, got: ${err.getMessage}")
    assert(t.occRecomputed.get() === 1L,
      "Nothing-scope × concurrent overwrite × undeclared schema must " +
        "take the recompute path, never rebase")
    assert(t.occRebased.get() === 0L)
    assert(t.read().columns.toSet ===
      Set("order_id", "date", "amount", "note"),
      "the failed append must not have published anything")
  }

  test("append losing to a concurrent SAME-shape overwrite recomputes " +
      "and lands — the fresh conformance check passes") {
    val root = tmpDir("occ").toString
    val setup = MergeTable(spark, root, Some("date"))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() =>
        rival.overwrite(orders(("o5", "d5", 5.0)))))
    t.append(orders(("o2", "d2", 2.0)))
    assert(t.occRecomputed.get() === 1L)
    assert(t.occRebased.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o5", "d5", 5.0), ("o2", "d2", 2.0)))
  }

  test("append losing to a concurrent overwrite on a DECLARED-schema " +
      "table still REBASES — the contract is pinned, rows stay valid") {
    val root = tmpDir("occ").toString
    import org.apache.spark.sql.types._
    val setup = MergeTable(spark, root, Some("date"))
    setup.declareSchema(StructType(Seq(
      StructField("order_id", StringType),
      StructField("date", StringType),
      StructField("amount", DoubleType))))
    setup.overwrite(orders(("o1", "d1", 1.0)))
    val rival = MergeTable(spark, root, Some("date"))
    val t = MergeTable(spark, root, Some("date"))
      .withLogStore(sneaky(() =>
        rival.overwrite(orders(("o5", "d5", 5.0)))))
    t.append(orders(("o2", "d2", 2.0)))
    assert(t.occRebased.get() === 1L,
      "a declared schema makes the overwrite conformance-preserving")
    assert(t.occRecomputed.get() === 0L)
    assert(contents(t.read()) ===
      Set(("o5", "d5", 5.0), ("o2", "d2", 2.0)))
  }
}
