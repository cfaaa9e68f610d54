package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The row-identity PRESERVATION LAW, pinned as a lifecycle matrix
  * (r14 verdict #7 — the OccRebaseSpec discipline applied to row
  * tracking): across a mixed lifecycle of content-changing DML
  * (merge-update, DV-update, DV-delete, append) interleaved with
  * content-preserving reorganization (compact, zorder, purgeVectors)
  * and a restore,
  *
  *   1. every row UNTOUCHED by a step keeps its row_id through it,
  *   2. content-preserving steps change NO id and emit an EMPTY
  *      [[MergeTable.changesByRowId]] feed,
  *   3. content-changing steps surface in the feed as EXACTLY the
  *      touched old-ids (deletes) and fresh ids (inserts) — Delta's
  *      non-`rowTracking.preserved` contract, end to end,
  *
  * with the feed and the direct [[MergeTable.readWithRowIds]] surface
  * cross-checked after EVERY step. The feature's value is the
  * subscription surface (X206) — this matrix is its law. */
class RowIdPreservationSpec extends SparkSpec {
  import spark.implicits._

  private def ids(t: MergeTable): Map[String, Long] =
    t.readWithRowIds().collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("row_id")).toMap

  private def feed(t: MergeTable, a: Long, b: Long): Set[(Long, String)] =
    t.changesByRowId(a, b).select("row_id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("mixed-lifecycle matrix: untouched rows keep ids through " +
      "merge-update / DV-update / DV-delete / OPTIMIZE family / " +
      "restore, and the lineage feed reports exactly the touched ids") {
    val t = MergeTable(spark, tmpDir("ridlaw").toString, Some("p"),
      Seq("n"), deletionVectors = true)
      .withRowTracking
    val v1 = t.append(
      Seq(("a", "x", 1), ("b", "x", 2), ("c", "y", 3),
        ("d", "y", 4), ("e", "z", 5), ("f", "z", 6))
        .toDF("id", "p", "n").repartition(2))
    val m1 = ids(t)
    assert(m1.keySet === Set("a", "b", "c", "d", "e", "f"))

    // step 2 — MERGE-update of 'a' (copy-on-write rewrite of a's
    // file): 'a' mints a fresh id; every row a's file did NOT hold
    // keeps its id, and even b (same partition, possibly same file)
    // keeps its id iff untouched-by-rewrite — the contract is checked
    // through the FEED, which must carry exactly the rewritten ids
    val v2 = t.merge(Seq(("a", "x", 10)).toDF("id", "p", "n"), "id")
    val m2 = ids(t)
    assert(m2("a") !== m1("a"), "COW merge-update mints a fresh id")
    val f2 = feed(t, v1, v2)
    assert(f2.contains((m1("a"), "delete")) &&
      f2.contains((m2("a"), "insert")))
    // rows ABSENT from the feed must have kept their ids exactly
    val touched2 = f2.map(_._1)
    m1.foreach { case (k, rid) =>
      if (!touched2.contains(rid))
        assert(m2(k) === rid, s"untouched row $k must keep id $rid")
    }

    // step 3 — DV-UPDATE of 'c' (merge-on-read: old position joins the
    // deletion vector, the updated row lands in a fresh file): old id
    // deleted, fresh id inserted, everything else untouched
    val v3 = t.update(col("id") === "c", Map("n" -> lit(30)))
    val m3 = ids(t)
    assert(m3("c") !== m2("c"), "DV-update rewrites c's bytes under a " +
      "fresh id (non-preserved contract)")
    assert(feed(t, v2, v3) ===
      Set((m2("c"), "delete"), (m3("c"), "insert")))
    (m2 - "c").foreach { case (k, rid) => assert(m3(k) === rid) }

    // step 4 — DV-DELETE of 'b': the id vanishes; survivors in the
    // same FILE keep ids in place (no rewrite happened)
    val v4 = t.delete(col("id") === "b")
    val m4 = ids(t)
    assert(!m4.contains("b"))
    assert(feed(t, v3, v4) === Set((m3("b"), "delete")))
    (m3 - "b").foreach { case (k, rid) => assert(m4(k) === rid) }

    // steps 5-7 — the OPTIMIZE family: compact (folds the DVs),
    // zorder, purgeVectors — ids are MATERIALIZED through every
    // rewrite; the feed across each is EMPTY
    val v5 = t.compact()
    assert(ids(t) === m4, "compaction must preserve every id")
    assert(feed(t, v4, v5).isEmpty)
    val v6 = t.zorder(Seq("n"))
    assert(ids(t) === m4, "zorder must preserve every id")
    assert(feed(t, v5, v6).isEmpty)
    val v7 = t.purgeVectors()
    assert(ids(t) === m4, "purgeVectors must preserve every id")
    assert(feed(t, v6, v7).isEmpty)

    // step 8 — append 'g': insert-only feed, fresh id above every
    // prior allotment (never-reuse HWM held through the whole mix)
    val v8 = t.append(Seq(("g", "x", 7)).toDF("id", "p", "n"))
    val m8 = ids(t)
    val priorMax = (m1.values ++ m2.values ++ m3.values).max
    assert(m8("g") > priorMax, "fresh allotments stay above the HWM")
    assert(feed(t, v7, v8) === Set((m8("g"), "insert")))

    // step 9 — RESTORE to the pre-delete version: b returns under its
    // ORIGINAL id (identity is log state, so time travel restores it),
    // and the feed between head and the restore commit shows exactly
    // the delta (b back, g gone)
    val v9 = t.restore(v3)
    val m9 = ids(t)
    assert(m9("b") === m3("b"),
      "restore brings a row back under its original id")
    assert(!m9.contains("g"))
    (m4 - "g").foreach { case (k, rid) => assert(m9(k) === rid) }
    val f9 = feed(t, v8, v9)
    assert(f9.contains((m3("b"), "insert")) &&
      f9.contains((m8("g"), "delete")))
  }

  test("empty poll (fromV == toV, and metadata-only windows) keeps the " +
      "feed's FULL schema — stable across polls for fixed-schema " +
      "consumers (r14 ADVICE)") {
    val t = MergeTable(spark, tmpDir("ridempty").toString, Some("p"),
      Seq("n"), deletionVectors = true)
      .withRowTracking
    t.append(Seq(("a", "x", 1), ("b", "y", 2)).toDF("id", "p", "n")
      .coalesce(1))
    val v1 = t.latestVersion()
    val v2 = t.merge(Seq(("a", "x", 9)).toDF("id", "p", "n"), "id")
    val nonEmpty = t.changesByRowId(v1, v2)
    // fromV == toV: no changed partitions on either side — the shape
    // must still be a normal poll's, never a (row_id, _change_type)
    // stub
    val empty = t.changesByRowId(v2, v2)
    assert(empty.count() === 0L)
    assert(empty.schema.map(f => (f.name, f.dataType)) ===
      nonEmpty.schema.map(f => (f.name, f.dataType)),
      "an empty poll's schema must equal a non-empty poll's")
    // positional union — what a fixed-schema consumer does — must work
    assert(nonEmpty.union(empty).count() === nonEmpty.count())
    // a metadata-only window (constraint add) is also an empty poll
    val v3 = t.addConstraint("n_pos", "n > 0")
    val metaOnly = t.changesByRowId(v2, v3)
    assert(metaOnly.count() === 0L)
    assert(metaOnly.schema.map(f => (f.name, f.dataType)) ===
      nonEmpty.schema.map(f => (f.name, f.dataType)))
  }
}
