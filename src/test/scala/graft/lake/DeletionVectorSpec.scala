package graft.lake

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion vectors (merge-on-read DELETE/UPDATE) — the Delta DV table
  * feature: writes record matched row POSITIONS instead of rewriting
  * files, reads anti-join them back out, and every manifest consumer
  * (CDF, restore, clone, vacuum, compaction, export) agrees on the
  * vectored state. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  private def contents(df: DataFrame): Set[(String, String, Double)] =
    df.select("order_id", "date", "amount")
      .as[(String, String, Double)].collect().toSet

  private def dvTable(root: String): MergeTable =
    MergeTable(spark, root, Some("date"), Nil, deletionVectors = true)

  private val fourRows = Seq(
    ("o1", "2024-01-01", 10.0), ("o2", "2024-01-01", 20.0),
    ("o3", "2024-01-02", 30.0), ("o4", "2024-01-02", 40.0))

  /** Write with one task → one file per partition, so a one-row delete
    * exercises the vector path instead of the full-file drop path. */
  private def load(t: MergeTable, rows: Seq[(String, String, Double)]): Long =
    t.overwrite(orders(rows: _*).coalesce(1))

  test("MoR delete removes rows without rewriting any data file") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    load(t, fourRows)
    val before = t.liveEntries().map(_.relPath).toSet
    t.delete(col("order_id") === "o2")
    assert(contents(t.read()) ===
      fourRows.filterNot(_._1 == "o2").toSet)
    val after = t.liveEntries()
    assert(after.map(_.relPath).toSet === before,
      "delete must not add or remove data files")
    assert(after.exists(_.dv.isDefined), "a deletion vector must exist")
    assert(after.flatMap(_.dv).map(_.card).sum === 1L)
  }

  test("MoR delete matches copy-on-write delete row-for-row") {
    val rootA = tmpDir("dv").toString
    val rootB = tmpDir("dv").toString
    val mor = dvTable(rootA)
    val cow = MergeTable(spark, rootB, Some("date"))
    mor.overwrite(orders(fourRows: _*))
    cow.overwrite(orders(fourRows: _*))
    mor.delete(col("amount") >= 30.0)
    cow.delete(col("amount") >= 30.0)
    assert(contents(mor.read()) === contents(cow.read()))
  }

  test("second delete on the same file is cumulative — one vector per file") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    load(t, ("o5", "2024-01-01", 50.0) +: fourRows)
    t.delete(col("order_id") === "o1")
    t.delete(col("order_id") === "o2")
    assert(contents(t.read()) === Set(("o5", "2024-01-01", 50.0),
      ("o3", "2024-01-02", 30.0), ("o4", "2024-01-02", 40.0)))
    // the 2024-01-01 file's single entry points at ONE vector holding
    // both positions
    val vectored = t.liveEntries().filter(_.dv.isDefined)
    assert(vectored.size === 1)
    assert(vectored.head.dv.get.card === 2L)
  }

  test("a fully-vectored file is dropped from the manifest") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    t.overwrite(orders(fourRows: _*))
    t.delete(col("date") === "2024-01-01") // the whole partition's rows
    val live = t.liveEntries()
    assert(live.forall(_.partitionValue.contains("2024-01-02")),
      s"fully-deleted file must be removed, got $live")
    assert(live.forall(_.dv.isEmpty))
    assert(contents(t.read()) ===
      Set(("o3", "2024-01-02", 30.0), ("o4", "2024-01-02", 40.0)))
  }

  test("null-predicate rows survive a MoR delete (SQL DELETE semantics)") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    t.overwrite(Seq(("o1", "2024-01-01", Some(10.0)),
      ("o2", "2024-01-01", None))
      .toDF("order_id", "date", "amount"))
    t.delete(col("amount") > 5.0)
    assert(t.read().select("order_id").as[String].collect().toSet ===
      Set("o2"))
  }

  test("MoR update rewrites only the matched rows; old file keeps a vector") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    load(t, fourRows)
    val before = t.liveEntries().map(_.relPath).toSet
    t.update(col("order_id") === "o3", Map("amount" -> lit(99.0)))
    assert(contents(t.read()) === Set(
      ("o1", "2024-01-01", 10.0), ("o2", "2024-01-01", 20.0),
      ("o3", "2024-01-02", 99.0), ("o4", "2024-01-02", 40.0)))
    val after = t.liveEntries()
    // original files all still live (one now vectored), plus new file(s)
    // carrying just the rewritten row
    assert(before.subsetOf(after.map(_.relPath).toSet))
    assert(after.exists(_.dv.isDefined))
    val newFiles = after.filterNot(e => before(e.relPath))
    assert(newFiles.nonEmpty && newFiles.forall(_.dv.isEmpty))
    val newRows = spark.read.parquet(
      newFiles.map(e => s"$root/${e.relPath}"): _*)
    assert(newRows.count() === 1L, "only the matched row is rewritten")
  }

  test("MoR update SET expressions evaluate against the old row (swap)") {
    val root = tmpDir("dv").toString
    val t = MergeTable(spark, root, None, Nil, deletionVectors = true)
    t.overwrite(Seq((1L, 2L, 3L)).toDF("k", "a", "b"))
    t.update(col("k") === 1L, Map("a" -> col("b"), "b" -> col("a")))
    assert(t.read().select("a", "b").as[(Long, Long)].collect().toSet ===
      Set((3L, 2L)))
  }

  test("change feed sees a vectorizing delete (DV-only commit is visible)") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    val v1 = t.overwrite(orders(fourRows: _*))
    val v2 = t.delete(col("order_id") === "o1")
    val feed = t.changes(v1, v2, "order_id")
    val del = feed.filter(col(MergeTable.ChangeType) === "delete")
      .select("order_id").as[String].collect().toSet
    assert(del === Set("o1"))
    assert(feed.count() === 1L, "only the deleted row changes")
  }

  test("restore rolls the vector state back (and forward restore re-applies)") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    val v1 = t.overwrite(orders(fourRows: _*))
    val v2 = t.delete(col("order_id") === "o1")
    assert(t.readVersion(v1).count() === 4L)
    assert(t.readVersion(v2).count() === 3L)
    t.restore(v1)
    assert(contents(t.read()) === fourRows.toSet)
    // restoring forward to the deleted state re-attaches the vector
    t.restore(v2)
    assert(contents(t.read()) === fourRows.filterNot(_._1 == "o1").toSet)
  }

  test("compact materializes vectors; purgeVectors rewrites ONLY vectored files") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    load(t, fourRows)
    t.delete(col("order_id") === "o1")
    val vectoredBefore = t.liveEntries().filter(_.dv.isDefined)
    val cleanBefore = t.liveEntries().filter(_.dv.isEmpty).map(_.relPath)
    assert(vectoredBefore.nonEmpty)
    t.purgeVectors()
    val after = t.liveEntries()
    assert(after.forall(_.dv.isEmpty), "purge folds every vector in")
    assert(cleanBefore.forall(p => after.exists(_.relPath == p)),
      "vector-free files are carried over untouched")
    assert(contents(t.read()) === fourRows.filterNot(_._1 == "o1").toSet)
    // idempotent: nothing left to purge → empty commit
    val v = t.purgeVectors()
    assert(t.liveEntries() === after)
    assert(v === t.latestVersion())
  }

  test("vacuum reaps superseded vector dirs, keeps referenced ones") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    load(t, ("o5", "2024-01-01", 50.0) +: fourRows)
    t.delete(col("order_id") === "o1")
    t.delete(col("order_id") === "o2") // supersedes the first vector
    def dvDirs(): Set[String] = {
      val p = java.nio.file.Paths.get(root, "_graft_dv")
      if (!Files.isDirectory(p)) Set.empty
      else scala.util.Using.resource(Files.list(p))(
        _.iterator().asScala.map(_.getFileName.toString).toSet)
    }
    assert(dvDirs().size === 2)
    t.vacuum(0L)
    val live = t.liveEntries().flatMap(_.dv).map(_.relDir.split('/').last)
    assert(dvDirs() === live.toSet, "only the referenced vector survives")
    assert(contents(t.read()) === Set(("o5", "2024-01-01", 50.0),
      ("o3", "2024-01-02", 30.0), ("o4", "2024-01-02", 40.0)))
  }

  test("clone of a vectored table reads correctly and diverges copy-on-write") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    t.overwrite(orders(fourRows: _*))
    t.delete(col("order_id") === "o4")
    val clone = t.cloneTo(tmpDir("dvclone").resolve("c").toString)
    assert(contents(clone.read()) === fourRows.filterNot(_._1 == "o4").toSet)
    // clone's own delete vectorizes into ITS root, source unchanged
    clone.delete(col("order_id") === "o1")
    assert(contents(clone.read()) ===
      Set(("o2", "2024-01-01", 20.0), ("o3", "2024-01-02", 30.0)))
    assert(contents(t.read()) === fourRows.filterNot(_._1 == "o4").toSet)
  }

  test("snapshotDir materializes vectors before export") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    load(t, fourRows)
    t.delete(col("order_id") === "o1")
    val dir = t.snapshotDir()
    val raw = spark.read.parquet(dir.toString)
    assert(raw.count() === 3L,
      "an external engine reading the export must not see deleted rows")
  }

  test("snapshotDir excludes a fully-dropped file still on disk") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    t.overwrite(orders(fourRows: _*)) // one-row files
    t.delete(col("order_id") === "o2") // full-file drop, dir unchanged
    val raw = spark.read.parquet(t.snapshotDir().toString)
    assert(raw.count() === 3L,
      "the export must not include the dropped file left behind on disk")
  }

  test("merge over a vectored table keeps untouched partitions' vectors") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    load(t, fourRows)
    t.delete(col("order_id") === "o1") // vector on 2024-01-01
    // merge touching only 2024-01-02
    t.merge(orders(("o3", "2024-01-02", 33.0)), "order_id")
    assert(contents(t.read()) === Set(
      ("o2", "2024-01-01", 20.0), ("o3", "2024-01-02", 33.0),
      ("o4", "2024-01-02", 40.0)))
    assert(t.liveEntries().exists(_.dv.isDefined),
      "the untouched partition's vector is carried over")
  }

  test("stats-based readRange stays correct on a vectored table") {
    val root = tmpDir("dv").toString
    val t = MergeTable(spark, root, Some("date"), Seq("qty"),
      deletionVectors = true)
    t.overwrite(Seq(("o1", "2024-01-01", 1L), ("o2", "2024-01-01", 5L),
      ("o3", "2024-01-02", 9L))
      .toDF("order_id", "date", "qty"))
    t.delete(col("qty") === 5L)
    // recorded min/max (1..5) is now over-approximate — safe (superset)
    assert(t.readRange("qty", 0L, 6L).select("order_id").as[String]
      .collect().toSet === Set("o1"))
    assert(t.readRange("qty", 8L, 10L).select("order_id").as[String]
      .collect().toSet === Set("o3"))
  }

  test("manifest round-trips the dv token through a checkpoint") {
    val root = tmpDir("dv").toString
    val t = dvTable(root)
    load(t, fourRows)
    t.delete(col("order_id") === "o1")
    // force a checkpoint via vacuum, then fold from it with a FRESH handle
    t.vacuum()
    val t2 = dvTable(root)
    assert(contents(t2.read()) === fourRows.filterNot(_._1 == "o1").toSet)
    assert(t2.liveEntries().exists(_.dv.isDefined))
  }

  test("incremental consumers (Replica.sync) track vectorized deletes") {
    val srcRoot = tmpDir("dv").toString
    val dstRoot = tmpDir("dvrep").toString
    val src = dvTable(srcRoot)
    src.overwrite(orders(fourRows: _*))
    val rep = MergeTable(spark, dstRoot, Some("date"))
    Replica.sync(src, rep, "order_id")
    src.delete(col("order_id") === "o2")
    Replica.sync(src, rep, "order_id")
    assert(contents(rep.read()) ===
      fourRows.filterNot(_._1 == "o2").toSet)
  }
}
