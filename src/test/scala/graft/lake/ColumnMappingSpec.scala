package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column mapping (metadata-only RENAME/DROP COLUMN — Delta's column
  * mapping discipline): renames and drops are single log actions; data
  * files keep their physical names forever. Current reads and the
  * change feed present the CURRENT logical schema; time travel
  * presents the schema AS OF the queried version (Delta parity). */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  test("overwrite and replaceWhere stay usable after DROP COLUMN on a " +
      "declared-schema table (conformance target excludes dropped fields)") {
    // r13 review finding: the declared schema keeps a dropped field
    // (drops are metadata-only), but toPhysical refuses any frame that
    // carries the dropped name — so a conformance check against the
    // FULL declared schema was unsatisfiable from either side
    val t = MergeTable(spark, tmpDir("cmdrop").toString, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0), ("o2", "d2", 2.0)))
    t.declareSchema(t.read().schema)
    t.dropColumn("amount")
    // full overwrite with the visible columns only
    t.overwrite(Seq(("o3", "d1")).toDF("order_id", "date"))
    assert(t.read().select("order_id", "date").as[(String, String)]
      .collect().toSet === Set(("o3", "d1")))
    // partition-scoped replacement with the visible columns only
    t.overwrite(Seq(("o4", "d1"), ("o5", "d2")).toDF("order_id", "date"))
    t.overwriteWhere(Seq(("o6", "d2")).toDF("order_id", "date"),
      col("date") === "d2")
    assert(t.read().select("order_id", "date").as[(String, String)]
      .collect().toSet === Set(("o4", "d1"), ("o6", "d2")))
    // a frame still carrying the dropped column is refused loudly
    intercept[IllegalArgumentException] {
      t.overwrite(orders(("o7", "d1", 7.0)))
    }
  }

  test("rename is metadata-only: same files, new name, data intact") {
    val t = MergeTable(spark, tmpDir("cm1").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val files = t.liveEntries().map(_.relPath).toSet
    val v = t.renameColumn("amount", "total")
    assert(t.latestVersion() === v)
    assert(t.liveEntries().map(_.relPath).toSet === files,
      "rename must not touch a single data file")
    assert(t.read().columns.toSeq === Seq("order_id", "total", "date"))
    assert(t.read().select("order_id", "total").as[(String, Double)]
      .collect().toSet === Set(("o1", 10.0), ("o2", 20.0)))
    assert(t.columnMapping === Map("amount" -> "total"))
  }

  test("writes after a rename store the PHYSICAL name; reads stay logical") {
    val dir = tmpDir("cm2").toString
    val t = MergeTable(spark, dir, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t.renameColumn("amount", "total")
    // merge with the CURRENT logical schema
    t.merge(Seq(("o2", "2024-01-02", 22.0)).toDF("order_id", "date", "total"),
      "order_id")
    assert(t.read().select("order_id", "total").as[(String, Double)]
      .collect().toSet === Set(("o1", 10.0), ("o2", 22.0)))
    // every data file on disk carries the physical name
    val raw = spark.read.parquet(t.liveEntries()
      .map(e => new java.io.File(dir, e.relPath).getAbsolutePath): _*)
    assert(raw.columns.contains("amount") && !raw.columns.contains("total"),
      "files must stay physically named across renames")
    // writing under the stale physical name fails fast (schema
    // alignment rejects it before the physical-translation guard even
    // runs; evolveSchema writes hit the guard itself)
    intercept[Exception] {
      t.merge(Seq(("o3", "2024-01-03", 33.0))
        .toDF("order_id", "date", "amount"), "order_id")
    }
    intercept[IllegalArgumentException] {
      t.merge(Seq(("o3", "2024-01-03", 33.0))
        .toDF("order_id", "date", "amount"), "order_id",
        evolveSchema = true)
    }
  }

  test("rename chains resolve through the original physical name") {
    val t = MergeTable(spark, tmpDir("cm3").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t.renameColumn("amount", "total")
    t.renameColumn("total", "gross")
    assert(t.columnMapping === Map("amount" -> "gross"))
    assert(t.read().columns.contains("gross"))
    t.merge(Seq(("o2", "2024-01-02", 20.0)).toDF("order_id", "date", "gross"),
      "order_id")
    assert(t.read().select("gross").as[Double].collect().toSet ===
      Set(10.0, 20.0))
  }

  test("drop excludes the column everywhere; the name is retired") {
    val t = MergeTable(spark, tmpDir("cm4").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t.dropColumn("amount")
    assert(t.read().columns.toSeq === Seq("order_id", "date"))
    assert(t.droppedColumns === Set("amount"))
    // schema-as-of: PRE-drop time travel still shows the column (the
    // data never left the files; Delta parity)
    assert(t.readVersion(1L).columns.contains("amount"))
    assert(t.readVersion(1L).select("amount").as[Double].collect().toSeq
      === Seq(10.0))
    // re-adding the retired name fails fast instead of resurrecting
    // data — via schema alignment on strict merges, via the
    // physical-translation guard on evolveSchema merges
    intercept[Exception] {
      t.merge(orders(("o9", "2024-09-09", 99.0)), "order_id")
    }
    intercept[IllegalArgumentException] {
      t.merge(orders(("o9", "2024-09-09", 99.0)), "order_id",
        evolveSchema = true)
    }
    // dropping a renamed column retires its PHYSICAL name
    val t2 = MergeTable(spark, tmpDir("cm4b").toString, None)
    t2.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t2.renameColumn("amount", "total")
    t2.dropColumn("total")
    assert(t2.droppedColumns === Set("amount"))
    assert(t2.read().columns.toSeq === Seq("order_id", "date"))
  }

  test("guards: partition, stats, and constraint-referenced columns are immovable") {
    val t = MergeTable(spark, tmpDir("cm5").toString, Some("date"),
      Seq("amount"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    intercept[IllegalArgumentException] { t.renameColumn("date", "day") }
    intercept[IllegalArgumentException] { t.renameColumn("amount", "amt") }
    intercept[IllegalArgumentException] { t.dropColumn("date") }
    val t2 = MergeTable(spark, tmpDir("cm5b").toString, None)
    t2.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t2.addConstraint("pos_amount", "amount >= 0")
    intercept[IllegalArgumentException] { t2.renameColumn("amount", "amt") }
    t2.dropConstraint("pos_amount")
    t2.renameColumn("amount", "amt") // allowed once the constraint is gone
    assert(t2.read().columns.contains("amt"))
  }

  test("time travel presents the schema AS OF the queried version; the " +
      "change feed stays on the current names") {
    val t = MergeTable(spark, tmpDir("cm8").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    val preRename = t.latestVersion()
    t.renameColumn("amount", "total")
    t.merge(Seq(("o2", "2024-01-02", 22.0))
      .toDF("order_id", "date", "total"), "order_id")
    val postRename = t.latestVersion()
    // Delta parity: replaying the pre-rename version shows the OLD name
    // (a reader auditing v1 sees what a reader at v1 saw)…
    assert(t.readVersion(preRename).columns.toSeq ===
      Seq("order_id", "date", "amount"))
    assert(t.readVersion(preRename).select("amount").as[Double]
      .collect().toSeq === Seq(10.0))
    // …post-rename versions show the new name…
    assert(t.readVersion(postRename).columns.toSeq ===
      Seq("order_id", "date", "total"))
    // …and the CURRENT read is unchanged by any of this.
    assert(t.read().columns.toSeq === Seq("order_id", "date", "total"))
    // CDF pinning: a change-feed window SPANNING the rename presents
    // the CURRENT logical names on every row — incremental consumers
    // need one column set across rename boundaries, which is exactly
    // why the feed does NOT adopt schema-as-of.
    val feed = t.changes(preRename, postRename, "order_id")
    assert(feed.columns.contains("total") && !feed.columns.contains("amount"))
    assert(feed.filter(col("order_id") === "o2").select("total")
      .as[Double].collect().toSeq === Seq(22.0))
  }

  test("time travel to an EMPTY version of a since-renamed table shows " +
      "the as-of names") {
    val t = MergeTable(spark, tmpDir("cm9").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t.delete(lit(true))
    val emptyV = t.latestVersion()
    t.renameColumn("amount", "total")
    t.merge(Seq(("o2", "2024-01-02", 22.0))
      .toDF("order_id", "date", "total"), "order_id")
    val at = t.readVersion(emptyV)
    assert(at.count() === 0L)
    // The rename happened AFTER emptyV, so the as-of schema carries the
    // ORIGINAL name (before the r11 fix, the empty-snapshot path applied
    // the current mapping and the as-of re-map silently no-opped,
    // showing 'total').
    assert(at.columns.toSeq === Seq("order_id", "date", "amount"))
    // and the current read still shows the current name
    assert(t.read().columns.toSeq === Seq("order_id", "date", "total"))
  }

  test("a rename-only commit produces an EMPTY change feed") {
    val t = MergeTable(spark, tmpDir("cm6").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    val v1 = t.latestVersion()
    val v2 = t.renameColumn("amount", "total")
    assert(t.changes(v1, v2, "order_id").isEmpty,
      "metadata-only commits must not emit CDF rows")
  }

  test("mapping survives checkpoints + vacuum and rides into clones") {
    val t = MergeTable(spark, tmpDir("cm7").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t.renameColumn("amount", "total")
    // push past the checkpoint interval so vacuum prunes the rename delta
    (1 to 12).foreach { i =>
      t.merge(Seq((s"x$i", "2024-02-01", i.toDouble))
        .toDF("order_id", "date", "total"), "order_id")
    }
    t.vacuum(0L)
    assert(t.read().columns.contains("total"),
      "mapping must survive via the checkpoint after vacuum")
    val c = t.cloneTo(tmpDir("cm7c").toString)
    assert(c.read().columns.contains("total"), "clones inherit the mapping")
    assert(c.columnMapping === Map("amount" -> "total"))
  }
}
