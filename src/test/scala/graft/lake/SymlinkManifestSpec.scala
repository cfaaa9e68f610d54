package graft.lake

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sql.GraftSql

/** `generateSymlinkManifest` (X162): the zero-copy export for external
  * engines that read per-partition manifest files instead of the commit
  * log (Delta's `GENERATE symlink_format_manifest`, the Athena/Presto
  * integration path). The EXTERNAL READER is simulated the way such an
  * engine actually works — collect every path listed in manifests, read
  * ONLY those parquet files, know nothing of the log — and must
  * reproduce `read()` exactly. Refusal cases pin the two
  * silent-wrong-results traps (deletion vectors, column mapping). */
class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  private def contents(df: DataFrame): Set[(String, String, Double)] =
    df.select("order_id", "date", "amount")
      .as[(String, String, Double)].collect().toSet

  /** What a SymlinkTextInputFormat reader does: list manifest files,
    * read their lines as file URIs, scan exactly those files. The
    * partition value is recovered from the manifest's OWN subdir (hive
    * `pc=value` naming), as Athena does via partition registration. */
  private def externalRead(mroot: Path): DataFrame = {
    val manifests = manifestFiles(mroot)
    val frames = manifests.map { m =>
      val uris = Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty)
      val part = mroot.relativize(m.getParent).iterator().asScala
        .map(_.toString).find(_.contains("="))
      val base = if (uris.isEmpty)
        spark.emptyDataFrame else spark.read.parquet(uris: _*)
      part match {
        case Some(pv) =>
          val Array(c, v) = pv.split("=", 2)
          base.withColumn(c,
            lit(java.net.URLDecoder.decode(v, "UTF-8")))
        case None => base
      }
    }
    frames.reduceLeft(_.unionByName(_, allowMissingColumns = true))
  }

  private def manifestFiles(mroot: Path): Seq[Path] =
    scala.util.Using.resource(Files.walk(mroot))(
      _.iterator().asScala.filter(p =>
        Files.isRegularFile(p) &&
          p.getFileName.toString == "manifest").toSeq)

  test("partitioned table: one manifest per live partition; a log-blind " +
      "reader of the manifests reproduces read() exactly") {
    val t = MergeTable(spark, tmpDir("slm1").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0),
      ("o3", "2024-01-02", 30.0)))
    val mroot = t.generateSymlinkManifest()
    assert(manifestFiles(mroot).size === 2) // one per partition
    assert(contents(externalRead(mroot)) === contents(t.read()))

    // the table moves on: a merge rewrites one partition, adds another
    t.merge(orders(("o2", "2024-01-02", 99.0), ("o4", "2024-03-03", 40.0)),
      "order_id")
    // STALE until regenerated (the documented regen-after-write
    // discipline) — old live files still exist, so the old view reads
    t.generateSymlinkManifest()
    assert(contents(externalRead(mroot)) === contents(t.read()))
    assert(manifestFiles(mroot).size === 3)
  }

  test("a vanished partition's manifest is reaped on regeneration") {
    val t = MergeTable(spark, tmpDir("slm2").toString, Some("date"))
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-02", 20.0)))
    val mroot = t.generateSymlinkManifest()
    assert(manifestFiles(mroot).size === 2)
    // delete() on a partition predicate drops the whole partition
    t.delete(col("date") === "2024-01-02") // DV-less table: a file rewrite
    t.generateSymlinkManifest()
    assert(manifestFiles(mroot).size === 1)
    assert(contents(externalRead(mroot)) === contents(t.read()))
  }

  test("unpartitioned table: a single manifest at the export root; an " +
      "empty table exports an EMPTY manifest, not a missing one") {
    val t = MergeTable(spark, tmpDir("slm3").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    val mroot = t.generateSymlinkManifest()
    assert(manifestFiles(mroot) === Seq(mroot.resolve("manifest")))
    assert(contents(externalRead(mroot)) === contents(t.read()))
    t.delete(lit(true)) // DV-less: rewrites to an empty commit
    t.generateSymlinkManifest()
    // the manifest still EXISTS (readers see "no rows", never "no
    // manifest") and the external view is empty like the table
    assert(Files.exists(mroot.resolve("manifest")))
    assert(contents(externalRead(mroot)) === Set.empty)
  }

  test("refuses deletion vectors (reader would resurrect deleted rows); " +
      "purgeVectors unblocks and the deleted row is absent externally") {
    val t = MergeTable(spark, tmpDir("slm4").toString, Some("date"),
      Nil, deletionVectors = true)
    // ONE file (coalesce) so a 1-row delete must vectorize, not erase
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-01", 20.0))
      .coalesce(1))
    t.delete(col("order_id") === "o1") // row-level → a vector, not a rewrite
    val e = intercept[IllegalArgumentException](t.generateSymlinkManifest())
    assert(e.getMessage.contains("deletion vectors"))
    t.purgeVectors()
    val mroot = t.generateSymlinkManifest()
    assert(contents(externalRead(mroot)) === Set(("o2", "2024-01-01", 20.0)))
  }

  test("refuses column mapping (parquet physical names would surface)") {
    val t = MergeTable(spark, tmpDir("slm5").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 10.0)))
    t.renameColumn("amount", "total")
    val e = intercept[IllegalArgumentException](t.generateSymlinkManifest())
    assert(e.getMessage.contains("column mapping"))
  }

  test("SQL surface: GENERATE symlink_format_manifest FOR TABLE t and " +
      "REORG t APPLY (PURGE) route to the API") {
    val t = MergeTable(spark, tmpDir("slm6").toString, Some("date"),
      Nil, deletionVectors = true)
    t.overwrite(orders(("o1", "2024-01-01", 10.0), ("o2", "2024-01-01", 20.0))
      .coalesce(1))
    GraftSql.register("slm6", t)
    t.delete(col("order_id") === "o1")
    intercept[Exception](
      spark.sql("GENERATE symlink_format_manifest FOR TABLE slm6").collect())
    spark.sql("REORG slm6 APPLY (PURGE)").collect()
    val v = spark.sql("GENERATE symlink_format_manifest FOR TABLE slm6")
      .as[Long].head()
    assert(v === t.latestVersion())
    val mroot = t.root.resolve("_symlink_format_manifest")
    assert(contents(externalRead(mroot)) === Set(("o2", "2024-01-01", 20.0)))
  }
}
