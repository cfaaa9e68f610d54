package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PARQUET checkpoints (r14 verdict #1): past a live-entry threshold a
  * checkpoint's file entries are written as a typed parquet dir loaded
  * by a distributed scan, with the text checkpoint carrying metadata
  * actions plus a `Q` pointer. The format is protocol-gated
  * (`parquetCheckpoint` reader feature, stamped by the commit that
  * crosses the threshold), bijective with the text form (round-trip
  * law below), and retention/vacuum reap the parquet dirs together
  * with their text pointers. Old text checkpoints keep reading. */
class ParquetCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def logDirOf(t: MergeTable) =
    t.root.resolve("_graft_log")

  private def ckptTextOf(t: MergeTable, v: Long): String =
    Files.readString(logDirOf(t).resolve(f"$v%020d.ckpt"))

  /** A feature-dense table: partition, long + string stats, bloom,
    * deletion vectors, row tracking — every manifest token the parquet
    * row must round-trip. */
  private def denseTable(tag: String): MergeTable =
    MergeTable(spark, tmpDir(tag).toString + "/t", Some("p"),
      Seq("n", "k"), deletionVectors = true, bloomCols = Seq("n"))
      .withRowTracking
      .withParquetCheckpointThreshold(1)

  private def wave(t: MergeTable, i: Int): Unit =
    t.append(Seq((i.toLong, f"k$i%02d", i.toLong * 10, s"p${i % 2}"))
      .toDF("id", "k", "n", "p").coalesce(1))

  test("round-trip law: a parquet-anchored snapshot folds to the SAME " +
      "entries a fresh handle resolves — dv/bloom/ri/stats tokens " +
      "intact — and the checkpoint text carries Q but no A lines") {
    val t = denseTable("pqc")
    (1 to 8).foreach(wave(t, _))
    // a two-row file so the delete is PARTIAL — whole-file deletes
    // drop the entry instead of writing a deletion vector
    t.append(Seq((9L, "k09", 90L, "p1"), (909L, "k99", 990L, "p1"))
      .toDF("id", "k", "n", "p").coalesce(1))
    t.delete(col("id") === 909L) // a DV ref must ride the checkpoint
    val v = t.latestVersion()
    assert(v === 10L, "fixture drives exactly to the checkpoint boundary")
    val pre = t.liveEntries()
    assert(pre.exists(_.dv.isDefined), "fixture must carry a DV ref")
    assert(pre.forall(_.rowIds.isDefined), "fixture must carry row ids")
    assert(pre.exists(_.bloom.isDefined), "fixture must carry bloom refs")
    assert(pre.forall(_.stats.get("k").exists(_.strRange.isDefined)),
      "fixture must carry string stats")
    val text = ckptTextOf(t, 10L)
    assert(text.linesIterator.exists(_.startsWith("Q\t")),
      s"expected a Q pointer in:\n$text")
    assert(!text.linesIterator.exists(_.startsWith("A\t")),
      "entries must live in the parquet block, not the text")
    assert(Files.isDirectory(
      logDirOf(t).resolve(f"${10L}%020d.ckptpq")))
    // a FRESH handle anchors on the parquet checkpoint alone
    val fresh = MergeTable(spark, t.root.toString, Some("p"),
      Seq("n", "k"), deletionVectors = true, bloomCols = Seq("n"))
      .withRowTracking.withParquetCheckpointThreshold(1)
    assert(fresh.liveEntries() === pre,
      "parquet→entries must be byte-identical to the text fold")
    assert(fresh.read().count() === 9L) // 10 data rows - 1 DV-deleted
    // the snapshot CHECKSUM is computed over the same canonical lines,
    // so a verifying handle accepts the parquet-anchored fold
    val verifying = fresh.withChecksumVerification
    assert(verifying.read().count() === 9L)
  }

  test("the crossing commit stamps the parquetCheckpoint reader " +
      "feature; below-threshold tables keep text checkpoints") {
    val t = denseTable("pqproto")
    wave(t, 1)
    assert(t.protocol._1.contains("parquetCheckpoint"),
      s"threshold-1 table must stamp immediately, got ${t.protocol}")
    // a high-threshold handle never stamps and keeps A-line text
    val u = MergeTable(spark, tmpDir("pqtext").toString + "/t",
      None, Seq("n"))
    (1 to 10).foreach(i =>
      u.append(Seq((i.toLong, i.toLong)).toDF("id", "n")))
    assert(!u.protocol._1.contains("parquetCheckpoint"))
    val utext = ckptTextOf(u, 10L)
    assert(utext.linesIterator.exists(_.startsWith("A\t")))
    assert(!utext.linesIterator.exists(_.startsWith("Q\t")))
  }

  test("mixed history: pre-threshold TEXT checkpoints stay readable " +
      "after parquet checkpoints begin (every version reconstructs)") {
    val root = tmpDir("pqmix").toString + "/t"
    val textT = MergeTable(spark, root, None, Seq("n"))
    (1 to 12).foreach(i =>
      textT.append(Seq((i.toLong, i.toLong)).toDF("id", "n")))
    assert(ckptTextOf(textT, 10L).linesIterator
      .exists(_.startsWith("A\t")))
    // re-open with a tiny threshold: the next commits stamp + publish
    // parquet checkpoints while the old text one remains below
    val pqT = MergeTable(spark, root, None, Seq("n"))
      .withParquetCheckpointThreshold(1)
    (13 to 20).foreach(i =>
      pqT.append(Seq((i.toLong, i.toLong)).toDF("id", "n")))
    assert(ckptTextOf(pqT, 20L).linesIterator
      .exists(_.startsWith("Q\t")))
    // every version still reconstructs — the fold picks whichever
    // checkpoint form anchors it
    (1L to 20L).foreach { v =>
      assert(pqT.readVersion(v).count() === v,
        s"version $v must reconstruct across the format boundary")
    }
  }

  test("checkpoint retention prunes superseded parquet dirs with " +
      "their text pointers; vacuum reaps pre-anchor parquet blocks") {
    val t = MergeTable(spark, tmpDir("pqret").toString + "/t",
      None, Seq("n"))
      .withParquetCheckpointThreshold(1)
      .withCheckpointRetention(keep = 1, retainMs = 0L)
    (1 to 30).foreach(i =>
      t.append(Seq((i.toLong, i.toLong)).toDF("id", "n")))
    val dirs = scala.util.Using.resource(
      Files.list(logDirOf(t)))(s => {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toList
      })
    val pqDirs = dirs.filter(_.endsWith(".ckptpq"))
    val ckpts = dirs.filter(_.endsWith(".ckpt"))
    assert(ckpts === List(f"${30L}%020d.ckpt"),
      s"keep=1/retain=0 leaves exactly the newest, got $ckpts")
    assert(pqDirs === List(f"${30L}%020d.ckptpq"),
      s"parquet dirs must be pruned with their pointers, got $pqDirs")
    // vacuum folds history onto the newest checkpoint and reaps the
    // rest of the log — the parquet anchor must survive and serve
    t.vacuum(0L)
    assert(t.read().count() === 30L)
    val fresh = MergeTable(spark, t.root.toString, None, Seq("n"))
    assert(fresh.read().count() === 30L,
      "post-vacuum cold open resolves from the parquet anchor alone")
  }
}
