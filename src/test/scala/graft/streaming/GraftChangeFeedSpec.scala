package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.lake.{IncrementalAgg, MergeTable}
import graft.sql.GraftSql

/** The `graft-cdf` streaming source (X153): a MergeTable as a
  * `readStream` subscription — version = offset, batches are
  * `changes(vPrev, vNow, updateImages = true)`, offsets checkpointed by
  * the engine. The cases pin the full contract: initial snapshot as
  * inserts, exact per-restart batch content (a restart resumes from the
  * committed version and re-emits NOTHING), a feed-folded view equal to
  * recompute across drains, and `startingVersion`. */
class GraftChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(t: (Long, Long, Long)*): DataFrame =
    t.toDF("k", "g", "v")

  /** Drain the subscription AvailableNow into `outDir` (append). */
  private def drainFeed(name: String, ckpt: String, outDir: String,
      startingVersion: Option[Long] = None): Unit = {
    var r = spark.readStream.format("graft-cdf")
      .option("table", name).option("pk", "k")
    startingVersion.foreach(v => r = r.option("startingVersion", v))
    val q = r.load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(outDir)
        ()
      }
      .start()
    q.awaitTermination()
  }

  private def feed(outDir: String): Set[(Long, Long, Long, String)] =
    spark.read.parquet(outDir)
      .select("k", "g", "v", "_change_type")
      .as[(Long, Long, Long, String)].collect().toSet

  test("initial snapshot as inserts; a restarted drain emits EXACTLY the " +
      "new versions' changes (offset = committed version)") {
    val t = MergeTable(spark, tmpDir("cdf1").toString, None)
    GraftSql.register("cdf_sub1", t)
    t.overwrite(rows((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L)))
    t.merge(rows((3L, 20L, 333L), (4L, 20L, 400L)), "k") // v2
    val ckpt = tmpDir("cdf1_ck").toString
    val out = tmpDir("cdf1_out").toString + "/feed"

    // drain 1: changes(0, v2) — the net state as inserts (3's value is
    // the POST-merge one; no intermediate 300 row surfaces)
    drainFeed("cdf_sub1", ckpt, out)
    assert(feed(out) === Set(
      (1L, 10L, 100L, "insert"), (2L, 10L, 200L, "insert"),
      (3L, 20L, 333L, "insert"), (4L, 20L, 400L, "insert")))

    // two more commits AFTER the drain
    t.delete(col("k") === 2L)                 // v3
    t.merge(rows((4L, 20L, 444L)), "k")       // v4

    // drain 2, SAME checkpoint, NEW stream instance: resumes from the
    // committed offset — only (v2, v4]'s net changes, nothing re-emitted
    drainFeed("cdf_sub1", ckpt, out)
    assert(feed(out) === Set(
      (1L, 10L, 100L, "insert"), (2L, 10L, 200L, "insert"),
      (3L, 20L, 333L, "insert"), (4L, 20L, 400L, "insert"),
      (2L, 10L, 200L, "delete"),
      (4L, 20L, 400L, "update_preimage"),
      (4L, 20L, 444L, "update_postimage")))

    // drain 3 with nothing new: no batch, no rows, no error
    drainFeed("cdf_sub1", ckpt, out)
    assert(feed(out).size === 7)
  }

  test("a feed-folded MV equals recompute across drains and a restart") {
    val t = MergeTable(spark, tmpDir("cdf2").toString, None)
    GraftSql.register("cdf_sub2", t)
    val ckpt = tmpDir("cdf2_ck").toString
    var mv: DataFrame = Seq.empty[(Long, Double, Long)]
      .toDF("g", "total_sum", "n_rows")
    def refresh(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("table", "cdf_sub2").option("pk", "k").load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          mv = IncrementalAgg.applyDelta(mv,
            IncrementalAgg.sumCountDelta(b, "g", "v"), "g")
            .localCheckpoint()
          ()
        }
        .start()
      q.awaitTermination()
    }
    def recompute(): Set[(Long, Long, Long)] =
      IncrementalAgg.fullAggregate(t.read(), "g", "v")
        .select(col("g"), col("total_sum").cast("long"), col("n_rows"))
        .as[(Long, Long, Long)].collect().toSet
    def view(): Set[(Long, Long, Long)] =
      mv.select(col("g"), col("total_sum").cast("long"), col("n_rows"))
        .as[(Long, Long, Long)].collect().toSet

    t.overwrite(rows((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L)))
    refresh()
    assert(view() === recompute())
    // updates + an insert + a group-emptying delete, then a fresh drain
    t.merge(rows((1L, 10L, 150L), (5L, 30L, 500L)), "k")
    t.delete(col("g") === 20L)
    refresh()
    assert(view() === recompute())
    assert(view() === Set((10L, 350L, 2L), (30L, 500L, 1L)))
  }

  test("startingVersion skips the initial snapshot") {
    val t = MergeTable(spark, tmpDir("cdf3").toString, None)
    GraftSql.register("cdf_sub3", t)
    t.overwrite(rows((1L, 10L, 100L)))
    val v1 = t.latestVersion()
    t.merge(rows((2L, 20L, 200L)), "k")
    val out = tmpDir("cdf3_out").toString + "/feed"
    drainFeed("cdf_sub3", tmpDir("cdf3_ck").toString, out, Some(v1))
    assert(feed(out) === Set((2L, 20L, 200L, "insert")))
  }

  test("maxVersionsPerTrigger: one AvailableNow drain runs ONE BATCH PER " +
      "VERSION to the head pinned at query start (no single-batch fallback)") {
    val t = MergeTable(spark, tmpDir("cdf5").toString, None)
    GraftSql.register("cdf_sub5", t)
    t.overwrite(rows((1L, 10L, 100L), (2L, 10L, 200L)))
    val v1 = t.latestVersion()
    t.merge(rows((2L, 10L, 222L)), "k")
    t.delete(col("k") === 1L)
    assert(t.latestVersion() === v1 + 2)

    val batches = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, Long, String)]]
    val q = spark.readStream.format("graft-cdf")
      .option("table", "cdf_sub5").option("pk", "k")
      .option("maxVersionsPerTrigger", 1L).load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("cdf5_ck").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches += b.select("k", "g", "v", "_change_type")
          .as[(Long, Long, Long, String)].collect().toSet
        ()
      }
      .start()
    q.awaitTermination()

    // one batch per version window — INTERMEDIATE images surface (the
    // capped windows are NOT net-collapsed across each other), and the
    // drain stops exactly at the pinned head
    assert(batches.toSeq === Seq(
      Set((1L, 10L, 100L, "insert"), (2L, 10L, 200L, "insert")),
      Set((2L, 10L, 200L, "update_preimage"), (2L, 10L, 222L, "update_postimage")),
      Set((1L, 10L, 100L, "delete"))))
  }

  test("startingTimestamp resolves the starting version from the commit " +
      "clock; mutually exclusive with startingVersion") {
    val t = MergeTable(spark, tmpDir("cdf6").toString, None)
    GraftSql.register("cdf_sub6", t)
    t.overwrite(rows((1L, 10L, 100L)))
    Thread.sleep(1100) // the as-of clock is mtime-second resolution
    val mark = java.time.Instant.now()
    t.merge(rows((2L, 20L, 200L)), "k")
    val out = tmpDir("cdf6_out").toString + "/feed"
    val q = spark.readStream.format("graft-cdf")
      .option("table", "cdf_sub6").option("pk", "k")
      .option("startingTimestamp", mark.toString).load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("cdf6_ck").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(out)
        ()
      }
      .start()
    q.awaitTermination()
    // only the post-mark merge surfaces — the snapshot a reader AT
    // `mark` already had is not replayed
    assert(feed(out) === Set((2L, 20L, 200L, "insert")))
    intercept[Exception] {
      spark.readStream.format("graft-cdf")
        .option("table", "cdf_sub6").option("pk", "k")
        .option("startingVersion", 1L)
        .option("startingTimestamp", mark.toString).load()
    }
  }

  test("unregistered table and missing options fail fast at stream start") {
    intercept[Exception] {
      spark.readStream.format("graft-cdf")
        .option("table", "cdf_nope").option("pk", "k").load()
    }
    val t = MergeTable(spark, tmpDir("cdf4").toString, None)
    t.overwrite(rows((1L, 10L, 100L)))
    GraftSql.register("cdf_sub4", t)
    intercept[Exception] {
      spark.readStream.format("graft-cdf").option("table", "cdf_sub4").load()
    }
    intercept[Exception] {
      spark.readStream.format("graft-cdf")
        .option("table", "cdf_sub4").option("pk", "nope").load()
    }
  }
}
