package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec
import graft.lake.MergeTable
import graft.sql.GraftSql

/** The `graft` streaming SINK (X168): a MergeTable as the write end of
  * a streaming pipeline, exactly-once through the transaction
  * watermark ([[MergeTable.appendWithTxn]]). Cases pin the contract:
  * appends match the source across drains and a restart, an idle drain
  * commits nothing, a REPLAYED batch is a no-op, and the watermark
  * survives checkpoint folding. */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def writeWave(dir: String, name: String,
      rows: Seq[(Long, Long)]): Unit =
    rows.toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$name")

  private def drain(srcDir: String, ckpt: String): Unit = {
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir + "/*")
      .writeStream.format("graft")
      .option("table", "sink_t")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def contents(t: MergeTable): Set[(Long, Long)] =
    t.read().select("k", "v").as[(Long, Long)].collect().toSet

  test("writeStream.format(graft): appends match the source across " +
      "drains and a restart; an idle drain commits nothing") {
    val srcDir = tmpDir("gsink_src").toString
    val ckpt = tmpDir("gsink_ck").toString
    val t = MergeTable(spark, tmpDir("gsink_t").toString, None)
    GraftSql.register("sink_t", t)

    writeWave(srcDir, "w1", Seq((1L, 10L), (2L, 20L)))
    drain(srcDir, ckpt)
    assert(contents(t) === Set((1L, 10L), (2L, 20L)))

    // restart with two more files: maxFilesPerTrigger=1 forces TWO
    // batches — two txn-gated commits — and nothing is re-appended
    writeWave(srcDir, "w2", Seq((3L, 30L)))
    writeWave(srcDir, "w3", Seq((4L, 40L)))
    // distinct mtimes pin the capped-drain file order
    Files.setLastModifiedTime(Paths.get(srcDir, "w2"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 2000))
    drain(srcDir, ckpt)
    assert(contents(t) === Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))

    val vAfter = t.latestVersion()
    drain(srcDir, ckpt) // nothing new
    assert(t.latestVersion() === vAfter)
  }

  test("a replayed batch is a no-op (txn watermark), higher batch " +
      "versions apply, and the watermark survives a checkpoint fold") {
    val t = MergeTable(spark, tmpDir("gsink_tx").toString, None)
    t.appendWithTxn(Seq((1L, 10L)).toDF("k", "v"), "appA", 0L)
    val v1 = t.latestVersion()
    assert(t.txnVersion("appA") === Some(0L))

    // exact replay and a LOWER version: both absorbed, no commit
    assert(t.appendWithTxn(Seq((1L, 10L)).toDF("k", "v"), "appA", 0L) === v1)
    assert(t.appendWithTxn(Seq((9L, 99L)).toDF("k", "v"), "appA", -1L) === v1)
    assert(t.latestVersion() === v1)
    assert(t.read().count() === 1L)

    // a different app's version 0 is independent
    t.appendWithTxn(Seq((2L, 20L)).toDF("k", "v"), "appB", 0L)
    assert(t.read().count() === 2L)

    // advance appA, then force a checkpoint via vacuum: the ledger
    // must survive the fold (and the replay gate with it)
    t.appendWithTxn(Seq((3L, 30L)).toDF("k", "v"), "appA", 1L)
    t.vacuum(0L)
    assert(t.txnVersion("appA") === Some(1L))
    assert(t.txnVersion("appB") === Some(0L))
    val vEnd = t.latestVersion()
    assert(t.appendWithTxn(Seq((8L, 88L)).toDF("k", "v"), "appA", 1L) === vEnd)
    assert(t.read().count() === 3L)
  }

  test("lake-to-lake: ONE streaming query runs the graft-cdf source " +
      "INTO the graft sink (medallion bronze->silver), exactly-once " +
      "across a restarted drain") {
    val bronze = MergeTable(spark, tmpDir("med_bronze").toString, None)
    val silver = MergeTable(spark, tmpDir("med_silver").toString, None)
    GraftSql.register("med_bronze", bronze)
    GraftSql.register("med_silver", silver)
    val ckpt = tmpDir("med_ck").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("table", "med_bronze").option("pk", "k")
        .option("maxVersionsPerTrigger", 1).load()
        // bronze is append-only here, so the feed is inserts; the
        // transform drops the feed tag and keeps high-value rows
        .filter(col("_change_type") === "insert")
        .filter(col("v") >= 100L)
        .drop("_change_type")
        .writeStream.format("graft")
        .option("table", "med_silver")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    bronze.append(Seq((1L, 50L), (2L, 200L)).toDF("k", "v"))
    drain()
    assert(silver.read().select("k", "v").as[(Long, Long)].collect().toSet
      === Set((2L, 200L)))
    // two more bronze commits; the RESTARTED drain runs one batch per
    // version, each landing as its own txn-gated silver append
    bronze.append(Seq((3L, 300L)).toDF("k", "v"))
    bronze.append(Seq((4L, 40L), (5L, 500L)).toDF("k", "v"))
    drain()
    assert(silver.read().select("k", "v").as[(Long, Long)].collect().toSet
      === Set((2L, 200L), (3L, 300L), (5L, 500L)))
    // idle drain: no batch, no silver commit
    val v = silver.latestVersion()
    drain()
    assert(silver.latestVersion() === v)
  }

  test("sink option validation fails fast") {
    val t = MergeTable(spark, tmpDir("gsink_val").toString, None)
    GraftSql.register("sink_val", t)
    val src = spark.readStream.schema(schema)
      .parquet(tmpDir("gsink_vsrc").toString + "/*")
    // unregistered table
    intercept[Exception] {
      src.writeStream.format("graft").option("table", "sink_nope")
        .option("checkpointLocation", tmpDir("ck1").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    // missing table option
    intercept[Exception] {
      src.writeStream.format("graft")
        .option("checkpointLocation", tmpDir("ck2").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    // partitionBy is the handle's job
    intercept[Exception] {
      src.writeStream.format("graft").option("table", "sink_val")
        .partitionBy("k")
        .option("checkpointLocation", tmpDir("ck3").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
  }
}
