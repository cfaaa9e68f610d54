package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.lake.MergeTable
import graft.streaming.StreamIngest

/** Dev tool: per-phase cost breakdown of the q_stream_cdc shape —
  * wave writes, the single AvailableNow drain, final read — so the
  * fixed-cost diet (r13 verdict #5) is guided by measurement, not
  * guesses. Usage: runMain graft.tools.CdcProbe [sfDir] */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = j.stageInfos.map(_.name).distinct.mkString(" | ")
          starts.put(j.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = starts.remove(j.jobId)
          if (st != null) jobs.synchronized {
            jobs += ((j.jobId, System.nanoTime() - st._1, st._2))
          }
        }
      })
    (1 to 2).foreach { r =>
      jobs.synchronized(jobs.clear())
      run(spark, d, r)
      val snap = jobs.synchronized(jobs.toSeq)
      println(f"CDCPROBE round=$r jobs=${snap.size} " +
        f"jobtime=${snap.map(_._2).sum / 1e9}%.2f")
      snap.foreach { case (id, ns, desc) =>
        println(f"  JOB $id%4d ${ns / 1e9}%6.2f s  ${desc.take(150)}")
      }
    }
    spark.stop()
  }

  private def t0s = System.nanoTime()
  private def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

  private def run(s: SparkSession, d: String, rnd: Int): Unit = {
    val ct = MergeTable.ChangeType
    val schema = new StructType()
      .add("o_orderkey", LongType).add("o_custkey", LongType)
      .add("price", DoubleType).add(ct, StringType).add("seq", LongType)
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").as("price"))
    def scratch(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    val rawDir = scratch("cdcprobe_raw")
    val ckpt = scratch("cdcprobe_ckpt")
    val t = MergeTable(s, scratch("cdcprobe_tbl"), None,
      Seq("o_orderkey"), deletionVectors = false,
      bloomCols = Seq("o_orderkey"))

    val upd = base.filter(col("o_orderkey") % 4 === 0)
      .withColumn("price", col("price") + 10.0)
      .withColumn(ct, lit("update")).withColumn("seq", lit(3L))
    val del = base.filter(col("o_orderkey") % 9 === 0)
      .withColumn(ct, lit("delete")).withColumn("seq", lit(4L))
    val late = base.filter(col("o_orderkey") % 4 === 0)
      .withColumn("price", col("price") + 999.0)
      .withColumn(ct, lit("update")).withColumn("seq", lit(2L))
    val res = base.filter(col("o_orderkey") % 18 === 0)
      .withColumn("price",
        (col("o_orderkey") % 500).cast("double") + 0.25)
      .withColumn(ct, lit("insert")).withColumn("seq", lit(5L))

    var tw = t0s
    def wave(df: DataFrame, slot: Int): Unit = {
      df.coalesce(1).write.mode("append").option("header", "true")
        .csv(rawDir)
      val slot0 = 1_600_000_000_000L
      scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(rawDir))) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".csv"))
          .filter(p => java.nio.file.Files.getLastModifiedTime(p)
            .toMillis > slot0 + 600_000L)
          .foreach(p => java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(
              slot0 + slot * 60_000L)))
      }
    }
    wave(base.withColumn(ct, lit("insert")).withColumn("seq", lit(1L)), 1)
    wave(upd.unionByName(del), 2)
    wave(late.unionByName(res), 3)
    val waveS = sec(tw)

    tw = t0s
    if (sys.env.get("CDCPROBE_BATCH").isEmpty)
      StreamIngest.runCdcAvailableNow(s, rawDir, schema, t,
        "o_orderkey", "seq", ckpt, maxFilesPerTrigger = Some(1))
    else {
      // batch-mode replay of the drain's per-micro-batch pipeline —
      // same jobs, real callsites in stage names (the stream masks
      // them all as 'start at'). DELIBERATE copy of
      // StreamIngest.runCdcAvailableNow's guard pipeline: keep the two
      // in sync when the guard logic changes, or the breakdown stops
      // measuring production.
      val cap = StreamIngest.GuardProbeMaxKeys
      val pk = "o_orderkey"; val seqCol = "seq"
      val tomb = MergeTable(s, t.root.resolve("_tombstones").toString)
      val files = scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(rawDir))) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.filter(_.toString.endsWith(".csv")).toSeq
          .sortBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
      }
      files.foreach { f =>
        val events = s.read.schema(schema).option("header", "true")
          .csv(f.toString)
          .filter(col(ct) =!= "update_preimage").cache()
        val batchKeys = events.select(col(pk)).distinct()
          .limit(cap + 1).collect().map(_.get(0)).toSeq
        if (batchKeys.nonEmpty) {
          lazy val overWideHasNulls =
            !events.filter(col(pk).isNull).isEmpty
          def guardSide(tt: MergeTable) =
            if (batchKeys.size <= cap && !batchKeys.contains(null))
              tt.probeKeys(pk, batchKeys)
            else if (!overWideHasNulls)
              tt.probeKeys(pk, events.select(col(pk)))
            else tt.read()
          val guardRels =
            (if (tomb.latestVersion() == 0L) Nil
             else Seq(guardSide(tomb).select(col(pk), col(seqCol)))) ++
            (if (t.latestVersion() == 0L) Nil
             else Seq(guardSide(t).select(col(pk), col(seqCol))))
          val guarded = (
            if (guardRels.isEmpty) events
            else events.join(
              guardRels.reduce(_ unionByName _)
                .groupBy(col(pk).as("__gpk"))
                .agg(max(col(seqCol)).as("__gseq")),
              col(pk) <=> col("__gpk"), "left")
              .filter(col("__gseq").isNull || col(seqCol) > col("__gseq"))
              .drop("__gpk", "__gseq")).cache()
          val ctCounts = guarded.groupBy(col(ct)).count().collect()
            .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1))
            .toMap
          if (ctCounts.valuesIterator.sum > 0L) {
            t.mergeCdc(guarded, pk, sequenceBy = Some(seqCol),
              keepSequence = true)
            if (ctCounts.getOrElse("delete", 0L) > 0L)
              tomb.append(guarded.filter(col(ct) === "delete")
                .groupBy(col(pk)).agg(max(col(seqCol)).as(seqCol)))
          }
          guarded.unpersist()
        }
        events.unpersist()
      }
    }
    val drainS = sec(tw)

    tw = t0s
    t.read().select(col("o_orderkey"), col("o_custkey"),
      round(col("price"), 2).as("price"), col("seq"))
      .write.format("noop").mode("overwrite").save()
    val readS = sec(tw)
    println(f"CDCPROBE round=$rnd waves=$waveS%.2f drain=$drainS%.2f " +
      f"read=$readS%.2f")
  }
}
