package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query Spark-job census — job count, summed jobtime,
  * wall, and the driver-gap remainder (wall − jobtime is scheduling /
  * planning / log-I-O the executors never see). The r15 optimization
  * round's first question for every fixed-cost-bound query (q_join_mv
  * sits at ~12.5 s ±0.1 on a box whose CPU-bound queries swing 2×:
  * that stability IS the fingerprint of driver/fixed-cost domination).
  * Usage: runMain graft.tools.JobProfile <sfDir> <query...>
  * Env: JOBPROFILE_DETAIL=1 prints every job of the warm run. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
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
    for (q <- args.tail) {
      (1 to 2).foreach { pass =>
        spark.catalog.clearCache()
        try org.apache.spark.sql.graftshim.GraftStreamShim
          .unloadStateStores()
        catch { case scala.util.control.NonFatal(_) => () }
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val snap = jobs.synchronized(jobs.toSeq)
        val jt = snap.map(_._2).sum / 1e9
        println(f"JOBPROFILE $q pass=$pass wall=$wall%.2f " +
          f"jobs=${snap.size} jobtime=$jt%.2f gap=${wall - jt}%.2f")
        if (pass == 2 && sys.env.contains("JOBPROFILE_DETAIL")) {
          snap.sortBy(_._1).foreach { case (id, ns, desc) =>
            println(f"  JOB $id%5d ${ns / 1e9}%6.2f s  ${desc.take(140)}")
          }
          // top repeated callsites — where the job count comes from
          snap.groupBy(_._3).toSeq
            .map { case (d, js) => (js.size, js.map(_._2).sum / 1e9, d) }
            .sortBy(-_._1).take(12)
            .foreach { case (n, t, d) =>
              println(f"  SITE n=$n%3d t=$t%6.2f s  ${d.take(120)}")
            }
        }
      }
    }
    spark.stop()
  }
}
