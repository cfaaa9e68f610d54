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
    val jobs =
      new scala.collection.mutable.ArrayBuffer[(Int, Long, String, String)]
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // Prefer the graft phase label (setJobDescription — broadcast
          // futures inherit it via withThreadLocalCaptured) over raw
          // stage callsites: the label answers "which ACTION/phase",
          // which is the fixed-cost question.
          val label = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .filter(_.startsWith("graft:"))
          val desc = label.getOrElse(
            j.stageInfos.map(_.name).distinct.mkString(" | "))
          val execId = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .getOrElse("-")
          starts.put(j.jobId, (System.nanoTime(), desc, execId))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = starts.remove(j.jobId)
          if (st != null) jobs.synchronized {
            jobs += ((j.jobId, System.nanoTime() - st._1, st._2, st._3))
          }
        }
      })
    // execution id → action name + root plan node, from the SQL side:
    // lets the job census attribute broadcast-future jobs (whose stage
    // callsites are all "withThreadLocalCaptured") to the ACTION that
    // spawned them.
    val execs = new java.util.concurrent.ConcurrentHashMap[String, String]
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          execs.put(qe.id.toString,
            s"$funcName ${qe.executedPlan.nodeName}")
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    // Poor-man's driver sampler: while a query runs, sample the MAIN
    // thread's stack every 5 ms and bucket by the deepest "interesting"
    // frame — shows where the driver GAP (wall − jobtime) goes
    // (analysis? commit fsync? footer reads? log fold?).
    val sampleOn = sys.env.contains("JOBPROFILE_SAMPLE")
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    @volatile var sampling = false
    val mainThread = Thread.currentThread()
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          if (st.nonEmpty) {
            val key = st.take(40).map(_.toString)
              .find(f => f.startsWith("org.apache.spark") ||
                f.startsWith("graft") || f.startsWith("java.io") ||
                f.startsWith("sun.nio"))
              .getOrElse(st.head.toString)
            samples.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    if (sampleOn) sampler.start()
    for (q <- args.tail) {
      (1 to 2).foreach { pass =>
        spark.catalog.clearCache()
        try org.apache.spark.sql.graftshim.GraftStreamShim
          .unloadStateStores()
        catch { case scala.util.control.NonFatal(_) => () }
        jobs.synchronized(jobs.clear())
        samples.clear()
        val t0 = System.nanoTime()
        sampling = pass == 2 && sampleOn
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        sampling = false
        val wall = (System.nanoTime() - t0) / 1e9
        val snap = jobs.synchronized(jobs.toSeq)
        val jt = snap.map(_._2).sum / 1e9
        println(f"JOBPROFILE $q pass=$pass wall=$wall%.2f " +
          f"jobs=${snap.size} jobtime=$jt%.2f gap=${wall - jt}%.2f")
        if (pass == 2 && sys.env.contains("JOBPROFILE_DETAIL")) {
          snap.sortBy(_._1).foreach { case (id, ns, desc, _) =>
            println(f"  JOB $id%5d ${ns / 1e9}%6.2f s  ${desc.take(140)}")
          }
          // top repeated callsites — where the job count comes from
          snap.groupBy(_._3).toSeq
            .map { case (d, js) => (js.size, js.map(_._2).sum / 1e9, d) }
            .sortBy(-_._1).take(12)
            .foreach { case (n, t, d) =>
              println(f"  SITE n=$n%3d t=$t%6.2f s  ${d.take(120)}")
            }
          // per-ACTION census: jobs grouped by SQL execution id, with
          // broadcast-future jobs (stage callsite withThreadLocalCaptured)
          // counted separately — the r15 fixed-cost question is "which
          // ACTION spawns the broadcast jobs", not "which stage runs them"
          if (sampleOn) {
            import scala.jdk.CollectionConverters._
            samples.asScala.toSeq.sortBy(-_._2).take(25)
              .foreach { case (f, n) =>
                println(f"  SAMP ${n * 5}%6d ms  ${f.take(150)}")
              }
          }
          snap.groupBy(_._4).toSeq
            .map { case (eid, js) =>
              val bc = js.filter(_._3.contains("withThreadLocalCaptured"))
              (js.size, bc.size, js.map(_._2).sum / 1e9,
                js.map(_._1).min, eid)
            }
            .sortBy(_._4)
            .foreach { case (n, nbc, t, first, eid) =>
              val what = execs.getOrDefault(eid, "?")
              println(f"  EXEC $eid%4s first=$first%4d n=$n%3d " +
                f"bcast=$nbc%3d t=$t%6.2f s  ${what.take(110)}")
            }
        }
      }
    }
    spark.stop()
  }
}
