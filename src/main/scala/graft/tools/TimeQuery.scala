package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: time single queries in isolation at a chosen SF.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query...>  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args.tail) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      // second run, warm
      spark.catalog.clearCache()
      val t2 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"TIMING $q cold=${(t1 - t0) / 1e9}%.2f warm=${(t3 - t2) / 1e9}%.2f")
    }
    spark.stop()
  }
}
