package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the events read path, to localize
  * the events-family bench shift (round-5 verdict, "What's wrong" #1).
  * Usage: runMain graft.tools.EventsProbe <sfDir>  */
object EventsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARFIRST", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"PROBE $label run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("raw_scan_count") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet").count()
    }
    time("raw_scan_noop") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      noop(spark.read.parquet(s"$sfDir/events.parquet"))
    }
    time("tables_events_noop") { noop(graft.Tables.events(spark, sfDir)) }
    time("tumbling_agg") {
      noop(graft.Tables.events(spark, sfDir)
        .groupBy(
          unix_timestamp(window(col("ts"), "1 hour").getField("start"))
            .as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")))
    }
    time("tumbling_full_query") {
      noop(graft.SparkEntry.queries("q_events_tumbling")(spark, sfDir))
    }
    time("groupby_no_window") {
      noop(graft.Tables.events(spark, sfDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")))
    }
    spark.stop()
  }
}
