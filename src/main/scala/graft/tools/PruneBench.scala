package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measures what the [[graft.lake.GraftScanPruning]] rule
  * buys on a many-file table — the same point lookup through
  * `read().filter` with the table unregistered (full scan; the rule's
  * manifest pattern needs the registry) vs registered (stats+bloom
  * file pruning). Prints warm medians and the planned file counts.
  * Usage: runMain graft.tools.PruneBench [nFiles] [rowsPerFile]
  */
object PruneBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(256)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("prunebench").toString
    val t = graft.lake.MergeTable(spark, dir, None, Seq("id"),
      deletionVectors = false, bloomCols = Seq("id"))
    // nFiles files of DISJOINT id ranges (range-partitioned by the sort,
    // so stats prune hard), one commit
    val n = nFiles.toLong * rowsPer
    t.overwrite(spark.range(n).select(col("id"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .repartitionByRange(nFiles, col("id")))
    println(s"files=${t.read().inputFiles.length} rows=$n")

    val probe = n / 2 + 7
    def timeWarm(label: String): Double = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val c = t.read().filter(col("id") === probe).count()
        require(c == 1L, s"probe lost: $c")
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = runs(runs.size / 2)
      println(f"$label median=${med}%.3f s (runs ${runs.map(r => f"$r%.3f").mkString(", ")})")
      med
    }
    // warmup + unregistered baseline
    timeWarm("warmup      ")
    val full = timeWarm("unregistered")
    graft.sql.GraftSql.register("pb", t)
    val pruned = timeWarm("registered  ")
    val planned = t.read().filter(col("id") === probe)
      .queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.size
            case _ => -1
          }
      }.sum
    println(f"planned files with rule: $planned of $nFiles; speedup ${full / pruned}%.1fx")
    spark.stop()
  }
}
