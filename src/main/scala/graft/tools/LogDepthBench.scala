package graft.tools

import graft.lake.MergeTable

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Dev tool: COLD snapshot load vs log depth — the evidence behind the
  * claim that a long streaming-ingest history degrades file COUNT but
  * never read-path complexity (MergeTable scaladoc). Drives N real
  * 1-row append commits (the worst-case streaming shape: every commit
  * adds a file, nothing compacts) and at depth marks times:
  *
  *   - cold_open: a FRESH handle's `read()` — dir listing O(V),
  *     newest checkpoint parse O(live files), ≤ CheckpointInterval
  *     delta folds, memo caches empty;
  *   - warm_open: the same handle's second `read()` (memoized metadata
  *     — what every query after the first pays);
  *   - append_ms: mean per-commit ingest cost over the preceding
  *     segment (each append folds the snapshot for its schema check,
  *     so this exposes any super-linear ingest debt too).
  *
  * Usage: runMain graft.tools.LogDepthBench [maxCommits] */
object LogDepthBench {
  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toInt).getOrElse(10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = Files.createTempDirectory("graft_logdepth").toString
    val t = MergeTable(spark, root, Some("p"), Some("k"))
    val row = Seq((1L, "p0", 1L)).toDF("id", "p", "k")
    val marks = Seq(100, 500, 1000, 2000, 5000, 10000).filter(_ <= maxN)
    var n = 0
    var segStart = System.nanoTime()
    var segCommits = 0
    while (n < maxN) {
      t.append(row)
      n += 1; segCommits += 1
      if (marks.contains(n)) {
        val appendMs = (System.nanoTime() - segStart) / 1e6 / segCommits
        def timeOpen(h: MergeTable): Double = {
          val c0 = System.nanoTime()
          h.read()
          (System.nanoTime() - c0) / 1e9
        }
        val fresh = MergeTable(spark, root, Some("p"), Some("k"))
        val cold = timeOpen(fresh)
        val warm = timeOpen(fresh)
        val files = fresh.read().inputFiles.length
        println(f"DEPTH $n%6d commits: cold_open=$cold%.3f s " +
          f"warm_open=$warm%.3f s append_ms=$appendMs%.1f " +
          f"live_files=$files")
        segStart = System.nanoTime(); segCommits = 0
      }
    }
    spark.stop()
  }
}
