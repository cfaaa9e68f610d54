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
  *     so this exposes any super-linear ingest debt too);
  *   - log_kb / ckpts: TOTAL `_graft_log` bytes and surviving
  *     checkpoint count — the r14 retention evidence. Superseded
  *     checkpoints are O(live files) lines each, one per 10 commits:
  *     unpruned that is ~O(N²) text over N commits (~700 MB at 10k,
  *     measured r13); with checkpoint retention the log stays deltas
  *     (linear, ~2 lines each) + `keep` checkpoints.
  *
  * Usage: runMain graft.tools.LogDepthBench [maxCommits] [ckptRetainMs]
  * [rowTracking(0|1)] — the third arg enables withRowTracking so the
  * per-commit allotment cost (one footer read per fresh file + the W
  * action) shows up in the same append_ms column.
  * (retainMs default 0 — prune superseded immediately past the keep
  * set, the deterministic bench shape; production default is 10 min) */
object LogDepthBench {
  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toInt).getOrElse(10000)
    val retainMs = args.drop(1).headOption.map(_.toLong).getOrElse(0L)
    val rowTrack = args.drop(2).headOption.exists(_ == "1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = Files.createTempDirectory("graft_logdepth").toString
    val t0 = MergeTable(spark, root, Some("p"), Some("k"))
      .withCheckpointRetention(retainMs = retainMs)
    val t = if (rowTrack) t0.withRowTracking else t0
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
        val logDir = java.nio.file.Paths.get(root, "_graft_log")
        var logBytes = 0L
        var ckpts = 0
        scala.util.Using.resource(Files.list(logDir)) { s =>
          s.iterator().forEachRemaining { p =>
            logBytes += Files.size(p)
            if (p.getFileName.toString.endsWith(".ckpt")) ckpts += 1
          }
        }
        println(f"DEPTH $n%6d commits: cold_open=$cold%.3f s " +
          f"warm_open=$warm%.3f s append_ms=$appendMs%.1f " +
          f"live_files=$files log_kb=${logBytes / 1024}%d ckpts=$ckpts%d")
        segStart = System.nanoTime(); segCommits = 0
      }
    }
    spark.stop()
  }
}
