// in the lake package tree so the bench can isolate the snapshot fold
// via the package-private liveEntries() (no public API exists that
// folds without also building a scan plan — by design)
package graft.lake.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.lake.MergeTable

import org.apache.spark.sql.SparkSession

/** Dev tool: TEXT vs PARQUET checkpoints at large live-file counts —
  * the r15 evidence behind X-series parquet checkpoints. Builds a
  * table of N real one-row parquet files (fast path: one seed file
  * copied N times, adopted in ONE [[MergeTable.convertInPlace]]
  * commit, then driven past a checkpoint boundary), once with the
  * text-checkpoint path pinned and once with parquet checkpoints
  * forced, and at each N times on FRESH handles:
  *
  *   - fold_cold: `liveEntries()` — snapshot resolution only (the
  *     checkpoint anchor load + delta folds; no scan, no data);
  *   - open_cold: `read()` — fold + scan-PLAN construction (file
  *     index, partition attach) on a second fresh handle;
  *   - count: `read().count()` — the first real job on the plan.
  *
  * The text/parquet delta isolates the checkpoint-format effect; the
  * fold-vs-open split shows how much of cold open is the log fold at
  * all (r13's X190 finding says scan construction dominates — this
  * tool keeps that honest at 10^5 files).
  *
  * Usage: runMain graft.lake.tools.CkptScaleBench [nFiles] [nFiles2 ...]
  */
object CkptScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.isEmpty) Seq(20000, 100000) else args.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = Files.createTempDirectory("graft_ckptscale")
    val seedDir = work.resolve("seed")
    Seq((1L, 1L)).toDF("id", "n").coalesce(1)
      .write.parquet(seedDir.toString)
    val seed = scala.util.Using.resource(Files.list(seedDir)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
    }

    def timeS(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    sizes.foreach { n =>
      Seq(("text", Long.MaxValue), ("pq", 1L)).foreach {
        case (label, thr) =>
          val root = work.resolve(s"t_${label}_$n")
          Files.createDirectories(root)
          (0 until n).foreach { i =>
            Files.copy(seed, root.resolve(f"f$i%07d.parquet"),
              StandardCopyOption.COPY_ATTRIBUTES)
          }
          def handle() = MergeTable(spark, root.toString, None, Seq("n"))
            .withParquetCheckpointThreshold(thr)
          val t = handle()
          t.convertInPlace()
          // drive to the checkpoint boundary (interval = 10)
          (2 to 10).foreach(_ =>
            t.append(Seq((0L, 0L)).toDF("id", "n").coalesce(1)))
          val ckpts = scala.util.Using.resource(
            Files.list(root.resolve("_graft_log"))) { s =>
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.map(_.getFileName.toString)
              .filter(f => f.endsWith(".ckpt") || f.endsWith(".ckptpq"))
              .toList.sorted
          }
          val fold = timeS(handle().liveEntries())
          val open = timeS(handle().read())
          val h3 = handle()
          val cnt = timeS(h3.read().count())
          println(f"CKPT $label%-4s n=$n%7d fold_cold=$fold%.3f s " +
            f"open_cold=$open%.3f s count=$cnt%.3f s " +
            s"ckpts=${ckpts.mkString(",")}")
      }
    }
    spark.stop()
  }
}
