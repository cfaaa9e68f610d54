package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.VectorIndex
import graft.lake.MergeTable

/** Dev tool: per-stage cost breakdown of the q_embed_ivf_refresh
  * lifecycle (source table → index build → change wave → CDF refresh →
  * search) so any diet works from measurement, not guesses. Each stage
  * prints its wall seconds; run twice in-process for a warm pass.
  * Usage: runMain graft.tools.IvfProbe [sfDir] */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scratch(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val emb = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
      val src = MergeTable(spark, scratch("ivfprobe_src"))
      val v1 = timed("src.overwrite")(src.overwrite(emb))
      val idx = timed("index.build")(
        VectorIndex.build(spark, src.read(), scratch("ivfprobe_idx")))
      val upd = emb.filter(col("vec_id") % 7 === 0)
        .withColumn("embedding", expr(
          "concat(slice(embedding, 2, size(embedding) - 1), " +
            "slice(embedding, 1, 1))"))
      val ins = emb.filter(col("vec_id") % 6 === 1)
        .withColumn("vec_id", col("vec_id") + 10000000L)
        .withColumn("embedding", expr("reverse(embedding)"))
      timed("src.merge")(src.merge(upd.unionByName(ins), "vec_id"))
      val v3 = timed("src.delete")(src.delete(col("vec_id") % 10 === 3))
      val feed = timed("changes.materialize") {
        val f = src.changes(v1, v3, "vec_id"); f.count(); f
      }
      timed("index.refresh")(idx.refresh(feed))
      timed("search+collect") {
        val q = emb.filter(col("vec_id") >= 8 && col("vec_id") < 28)
          .select(col("vec_id").as("query_id"), col("embedding"))
        idx.searchIvf(q, 3).collect().length
      }
    }
    spark.stop()
  }
}
