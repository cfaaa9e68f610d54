package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: recall@3 and candidate volume of the hyperplane-LSH ANN
  * tiers against brute-force ground truth, by plane count and probe
  * mode — the measured evidence behind the 8-plane / Hamming-1-probe
  * defaults of `q_embed_lsh` / `q_embed_mplsh` (SURVEY §6.2a), the LSH
  * mirror of [[IvfRecall]].
  * Usage: runMain graft.tools.LshRecall [sfDir] [planes...] */
object LshRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planeCounts =
      if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(6, 8, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // same 500-query window as IvfRecall: the oracle queries' 10 ids
    // are far too few for a stable recall estimate
    val (qLo, qHi) = (8L, 508L)
    val truth = graft.ext.SimilarityQueries
      .bruteTopkFor(spark, sfDir, loId = qLo, hiId = qHi, k = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val nQueries = truth.map(_._1).size
    for (p <- planeCounts; multi <- Seq(false, true)) {
      spark.catalog.clearCache()
      val cands = graft.ext.SimilarityQueries
        .lshCandidatesFor(spark, sfDir, multi, p, qLo, qHi)
        .cache()
      val nCand = cands.count()
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      val got = cands.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      cands.unpersist()
      val recall = got.intersect(truth).size.toDouble / truth.size
      println(f"LSH planes=$p%2d probes=${if (multi) p + 1 else 1}%2d " +
        f"recall@3=$recall%.3f hits=${got.intersect(truth).size}/${truth.size} " +
        f"cand=$nCand cand_per_q=${nCand.toDouble / nQueries}%.1f")
    }
    spark.stop()
  }
}
