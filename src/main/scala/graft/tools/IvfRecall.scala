package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: recall@3 of the IVF search tier against brute-force ground
  * truth, by Lloyd refinement round count — the measured evidence that
  * centroid refinement buys recall (SURVEY §6.2).
  * Usage: runMain graft.tools.IvfRecall [sfDir] [rounds...]  */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rounds =
      if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(0, 1, 2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ground truth: exact cosine top-3 over a 500-query window (the
    // oracle query's 20 ids are too few for a stable recall estimate)
    val (qLo, qHi) = (8L, 508L)
    val truth = graft.ext.SimilarityQueries
      .bruteTopkFor(spark, sfDir, loId = qLo, hiId = qHi, k = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    for (r <- rounds) {
      spark.catalog.clearCache()
      val got = graft.ext.SimilarityQueries
        .embedIvfRounds(spark, sfDir, r, qLo, qHi)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val recall = got.intersect(truth).size.toDouble / truth.size
      spark.catalog.clearCache()
      val sizes = graft.ext.SimilarityQueries.cellSizes(spark, sfDir, r)
        .select("n").as[Long].collect()
      val (mx, mean) = (sizes.max, sizes.sum.toDouble / sizes.length)
      println(f"RECALL rounds=$r recall@3=$recall%.3f " +
        f"hits=${got.intersect(truth).size}/${truth.size} " +
        f"cells=${sizes.length} max_cell=$mx mean_cell=$mean%.1f " +
        f"imbalance=${mx / mean}%.2f")
    }
    // nprobe sweep at the production round count (SURVEY §6.2b): the
    // multi-cell probe's recall/candidate trade, mirroring §6.2a's LSH
    // multi-probe table.
    val lloyd = graft.ext.SimilarityQueries.productionLloydRounds
    for (np <- Seq(1, 2, 4)) {
      spark.catalog.clearCache()
      val got = graft.ext.SimilarityQueries
        .embedIvfRounds(spark, sfDir, lloyd, qLo, qHi, nprobe = np)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val recall = got.intersect(truth).size.toDouble / truth.size
      spark.catalog.clearCache()
      val mass = graft.ext.SimilarityQueries
        .ivfCandidateMass(spark, sfDir, lloyd, qLo, qHi, np)
      println(f"NPROBE nprobe=$np recall@3=$recall%.3f " +
        f"hits=${got.intersect(truth).size}/${truth.size} " +
        f"cand_per_query=$mass%.1f")
    }
    // ADC-tier nprobe sweep (SURVEY §6.2b second table): the same
    // recall methodology against the PERSISTED index's searchIvfPq —
    // candidates from the probed cells, scored on PQ codes only, so
    // this measures probe-expansion + quantization loss together.
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft_ivfrecall_idx").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val idx = graft.ext.VectorIndex.build(spark, emb, idxRoot)
    val queries = emb
      .filter(org.apache.spark.sql.functions.col("vec_id") >= qLo &&
        org.apache.spark.sql.functions.col("vec_id") < qHi)
      .withColumnRenamed("vec_id", "query_id")
    for (np <- Seq(1, 2, 4)) {
      spark.catalog.clearCache()
      val got = idx.searchIvfPq(queries, 3, nprobe = np)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val recall = got.intersect(truth).size.toDouble / truth.size
      println(f"ADC nprobe=$np recall@3=$recall%.3f " +
        f"hits=${got.intersect(truth).size}/${truth.size}")
      spark.catalog.clearCache()
      val rr = idx.searchIvfPqRerank(queries, 3, shortlist = 16,
          nprobe = np)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val rrRecall = rr.intersect(truth).size.toDouble / truth.size
      println(f"ADC+RERANK nprobe=$np shortlist=16 recall@3=$rrRecall%.3f " +
        f"hits=${rr.intersect(truth).size}/${truth.size}")
    }
    spark.stop()
  }
}
