package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: embedNeardup cost diagnostic — candidate-pair count (the
  * verify work) and surviving pairs per SF dir. The candidate count must
  * grow ~linearly with corpus size for the corpus-width LSH bands to be
  * scale-safe (SURVEY §6.1 evidence).
  * Usage: runMain graft.tools.NeardupStats <sfDir...> */
object NeardupStats {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      spark.catalog.clearCache()
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      val cand = graft.ext.SimilarityQueries.neardupScored(spark, d).count()
      val out = graft.ext.SimilarityQueries.embedNeardup(spark, d).count()
      println(s"NEARDUP dir=$d n_vectors=$n candidate_pairs=$cand " +
        s"surviving=$out")
    }
    spark.stop()
  }
}
