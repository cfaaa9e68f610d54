package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build an N× scaled copy of a testdata SF dir by unioning
  * key-offset copies (FKs offset consistently so joins stay valid;
  * document text perturbed per copy so cross-copy texts are NOT
  * near-duplicates). Used to measure scaling behavior beyond the largest
  * provided fixture.
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <copies> */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args
    val copies = copiesStr.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val OK = 1000000000L  // orderkey stride per copy
    val CK = 10000000L    // custkey stride — ALSO the events.user_id
                          // stride: user_id joins o_custkey (asof join),
                          // so both sides must shift by the same stride
                          // or cross-copy FKs break; CK also exceeds the
                          // fixture user_id range, so copies never merge
                          // distinct users' event streams.
    val DK = 10000000L    // doc/vec/event id stride

    def rep(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until copies).map(i => f(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"scaled $name x$copies")
    }

    for (t <- Seq("region", "nation", "supplier", "part"))
      rep(t)((df, i) => if (i == 0) df else df.limit(0)) // dims stay 1x

    rep("customer")((df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * CK)))
    rep("orders")((df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * OK))
      .withColumn("o_custkey", col("o_custkey") + lit(i * CK)))
    rep("lineitem")((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * OK)))
    rep("events")((df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * DK))
      .withColumn("user_id", col("user_id") + lit(i * CK)))
    // Distinct vowel permutation per copy: changes (nearly) every token,
    // so shingle overlap across copies is ~0 — cross-copy docs are NOT
    // near-duplicates and dedup workloads scale on corpus size, not on
    // an artificially inflated duplicate rate.
    val vowelPerms = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio",
      "aeoiu", "eiaou", "ioeua")
    rep("documents")((df, i) => df
      .withColumn("doc_id", col("doc_id") + lit(i * DK))
      .withColumn("text",
        if (i == 0) col("text")
        else translate(col("text"), "aeiou", vowelPerms(i % vowelPerms.size))))
    // Circular dimension shift per copy: preserves norms and the value
    // distribution but rotates the direction, so a vector and its shifted
    // copies have near-zero cosine — cross-copy vectors are NOT near-dups
    // and vector-dedup workloads scale on corpus size, not on an
    // artificially inflated duplicate rate (identical copies would make
    // every vector 8 exact twins: cos 1.0).
    rep("embeddings")((df, i) => df
      .withColumn("vec_id", col("vec_id") + lit(i * DK))
      .withColumn("embedding",
        if (i == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${i % 63 + 1}, " +
          s"size(embedding) - ${i % 63}), slice(embedding, 1, ${i % 63}))")))
    spark.stop()
  }
}
