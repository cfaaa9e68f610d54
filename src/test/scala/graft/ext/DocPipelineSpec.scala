package graft.ext

import graft.SparkSpec

class DocPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("clean composes quality gate, exact dedup, and near-dup removal") {
    val d = tmpDir("pipe")
    val base = "spark shuffles data across the cluster when a wide " +
      "dependency requires rows with the same key on the same partition " +
      "and the optimizer cannot avoid it"
    Seq(
      (0L, base, "en", "src0", base.length.toLong),            // survives
      (1L, base, "en", "src0", base.length.toLong),            // exact dup
      (2L, base.replace("avoid it", "avoid that"), "en", "src1",
        base.length.toLong),                                   // near dup
      (3L, "tiny doc here", "en", "src3", 13L))                // fails gate
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    val (cleaned, stats) = DocPipeline.clean(spark, d.toString)
    assert(stats.input === 4L)
    assert(stats.afterQuality === 3L, "short doc drops at the gate")
    assert(stats.afterExact === 2L, "doc 1 collapses into doc 0")
    assert(stats.afterNeardup === 1L, "near-dup doc 2 drops")
    assert(cleaned.select("doc_id").as[Long].collect().toSeq === Seq(0L))
  }
}
