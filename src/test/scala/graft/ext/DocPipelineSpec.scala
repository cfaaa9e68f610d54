package graft.ext

import org.apache.spark.sql.functions.col

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

  test("repetitive boilerplate drops at the gate even when quality passes") {
    val d = tmpDir("pipe3")
    val base = "spark shuffles data across the cluster when a wide " +
      "dependency requires rows with the same key on the same partition " +
      "and the optimizer cannot avoid it"
    // 51 tokens, zero stopword hits, ttr 0.059 — PASSES q_text_quality —
    // but its top bigram ('free money') takes 17/50 = 0.34 of all bigrams.
    val spam = Array.fill(17)("free money now").mkString(" ")
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, spam, "en", "spam", spam.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    val quality = TextQueries.textQuality(spark, d.toString)
      .filter(col("quality_pass")).select("doc_id").as[Long].collect().toSet
    assert(quality === Set(0L, 1L), "spam must pass the base quality gate")
    val (cleaned, stats) = DocPipeline.clean(spark, d.toString)
    assert(stats.afterQuality === 1L, "repetition cutoff catches the spam")
    assert(cleaned.select("doc_id").as[Long].collect().toSeq === Seq(0L))
  }

  test("near-dup survivor stays when its lower-id partner already dropped") {
    val d = tmpDir("pipe2")
    val base = "spark shuffles data across the cluster when a wide " +
      "dependency requires rows with the same key on the same partition " +
      "and the optimizer cannot avoid it"
    // 19 tokens < the quality gate's 20-token floor, but still a near-dup
    // of the full text (shingle Jaccard ≈ 17/24).
    val trunc = base.split(' ').take(19).mkString(" ")
    Seq(
      (10L, trunc, "en", "src0", trunc.length.toLong), // fails gate
      (11L, base, "en", "src1", base.length.toLong))   // last copy — keep
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    // Precondition: LSH really considers (10, 11) a near-dup pair, so the
    // old full-corpus loser logic WOULD have deleted doc 11.
    val pairs = DedupQueries.docNeardup(spark, d.toString)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)), "fixture must form an LSH pair")

    val (cleaned, stats) = DocPipeline.clean(spark, d.toString)
    assert(stats.afterQuality === 1L, "truncated doc drops at the gate")
    assert(stats.afterNeardup === 1L,
      "doc 11's partner is gone, so it is the last copy and must stay")
    assert(cleaned.select("doc_id").as[Long].collect().toSeq === Seq(11L))
  }

  test("curatedPacks packs exactly the cleaned-minus-excluded token mass") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cleaned = DocPipeline.cleanedCorpus(spark, sf)
    val excluded = DedupQueries.evalExcluded(cleaned)
    val expectedTokens = cleaned
      .join(excluded, Seq("doc_id"), "left_anti")
      .select(expr("size(split(text, ' '))").as("n")).agg(sum("n"))
      .as[Long].collect().head
    val curated = DocPipeline.curatedPacks(spark, sf)
    val packed = curated.agg(sum("pack_tokens")).as[Long].collect().head
    assert(packed === expectedTokens, "no token lost or invented")
    assert(excluded.count() > 0, "fixture must actually exclude docs")
    // strictly less than the un-curated assembly (the holdout is real)
    val assembled = DocPipeline.assembledPacks(spark, sf)
      .agg(sum("pack_tokens")).as[Long].collect().head
    assert(packed < assembled)
  }
}
