package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.AnalyticQueries

/** Specs for the training-data prep operators added in round 6:
  * sequence packing ([[TextQueries.docPack]]), overlapping chunking
  * ([[TextQueries.docChunks]]), int8 quantization
  * ([[SimilarityQueries.embedQuant]]) and cohort retention
  * ([[AnalyticQueries.retentionOf]]). The oracle gate proves engine
  * agreement; these prove the operators' algebraic contracts. */
class PipelinePrepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ---- docPack -----------------------------------------------------------

  test("docPack partitions the corpus: doc and token totals are preserved") {
    val packs = TextQueries.docPack(spark, sf)
    val Array(nDocs, nToks) = packs
      .agg(sum("n_docs"), sum("pack_tokens")).as[(Long, Long)]
      .collect().map(t => Array(t._1, t._2)).head
    val Array(expDocs, expToks) = TextQueries.textTokens(spark, sf)
      .agg(count(lit(1)), sum("n_tokens")).as[(Long, Long)]
      .collect().map(t => Array(t._1, t._2)).head
    assert(nDocs === expDocs, "every document lands in exactly one pack")
    assert(nToks === expToks, "token mass is preserved")
  }

  test("docPack packs are ordered and cut at the budget") {
    val budget = TextQueries.PackBudget
    val groups = TextQueries.docPack(spark, sf)
      .select("source", "pshard", "pack_id", "pack_tokens",
        "first_doc", "last_doc")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect()
      .groupBy(t => (t._1, t._2))
    assert(groups.nonEmpty)
    groups.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      // doc ranges of consecutive packs never overlap (docs are laid out
      // in id order, each assigned to the pack where it starts)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5,
          s"pack ${a._3} range must precede pack ${b._3}")
        case _ =>
      }
      // concat-and-chunk rule: the cumulative token count up through any
      // non-final pack reaches the next pack's starting boundary
      var cum = 0L
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          cum += a._4
          assert(cum >= budget * b._3,
            s"pack ${b._3} starts at offset ${budget * b._3} but only " +
              s"$cum tokens precede it")
        case _ =>
      }
    }
  }

  test("assembledPacks packs exactly the cleaned corpus") {
    val packs = DocPipeline.assembledPacks(spark, sf)
    val packed = packs.agg(sum("n_docs")).as[Long].collect().head
    val cleaned = DocPipeline.cleanedCorpus(spark, sf).count()
    assert(packed === cleaned,
      "every cleaned doc lands in exactly one pack, dropped docs in none")
    assert(cleaned < TextQueries.textTokens(spark, sf).count(),
      "the gate must actually drop something for this case to bite")
  }

  test("textRarity scores corpus-rare tokens high and counts hapaxes") {
    val d = tmpDir("rare")
    Seq(
      (1L, "common common common", "en", "s0", 0L),
      (2L, "common unique", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val m = TextQueries.textRarity(spark, d.toString)
      .select("doc_id", "n_tokens", "avg_rarity", "max_rarity", "n_hapax")
      .as[(Long, Long, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    // corpus: 5 tokens; 'common' freq 4 (rarity 1.25), 'unique' freq 1
    // (rarity 5.0, a hapax)
    assert(m(1L) === ((1L, 3L, 1.25, 1.25, 0L)))
    assert(m(2L) === ((2L, 2L, 3.125, 5.0, 1L)))
  }

  // ---- docChunks ---------------------------------------------------------

  test("docChunks emits ceil(n/stride) chunks of width ≤ window per doc") {
    val stride = TextQueries.ChunkStride
    val window = TextQueries.ChunkWindow
    val chunks = TextQueries.docChunks(spark, sf)
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        max("chunk_len").as("max_len"))
    val joined = TextQueries.textTokens(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
      .join(chunks, Seq("doc_id"))
      .as[(Long, Long, Long, Int)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, n, nChunks, maxLen) =>
      assert(nChunks === (n + stride - 1) / stride,
        s"doc $id: $n tokens must yield ceil(n/$stride) chunks")
      assert(maxLen <= window, s"doc $id: chunk wider than $window")
    }
  }

  test("docChunks fingerprints the exact overlapping token windows") {
    val d = tmpDir("chunks")
    val toks = (0 until 100).map(i => s"t$i")
    Seq((1L, toks.mkString(" "), "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = TextQueries.docChunks(spark, d.toString)
      .orderBy("chunk_idx")
      .select("chunk_start", "chunk_len", "chunk_fp")
      .as[(Long, Int, String)].collect()
    val stride = TextQueries.ChunkStride
    val window = TextQueries.ChunkWindow
    assert(rows.length === 3) // starts 0, 48, 96 for 100 tokens
    rows.zipWithIndex.foreach { case ((start, len, fp), i) =>
      assert(start === i.toLong * stride)
      val expected = toks.slice(start.toInt, start.toInt + window)
      assert(len === expected.length)
      assert(fp === md5hex(expected.mkString(" ")),
        s"chunk $i must fingerprint tokens [$start, ${start + window})")
    }
  }

  // ---- embedQuant --------------------------------------------------------

  test("embedQuant error never exceeds half a quantization step") {
    val rows = SimilarityQueries.embedQuant(spark, sf)
      .select("scale", "max_err").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (scale, err) =>
      assert(scale >= 0.0)
      // round-to-nearest: |x - q*scale| ≤ scale/2 (+ rounding of the
      // reported figures to 8 decimals)
      assert(err <= scale / 2 + 1e-8,
        s"max_err $err exceeds half-step ${scale / 2}")
    }
  }

  test("embedQuant codes a known vector exactly") {
    val d = tmpDir("quant")
    Seq((1L, Array(1.0f, -0.5f, 0.25f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val r = SimilarityQueries.embedQuant(spark, d.toString)
      .select("n_dims", "scale", "q_sum", "q_fp")
      .as[(Int, Double, Long, String)].collect().head
    // mx = 1.0 → codes: floor(v*127 + 0.5) = 127, -63, 32, 0
    assert(r._1 === 4)
    assert(math.abs(r._2 - 1.0 / 127.0) < 5e-9) // scale is rounded to 8 dp
    assert(r._3 === (127L - 63L + 32L + 0L))
    assert(r._4 === md5hex("127,-63,32,0"))
  }

  test("embedQuant maps the zero vector to all-zero codes") {
    val d = tmpDir("quant0")
    Seq((1L, Array(0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val r = SimilarityQueries.embedQuant(spark, d.toString)
      .select("scale", "q_sum", "max_err").as[(Double, Long, Double)]
      .collect().head
    assert(r === ((0.0, 0L, 0.0)))
  }

  // ---- retentionOf -------------------------------------------------------

  test("retentionOf builds the cohort matrix from first-active days") {
    val activity = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-04"),
      (1L, "2024-01-02"), // duplicate activity collapses
      (2L, "2024-01-02"),
      (3L, "2024-01-01"), (3L, "2024-01-11"))
      .toDF("user_id", "day_s")
      .select(col("user_id"), to_date(col("day_s")).as("day"))
    val m = AnalyticQueries.retentionOf(activity, "user_id", "day")
      .select(col("cohort_day").cast("string"), col("day_offset"),
        col("n_active"))
      .as[(String, Long, Long)].collect().toSet
    assert(m === Set(
      ("2024-01-01", 0L, 2L),  // users 1 and 3 acquired on day 0
      ("2024-01-01", 1L, 1L),  // user 1 back next day
      ("2024-01-01", 3L, 1L),
      ("2024-01-01", 10L, 1L), // user 3 back on day 10
      ("2024-01-02", 0L, 1L))) // user 2's own cohort
  }

  test("retentionOf offset-0 cells recover cohort sizes") {
    val days = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val m = AnalyticQueries.retentionOf(days, "user_id", "day")
    val day0 = m.filter(col("day_offset") === 0)
      .agg(sum("n_active")).as[Long].collect().head
    val users = days.select("user_id").distinct().count()
    assert(day0 === users,
      "every user appears exactly once at their cohort's offset 0")
  }

  // ---- product quantization ----------------------------------------------

  private def embFrame(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("vec_id", "embedding")

  test("pqCodesOf with 0 rounds codes a seed vector as itself, err 0") {
    val vs = (0L until 4L).map(i =>
      i -> Seq.tabulate(8)(p => (i * 8 + p).toFloat / 10f))
    val extra = Seq(100L -> vs(2)._2) // duplicate of seed 2
    val out = SimilarityQueries
      .pqCodesOf(embFrame(vs ++ extra), subs = 2, k = 4, rounds = 0)
      .select("vec_id", "sub", "code", "err")
      .as[(Long, Int, Long, Double)].collect()
    // every seed codes as itself with zero error in both subspaces
    vs.foreach { case (id, _) =>
      val mine = out.filter(_._1 == id)
      assert(mine.length === 2)
      assert(mine.forall(r => r._3 == id && r._4 == 0.0),
        s"seed $id must be its own nearest centroid: ${mine.toSeq}")
    }
    // the duplicate of seed 2 gets seed 2's codes, err 0
    assert(out.filter(_._1 == 100L).forall(r => r._3 == 2L && r._4 == 0.0))
  }

  test("pqCodesOf codes are identical for identical vectors after training") {
    val base = Seq.tabulate(8)(p => math.sin(p + 1).toFloat)
    val vs = (0L until 10L).map(i =>
      i -> Seq.tabulate(8)(p => (math.sin(i * 8 + p) * 0.5).toFloat)) ++
      Seq(50L -> base, 51L -> base)
    val out = SimilarityQueries
      .pqCodesOf(embFrame(vs), subs = 4, k = 4, rounds = 1)
      .select("vec_id", "sub", "code")
      .as[(Long, Int, Long)].collect()
    val a = out.filter(_._1 == 50L).map(r => r._2 -> r._3).toMap
    val b = out.filter(_._1 == 51L).map(r => r._2 -> r._3).toMap
    assert(a === b, "identical vectors must get identical PQ codes")
    assert(out.forall(r => r._3 >= 0L && r._3 < 4L), "codes within [0, K)")
  }

  test("embedPqSearch: 3 ranked neighbors per query, ascending, no self") {
    val rows = SimilarityQueries.embedPqSearch(spark, sf)
      .select("query_id", "neighbor_id", "adist_fp", "rank")
      .as[(Long, Long, Long, Int)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq === Seq(1, 2, 3))
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq,
        "approx distance must be ascending in rank")
      assert(g.forall(r => r._2 != r._1), "self excluded")
      assert(g.forall(_._3 >= 0L))
    }
  }

  test("embedIvfPq prunes to the query cell and scores like ADC") {
    val ivfpq = SimilarityQueries.embedIvfPq(spark, sf)
      .select("query_id", "neighbor_id", "adist_fp", "rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(ivfpq.nonEmpty)
    ivfpq.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length).toSeq,
        "contiguous ranks (a small cell may yield < 3 candidates)")
      assert(g.forall(r => r._2 != r._1))
    }
    // pruned search never returns more rows per query than the corpus-
    // wide ADC's cap, and agrees with it on the approximate distance of
    // any (query, neighbor) both return
    val full = SimilarityQueries.embedPqSearch(spark, sf)
      .select("query_id", "neighbor_id", "adist_fp")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ivfpq.foreach { case (q, n, d, _) =>
      full.get((q, n)).foreach(fd => assert(fd === d,
        s"ADC distance must match corpus-wide ADC for ($q,$n)"))
    }
  }

  test("pqCodesOf is partitioning-invariant (fixed-point Lloyd)") {
    val vs = (0L until 24L).map(i =>
      i -> Seq.tabulate(8)(p => (math.cos(i * 3 + p) * 2).toFloat))
    val one = SimilarityQueries
      .pqCodesOf(embFrame(vs).coalesce(1), 2, 4, 1)
      .select("vec_id", "sub", "code", "err")
      .as[(Long, Int, Long, Double)].collect().toSet
    val many = SimilarityQueries
      .pqCodesOf(embFrame(vs).repartition(7), 2, 4, 1)
      .select("vec_id", "sub", "code", "err")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(one === many)
  }
}
