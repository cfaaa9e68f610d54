package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.MergeTable

/** Proves the persisted-ANN-index lifecycle (X113): search from the
  * on-disk artifacts is BIT-IDENTICAL to the train-inline oracle
  * queries, open() serves without retraining, and refresh() applies a
  * source change feed incrementally (frozen centroids, only touched
  * cell partitions rewritten). */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(16)(i => math.sin(seed * 31 + i).toFloat)

  /** 60 vectors, 16 dims (divisible by the 4 PQ subspaces). */
  private def corpus(n: Int = 60): DataFrame =
    (0 until n).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  /** A corpus dir readable by the inline-training query forms. */
  private lazy val dir: String = {
    val d = tmpDir("vidx")
    corpus().write.parquet(s"$d/embeddings.parquet")
    d.toString
  }

  private def queries(lo: Long = 8, hi: Long = 28): DataFrame =
    corpus().filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("query_id"), col("embedding"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private lazy val built: VectorIndex =
    VectorIndex.build(spark, corpus(), tmpDir("vidxroot").toString)

  test("searchIvf from the persisted index equals the inline-training query") {
    val inline = SimilarityQueries.embedIvf(spark, dir)
    val fromIndex = built.searchIvf(queries(), 3)
    assert(fromIndex.columns.toSeq === inline.columns.toSeq)
    assert(rows(fromIndex) === rows(inline))
    assert(rows(fromIndex).nonEmpty)
  }

  test("searchIvfPq from the persisted index equals the inline-training query") {
    val inline = SimilarityQueries.embedIvfPq(spark, dir)
    val fromIndex = built.searchIvfPq(queries(), 3)
    assert(fromIndex.columns.toSeq === inline.columns.toSeq)
    assert(rows(fromIndex) === rows(inline))
    assert(rows(fromIndex).nonEmpty)
  }

  test("open() serves searches from disk alone; missing artifacts fail fast") {
    val root = tmpDir("vidxopen").toString
    VectorIndex.build(spark, corpus(), root)
    val reopened = VectorIndex.open(spark, root)
    assert(rows(reopened.searchIvf(queries(), 3)) ===
      rows(built.searchIvf(queries(), 3)))
    val e = intercept[IllegalArgumentException] {
      VectorIndex.open(spark, tmpDir("vidxmissing").toString)
    }
    assert(e.getMessage.contains("no vector index"))
  }

  test("refresh applies a change feed against frozen centroids, incrementally") {
    // source-of-truth embeddings live in a MergeTable with a change feed
    val src = MergeTable(spark, tmpDir("vidxsrc").toString)
    src.overwrite(corpus())
    val v1 = src.latestVersion()
    val root = tmpDir("vidxrefresh").toString
    val idx = VectorIndex.build(spark, src.read(), root)
    val centBefore = rows(idx.centroids.read())
    val filesAtBuild = idx.cells.history()
      .filter(col("version") === 1L).select("n_added").as[Long].head()

    // a wave of changes: one vector moves, one is new, one is dropped
    src.merge(Seq((5L, vec(99)), (60L, vec(60))).toDF("vec_id", "embedding"),
      "vec_id")
    src.delete(col("vec_id") === 7L)
    idx.refresh(src.changes(v1, src.latestVersion(), "vec_id"))

    // centroids and codebooks are FROZEN — refresh never retrains
    assert(rows(idx.centroids.read()) === centBefore)

    // cells and codes now equal a full re-assignment of the NEW corpus
    // against the frozen artifacts
    val fullCells = SimilarityQueries.assignTo(
      SimilarityQueries.normedOf(spark, src.read()), idx.centroids.read())
    assert(rows(idx.cells.read().select("vec_id", "cell", "embedding", "nrm"))
      === rows(fullCells))
    val fullCodes = idx.wideCodes(SimilarityQueries.pqAssign(
      SimilarityQueries.pqSubRel(src.read(), 4), idx.pqCentroids.read())
      .select(col("vec_id"), col("sub"), col("code")))
    assert(rows(idx.codes.read()) === rows(fullCodes))

    // incrementality: the refresh commit rewrote only the touched cell
    // partitions — strictly fewer files removed than the table holds
    val refreshCommit = idx.cells.history()
      .orderBy(col("version").desc)
      .select("n_removed").as[Long].head()
    assert(refreshCommit < filesAtBuild,
      s"refresh must not rewrite all $filesAtBuild cell files " +
        s"(removed $refreshCommit)")

    // and the refreshed index actually serves the new reality
    val got = idx.searchIvf(
      Seq((60L, vec(60))).toDF("query_id", "embedding"), 3)
    assert(got.count() > 0)
    assert(idx.cells.read().filter(col("vec_id") === 7L).isEmpty,
      "deleted vector left the index")
    assert(idx.codes.read().filter(col("vec_id") === 7L).isEmpty)
  }

  test("nprobe widens the probe monotonically; probing all cells is exact") {
    // brute-force ground truth over the query window (same rounding and
    // tie order as the index search)
    val truth = SimilarityQueries
      .bruteTopkFor(spark, dir, loId = 8, hiId = 28, k = 3)
    val truthSet = rows(truth.select("query_id", "neighbor_id"))

    def recallAt(np: Int): Double = {
      val got = rows(built.searchIvf(queries(), 3, nprobe = np)
        .select("query_id", "neighbor_id"))
      got.intersect(truthSet).size.toDouble / truthSet.size
    }
    val r1 = recallAt(1)
    val r2 = recallAt(2)
    val rAll = recallAt(64) // ≥ cell count → probes every cell
    assert(r1 <= r2 && r2 <= rAll,
      s"recall must not decrease with nprobe: $r1, $r2, $rAll")
    assert(rAll === 1.0, "probing every cell must recover brute force")

    // full-probe search IS brute force, row for row
    val full = built.searchIvf(queries(), 3, nprobe = 64)
      .select("query_id", "neighbor_id", "sim", "rank")
    assert(rows(full) ===
      rows(truth.select("query_id", "neighbor_id", "sim", "rank")))

    // nprobe=1 stays the oracle form
    assert(rows(built.searchIvf(queries(), 3, nprobe = 1)) ===
      rows(SimilarityQueries.embedIvf(spark, dir)))
  }

  test("rerank with an unbounded shortlist equals the exact in-cell search") {
    // With shortlist ≥ any probed-cell population, the ADC stage keeps
    // every candidate and the exact re-rank IS searchIvf's in-cell
    // exact-cosine search — quantization can reorder the shortlist but
    // not its membership. Holding at both probe widths pins the
    // two-stage algebra (shortlist → vector fetch → re-rank) end to end.
    for (np <- Seq(1, 2)) {
      val exact = rows(built.searchIvf(queries(), 3, nprobe = np)
        .select("query_id", "neighbor_id", "sim", "rank"))
      val rr = rows(built.searchIvfPqRerank(queries(), 3,
          shortlist = 100000, nprobe = np)
        .select("query_id", "neighbor_id", "sim", "rank"))
      assert(rr === exact, s"nprobe=$np")
    }
  }
}
