package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.MergeTable

/** Persisted ANN index artifacts — the production lifecycle for the
  * IVF / PQ search tiers ([[SimilarityQueries.embedIvf]] /
  * [[SimilarityQueries.embedIvfPq]] retrain BOTH indexes inside every
  * query run, which is the right shape for a self-contained oracle
  * query but a non-starter at 100 TB: the Lloyd training cost must be
  * paid once at build time, then amortized over every search).
  *
  * Four [[MergeTable]] tables under one root:
  *
  *   - `centroids` — the Lloyd-refined IVF centroid table
  *     (cent_id, cvec, cnrm): C ≈ √(N/8) rows, broadcast at search.
  *   - `cells` — the corpus cell assignment
  *     (vec_id, embedding, nrm, cell), HIVE-PARTITIONED BY CELL so a
  *     search touches only its query cells' files (partition pruning is
  *     the on-disk analog of IVF's candidate pruning).
  *   - `pq_centroids` — the per-subspace PQ codebooks
  *     (sub, cent_id, cvec): M×K rows, broadcast at search.
  *   - `codes` — the PQ codes, one row per vector
  *     (vec_id, codes ARRAY — position = subspace), the only relation an
  *     ADC search scans.
  *
  * Search results are BIT-IDENTICAL to the inline-training queries:
  * training is deterministic (fixed seeds + fixed-point Lloyd means),
  * float/double values round-trip parquet exactly, and the search plans
  * below are the same joins/aggregates as the inline forms — proven by
  * VectorIndexSpec.
  *
  * Lifecycle: [[VectorIndex.build]] (re)trains everything;
  * [[VectorIndex#refresh]] applies a source change feed
  * ([[MergeTable.changes]], X60) incrementally — changed keys are
  * re-assigned and re-encoded against the FROZEN centroids/codebooks and
  * merged in ([[MergeTable.mergeCdc]] rewrites only touched partitions),
  * so an upsert wave costs O(changed vectors), never a retrain. Retrain
  * (a new [[VectorIndex.build]]) remains a deliberate, rare event — the
  * standard serving-index split between catch-up and rebuild.
  */
final class VectorIndex private[ext] (s: SparkSession, root: String) {
  import SimilarityQueries._

  val centroids: MergeTable = MergeTable(s, s"$root/centroids")
  /** Cell-partitioned, with OPTIMIZED WRITES: without the pre-write
    * co-location shuffle a refresh's mergeCdc rewrite emitted
    * tasks × touched-cells part files (measured 352 files for one
    * ~C-cell catch-up at sf0.1) — every later partition-pruned search
    * then opens that many small files per probed cell. With it, a
    * rewrite lands ~one file per touched cell. */
  val cells: MergeTable =
    MergeTable(s, s"$root/cells", Some("cell")).withOptimizeWrite
  val pqCentroids: MergeTable = MergeTable(s, s"$root/pq_centroids")
  val codes: MergeTable = MergeTable(s, s"$root/codes")

  private def ct = MergeTable.ChangeType

  /** A persisted centroid-scale artifact (IVF centroids, PQ codebooks)
    * read back DRIVER-LOCAL ([[DedupQueries.localized]]): one collect,
    * then every broadcast of it across a search's or refresh's actions
    * is job-free instead of re-scanning the table per consuming action
    * (r15 job diet — the lifecycle queries' dominant job class). */
  private def localRead(t: MergeTable): DataFrame =
    DedupQueries.localized(t.read())

  /** Queries (query_id, embedding) assigned to their `nprobe` nearest
    * IVF cells by the persisted centroids — the broadcast assignment of
    * [[SimilarityQueries.assignTo]] (nprobe=1, the argmax) /
    * [[SimilarityQueries.assignTopN]] (nprobe>1, one row per probed
    * cell — the production recall knob every IVF index exposes;
    * candidate volume grows ~nprobe×, measured in SURVEY §6.2b). */
  private def assignedQueries(queries: DataFrame,
      nprobe: Int = 1): DataFrame =
    SimilarityQueries.assignTopN(
      normedOf(s, queries.select(col("query_id").as("vec_id"),
        col("embedding"))),
      localRead(centroids), nprobe)

  /** The cell relation restricted to `wanted` cells via PARTITION
    * pruning — only those cells' files are read. The wanted set is at
    * most C cell ids (centroid-table scale — the same driver-metadata
    * budget the broadcast assignment already spends). */
  private def cellsIn(wanted: Set[String]): DataFrame =
    cells.read(Some(wanted.contains))
      .withColumn("cell", col("cell").cast("bigint"))

  private def queryCellIds(q: DataFrame): Set[String] =
    q.select(col("cell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet

  /** Exact-cosine in-cell top-`k` from the persisted index — the
    * [[SimilarityQueries.embedIvf]] search stage with training replaced
    * by one broadcast centroid read. Output (query_id, cell,
    * neighbor_id, sim, rank); corpus queries never match themselves.
    * `nprobe` widens the search to the n nearest cells per query
    * (partition pruning still reads ONLY probed cells' files; a corpus
    * vector lives in exactly one cell, so probed cells never produce
    * duplicate candidate pairs); nprobe=1 is the oracle form. */
  def searchIvf(queries: DataFrame, k: Int = 3,
      nprobe: Int = 1): DataFrame = {
    val q = assignedQueries(queries, nprobe)
      .select(col("vec_id").as("query_id"), col("cell"),
        col("embedding").as("qvec"), col("nrm").as("qnrm"))
    // The assigned QUERY relation is driver-bounded by contract (it is
    // the search request batch); localized, its downstream broadcasts
    // are job-free and the assignment subtree runs exactly once (r16
    // job diet: the eager-cache shape paid a count job + one broadcast
    // materialization job per consuming action).
    val qc = DedupQueries.localized(q)
    val corpus = cellsIn(queryCellIds(qc))
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("embedding").as("cvec"), col("nrm").as("cnrm"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    corpus.join(qc, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        expr(s"round(${dot("qvec", "cvec")} / (qnrm * cnrm), 6)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"), col("neighbor_id"),
        col("sim"), col("rank"))
  }

  /** Cell-pruned ADC top-`k` from the persisted index — the
    * [[SimilarityQueries.embedIvfPq]] search stage: IVF cells prune
    * candidates (partition-pruned file reads here), the broadcast
    * distance table scores PQ CODES — corpus vectors are never touched.
    * Output (query_id, neighbor_id, adist_fp, rank). */
  def searchIvfPq(queries: DataFrame, k: Int = 3,
      nprobe: Int = 1): DataFrame = {
    // Driver-bounded query batch — localized, same rationale as
    // [[searchIvf]]'s qc.
    val qCells = DedupQueries.localized(assignedQueries(queries, nprobe)
      .select(col("vec_id").as("query_id"), col("cell")))
    val cand = cellsIn(queryCellIds(qCells))
      .select(col("vec_id"), col("cell"))
      .join(qCells, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val cent = localRead(pqCentroids)
    // (queries × M × K) rows — driver-bounded by the request batch;
    // localized so the scored join's broadcast of it is job-free.
    val dt = DedupQueries.localized(
      pqSubRel(queries.select(col("query_id").as("vec_id"),
        col("embedding")), PqSubs, cache = false)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cent), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id"),
        expr("CAST(floor(aggregate(zip_with(svec, cvec, " +
          "(x, c) -> (x - c) * (x - c)), 0D, (acc, v) -> acc + v) " +
          "* 1000000.0) AS BIGINT)").as("dfp")))
    val codeRel = codes.read()
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = cand.join(codeRel, Seq("vec_id"))
      .join(broadcast(dt), Seq("query_id", "sub"))
      .filter(col("code") === col("cent_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dfp")).as("adist_fp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_fp"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adist_fp"), col("rank"))
  }

  /** Two-stage ADC search with EXACT RE-RANK — the production answer
    * to the measured ADC recall ceiling (SURVEY §6.2b: PQ-code scoring
    * is the recall bottleneck on hard corpora, and probing more cells
    * buys nothing): stage 1 takes the top-`shortlist` per query by ADC
    * distance (codes only — the cheap wide scan), stage 2 fetches ONLY
    * those shortlist vectors (probed-cell partition-pruned files, a
    * queries×shortlist point-lookup batch) and re-ranks them by exact
    * cosine. Per-query full-vector work drops from |probed cells| to
    * `shortlist`, which is what lets the wide stage stay quantized at
    * 100 TB. Output shape = [[searchIvf]] minus the cell column:
    * (query_id, neighbor_id, sim, rank). */
  def searchIvfPqRerank(queries: DataFrame, k: Int = 3,
      shortlist: Int = 16, nprobe: Int = 1): DataFrame = {
    // The ADC shortlist is (queries × shortlist) rows — driver-bounded
    // by the search request like the assigned queries below; localized,
    // the stage-1 pipeline executes exactly once and stage 2's
    // broadcasts of both relations are job-free (r16 job diet).
    val short = DedupQueries.localized(searchIvfPq(queries, shortlist, nprobe)
      .select(col("query_id"), col("neighbor_id")))
    val qCells = DedupQueries.localized(assignedQueries(queries, nprobe)
      .select(col("vec_id").as("query_id"), col("cell"),
        col("embedding").as("qvec"), col("nrm").as("qnrm")))
    val qVecs = qCells.dropDuplicates(Seq("query_id"))
      .select(col("query_id"), col("qvec"), col("qnrm"))
    val fetch = cellsIn(queryCellIds(qCells))
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cvec"), col("nrm").as("cnrm"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    short.join(fetch, Seq("neighbor_id"))
      .join(qVecs, Seq("query_id"))
      .withColumn("sim",
        expr(s"round(${dot("qvec", "cvec")} / (qnrm * cnrm), 6)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Incremental index catch-up from a source change feed
    * ([[MergeTable.changes]] rows: vec_id, embedding, `_change_type`,
    * net one event per key). Upserted vectors are re-assigned and
    * re-encoded against the FROZEN persisted centroids/codebooks;
    * deletes drop the key from both relations. Each relation updates in
    * one atomic [[MergeTable.mergeCdc]] commit that rewrites only the
    * touched cell partitions — O(changed vectors), never a retrain or a
    * corpus rescan. */
  /** Phase label for job attribution (guide §1.5) — broadcast futures
    * inherit it via withThreadLocalCaptured. */
  private def labeled[T](what: String)(f: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft:$what")
    try f finally sc.setJobDescription(prev)
  }

  def refresh(feed: DataFrame): Unit = labeled("vindex-refresh") {
    // Eager-cache the feed ONCE: it is typically a lazily-recomputed
    // CDF diff (a full-outer join over the source's changed
    // partitions), and everything below derives from it — two
    // emptiness probes, the cell re-assignment, the PQ re-encode, and
    // each mergeCdc's own passes. Uncached, the diff re-ran 4+ times
    // per refresh (measured: the dominant slice of the
    // q_embed_ivf_refresh refresh stage).
    val f = DedupQueries.eager(
      feed.select(col("vec_id"), col("embedding"), col(ct)))
    try refreshCached(f)
    finally f.unpersist()
  }

  private def refreshCached(feed: DataFrame): Unit = {
    val ups = feed.filter(col(ct).isin("insert", "update", "update_postimage"))
      .select(col("vec_id"), col("embedding"))
    val dels = feed.filter(col(ct) === "delete").select(col("vec_id"))
    // ONE aggregation pass over the cached feed answers both emptiness
    // questions (r16 job diet: the two isEmpty probes each cost a
    // Spark job per refresh).
    val counts = feed.groupBy(col(ct)).count().collect()
      .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1))
      .toMap
    val hasUps = Seq("insert", "update", "update_postimage")
      .exists(counts.getOrElse(_, 0L) > 0L)
    val hasDels = counts.getOrElse("delete", 0L) > 0L
    if (!hasUps && !hasDels) return

    val cellsFeed = {
      val up =
        if (hasUps)
          assignTo(normedOf(s, ups), localRead(centroids))
            .withColumn(ct, lit("update"))
        else null
      val del =
        if (hasDels)
          dels.withColumn("cell", lit(null).cast("bigint"))
            .withColumn("embedding", lit(null).cast("array<float>"))
            .withColumn("nrm", lit(null).cast("double"))
            .withColumn(ct, lit("delete"))
        else null
      if (up == null) del
      else if (del == null) up
      else up.unionByName(del.select(up.columns.map(col).toSeq: _*))
    }
    cells.mergeCdc(cellsFeed, "vec_id")

    val codesFeed = {
      val up =
        if (hasUps)
          wideCodes(pqAssign(pqSubRel(ups, PqSubs), localRead(pqCentroids)))
            .withColumn(ct, lit("update"))
        else null
      val del =
        if (hasDels)
          dels.withColumn("codes", lit(null).cast("array<bigint>"))
            .withColumn(ct, lit("delete"))
        else null
      if (up == null) del
      else if (del == null) up
      else up.unionByName(del.select(up.columns.map(col).toSeq: _*))
    }
    codes.mergeCdc(codesFeed, "vec_id")
  }

  /** (vec_id, sub, code) → one row per vector with the code ARRAY in
    * subspace order — the storage layout of the `codes` table. */
  private[ext] def wideCodes(narrow: DataFrame): DataFrame =
    narrow.groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))
}

object VectorIndex {

  /** (Re)train and persist every artifact from an embeddings relation
    * (vec_id, embedding). The training rules are EXACTLY the inline
    * queries' ([[SimilarityQueries.trainedCentroids]] /
    * [[SimilarityQueries.pqTrain]] — deterministic seeds, fixed-point
    * Lloyd means), so a search from the result is bit-identical to the
    * train-inline oracle forms. */
  def build(s: SparkSession, emb: DataFrame, root: String): VectorIndex = {
    import SimilarityQueries._
    val idx = new VectorIndex(s, root)
    idx.labeled("vindex-build") {
    // One materialization answers the corpus count too (r16 job diet:
    // emb.count() was a second full-scan action).
    val (e, n) = DedupQueries.eagerCounted(normedOf(s, emb))
    idx.centroids.overwrite(
      trainedCentroids(e, n, LloydRounds))
    // assignment runs against the PERSISTED centroid values (parquet
    // round-trip is exact for float/double, so this equals assigning
    // against the in-memory table — but reading back makes the
    // persisted artifact the single source of truth)
    idx.cells.overwrite(assignTo(e, idx.localRead(idx.centroids)))
    val sub = pqSubRel(emb, PqSubs)
    idx.pqCentroids.overwrite(pqTrain(sub, PqK, PqRounds))
    idx.codes.overwrite(idx.wideCodes(
      pqAssign(sub, idx.localRead(idx.pqCentroids))
        .select(col("vec_id"), col("sub"), col("code"))))
    idx
    }
  }

  /** Open an existing index; fails fast if any artifact is missing. */
  def open(s: SparkSession, root: String): VectorIndex = {
    val idx = new VectorIndex(s, root)
    val missing = Seq(
      "centroids" -> idx.centroids, "cells" -> idx.cells,
      "pq_centroids" -> idx.pqCentroids, "codes" -> idx.codes)
      .collect { case (n, t) if t.latestVersion() == 0L => n }
    require(missing.isEmpty,
      s"no vector index at $root: missing ${missing.mkString(", ")}")
    idx
  }
}
