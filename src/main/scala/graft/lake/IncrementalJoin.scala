package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an equi-JOIN materialized view from the
  * change feeds of both base tables — the join companion to
  * [[IncrementalAgg]] (which maintains aggregates): the view is
  * `facts INNER JOIN dims ON jk` keyed by the fact table's primary key,
  * with `jk` unique in `dims` (the FK-join shape — an enriched fact
  * table, the single most common materialized view in a warehouse).
  *
  * Delta algebra, by change side:
  *   - CHANGED FACT rows re-join the CURRENT dim table: O(Δfacts) work.
  *     A changed fact whose join key now dangles (no dim row) LEAVES the
  *     inner-join view; fact deletes leave it too.
  *   - CHANGED DIM keys invalidate every fact row carrying them: those
  *     facts are re-read via a key-pruned probe of the fact table and
  *     re-joined. The probe is the one step that touches base data
  *     beyond the feeds, and it goes through the unified
  *     [[MergeTable.scanVersion]] planner — with jk among the fact
  *     table's statsCols/bloomCols ([[MergeTable]] X115/bloom index)
  *     the probe reads ONLY files whose recorded stats range or bloom
  *     sidecar can hold an affected key (a pathologically wide dim
  *     delta falls back to a full-scan semi-join).
  *     It also covers dim INSERTS (facts that were unmatched join in)
  *     — which no view-local strategy can, since dropped rows are not
  *     in the view to find.
  *
  * Both sides fold into ONE [[MergeTable.mergeCdc]] feed (upserts +
  * deletes), so a refresh is a single atomic commit and re-running the
  * same version window is idempotent (same candidates → same merge).
  * The base fact table is never fully rescanned; dim reads are
  * dim-sized.
  */
object IncrementalJoin {

  /** The view's defining query — the initial materialization and the
    * recompute oracle the spec compares against. */
  def fullJoin(facts: DataFrame, dims: DataFrame, jk: String): DataFrame =
    facts.join(dims, Seq(jk), "inner")

  /** Changed-key counts up to this bound collect to the driver and
    * drive a file-skipping [[MergeTable.scanVersion]] probe (an IN-list
    * over per-file stats ranges + bloom sidecars — metadata-scale);
    * wider dim deltas fall back to the full-scan semi-join. 100k longs
    * is ~1 MB of driver heap — far below any manifest the driver
    * already folds. */
  private val MaxProbeKeys = 100000

  /** Fold both tables' `(fromV, toV]` change feeds into `view`.
    * Returns the view's new version (or the current one when the window
    * is empty on both sides). Reads are WINDOW-CONSISTENT: the re-join
    * and dangling probe use the dim snapshot at `dimToV` and the fact
    * probe reads the snapshot at `factToV`, so a refresh replayed after
    * later commits still reproduces the window's view state. */
  /** Cache AND materialize now — the Δ-scale relations below sit on
    * multiple join sides plus emptiness/merge passes, and each is a
    * lazily-recomputed CDF diff (a full-outer join over changed
    * partitions); uncached, the diffs re-ran 5+ times per refresh. At
    * 100 TB these are exactly the Δ intermediates a view-maintenance
    * job persists. */
  private def eager(df: DataFrame): DataFrame = {
    df.cache(); df.count(); df
  }

  /** [[eager]] that also returns the materialized count — callers use
    * it to answer emptiness questions without another action. */
  private def eagerN(df: DataFrame): (DataFrame, Long) = {
    df.cache(); (df, df.count())
  }

  def refresh(view: MergeTable, facts: MergeTable, dims: MergeTable,
      pk: String, jk: String,
      factFromV: Long, factToV: Long,
      dimFromV: Long, dimToV: Long): Long = {
    val ct = MergeTable.ChangeType
    val dFact = eager(facts.changes(factFromV, factToV, pk))
    val dDim = eager(dims.changes(dimFromV, dimToV, jk))
    try refreshCached(view, facts, dims, pk, jk, factToV, dimToV,
      dFact, dDim)
    finally { dFact.unpersist(); dDim.unpersist() }
  }

  private def refreshCached(view: MergeTable, facts: MergeTable,
      dims: MergeTable, pk: String, jk: String,
      factToV: Long, dimToV: Long,
      dFact: DataFrame, dDim: DataFrame): Long = {
    val ct = MergeTable.ChangeType
    val dims1 = dims.readVersion(dimToV)

    // Fact-side: post-image rows recompute their own view rows.
    val changedFactRows = dFact.filter(col(ct) =!= "delete").drop(ct)
    val factDeletePks = dFact.filter(col(ct) === "delete").select(col(pk))

    // Dim-side: key-pruned probe of facts carrying a changed jk. The
    // changed keys are Δdim-scale, so they collect and feed the
    // manifest-level key probe ([[MergeTable.probeKeysVersion]]) — only
    // fact files whose stats range or bloom filter can hold an affected
    // key are read, making the refresh O(Δ) in base-table IO instead of
    // a full fact scan. The prune stays driver-side METADATA: the row-
    // level residual is the semi-join below (AQE broadcasts the Δ-scale
    // key relation), never an N-literal IN in the executed plan — a
    // wide literal list re-costs every downstream action's re-analysis
    // (measured: a 12k-literal probe predicate at sf0.1 added ~4 s to
    // the whole refresh pipeline vs the semi-join residual). Fact rows
    // already in the fact delta are excluded (their post-image above is
    // newer than any stored row the probe would read).
    val dimKeys = dDim.select(col(jk)).distinct()
    val keyVals = dimKeys.limit(MaxProbeKeys + 1).collect()
      .map(_.get(0)).filter(_ != null).toSeq
    val probedBase =
      if (keyVals.isEmpty) facts.readVersion(factToV).limit(0)
      else if (keyVals.size <= MaxProbeKeys)
        facts.probeKeysVersion(factToV, jk, keyVals)
          .join(dimKeys, Seq(jk), "left_semi")
      else facts.readVersion(factToV).join(dimKeys, Seq(jk), "left_semi")
    val probed = probedBase
      .join(dFact.select(col(pk)).distinct(), Seq(pk), "left_anti")

    // candidates sits on TWO join sides (the re-join and the dangling
    // anti-join) and includes the probe read — cache it too
    val (candidates, candN) =
      eagerN(changedFactRows.unionByName(probed))
    try {
      val joined = candidates.join(dims1, Seq(jk), "inner")
        .withColumn(ct, lit("update_postimage"))
      // Inner-join semantics: a candidate with no current dim row must
      // not be in the view — covers dim deletes AND fact updates that
      // moved jk to a dangling key.
      val dangling = candidates.join(dims1, Seq(jk), "left_anti")
        .select(col(pk)).withColumn(ct, lit("delete"))
      val deletes = factDeletePks.withColumn(ct, lit("delete"))
        .unionByName(dangling)

      val feed = joined.unionByName(deletes, allowMissingColumns = true)
      // |feed| = |candidates| + |factDeletePks|: every candidate lands
      // in exactly one of joined/dangling (inner vs anti on the same
      // dim side), so emptiness needs NO action over the join-heavy
      // feed — candN is free from the eager count, and the delete-pk
      // probe only runs (a cache-scan) when candN == 0 (r15 job diet:
      // feed.isEmpty re-executed both joins and their broadcasts).
      val feedEmpty = candN == 0L && factDeletePks.isEmpty
      if (feedEmpty) view.latestVersion()
      else view.mergeCdc(feed, pk)
    } finally candidates.unpersist()
  }
}
