package graft.ext

import graft.Checkpoints.Truncate
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the core of an LLM
  * training-data pipeline (SURVEY.md §7.5(a); BASELINE.json north star).
  *
  * Tiers, cheapest first:
  *   1. exact duplicate groups (md5 of raw text) — one hash-shuffle;
  *   2. normalized duplicate groups (md5 of whitespace/case-normalized
  *      text) — catches formatting-only copies;
  *   3. MinHash/LSH near-dup candidate pairs — banded signatures so
  *      candidate generation is a shuffle join on band keys, NEVER an
  *      all-pairs cross join (the only shape that survives 100 TB);
  *   4. SimHash per-document bit fingerprints;
  *   5. exact n-gram Jaccard verification over a bounded candidate set
  *      (min-shingle-hash collision buckets).
  *
  * Every hash is md5-derived integer arithmetic (`conv(substr(md5 ...))`
  * then universal-hash `(a*h + b) % P`) — engine-portable, so the DuckDB
  * oracle reproduces signatures bit-for-bit. No engine-private hash
  * functions, no UDFs; everything is codegen'd built-ins.
  */
object DedupQueries {

  /** Universal-hash modulus and family — canonical definition lives in
    * [[graft.functions.HashFamily]] (shared with the `minhash_sig`
    * injection in GraftExtensions); the oracle SQL below is generated from
    * the same constants. */
  private val P = graft.functions.HashFamily.P
  private[ext] val AB: Seq[(Long, Long)] = graft.functions.HashFamily.AB

  private[ext] val NumHashes = AB.size
  private val Bands     = 4
  private val Rows      = NumHashes / Bands // 3 → LSH threshold ~ (1/4)^(1/3) ≈ 0.63

  /** Cache AND materialize now: these relations appear on 2-4 sides of
    * self-joins, and a lazy cache lets the first action race 4 concurrent
    * computations of the same subtree before any of them populates it
    * (measured 7× slowdown on the LSH queries' cold run). */
  private[ext] def eager(df: DataFrame): DataFrame = eagerCounted(df)._1

  /** [[eager]] returning the materializing count too — callers that
    * need the row count (IVF's C = f(N)) reuse it instead of paying a
    * second count action (r16 job diet). */
  private[ext] def eagerCounted(df: DataFrame): (DataFrame, Long) = {
    df.cache()
    (df, df.count())
  }

  /** Materialize a CENTROID-SCALE relation (C ≈ √(N/8) IVF centroids,
    * M×K PQ codebooks — bounded metadata, never data-scale) as a
    * DRIVER-LOCAL relation: one collect, then every downstream
    * `broadcast(...)` of it is job-free (a LocalRelation's broadcast
    * future collects on the driver — no Spark job, no re-execution of
    * the training subtree per consuming action). The eager-cache shape
    * this replaces paid one cache-scan broadcast JOB per consuming
    * action — the dominant job class of the lifecycle queries (r15
    * JobProfile: 74 of q_embed_ivf_refresh's 109 jobs were broadcast
    * materializations). Values round-trip collect/createDataFrame
    * exactly (same JVM doubles/floats), so results are bit-identical —
    * the same driver-side centroid discipline Spark MLlib's KMeans
    * uses. */
  private[ext] def localized(df: DataFrame): DataFrame = {
    val cap = LocalizedMaxRows
    // ENFORCED driver budget (r15 verdict #3): collect at most cap+1
    // rows; a relation that overflows the centroid-scale contract falls
    // back to the distributed eager-cache path instead of flooding the
    // driver. limit() is exact here — under the cap it returns every
    // row, over it the result is discarded. initialNumPartitions is
    // scoped UP for this one collect: CollectLimit's default 1→4×
    // incremental probing costs 3-4 Spark jobs per localize on an
    // under-limit relation (measured r16: +20 jobs on
    // q_embed_ivf_refresh); one all-partition pass is the single-job
    // shape the old plain collect() had.
    val sess = df.sparkSession
    val ipKey = "spark.sql.limit.initialNumPartitions"
    val prev = sess.conf.getOption(ipKey)
    sess.conf.set(ipKey, Int.MaxValue.toString)
    val rows =
      try df.limit(cap + 1).collect()
      finally prev match {
        case Some(v) => sess.conf.set(ipKey, v)
        case None    => sess.conf.unset(ipKey)
      }
    if (rows.length > cap) eager(df)
    else df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Row budget for [[localized]] — centroid-scale relations are far
    * below it; a data-scale relation must never land on the driver.
    * Overridable for specs via `graft.localized.maxRows`. */
  private[ext] def LocalizedMaxRows: Int =
    sys.props.get("graft.localized.maxRows")
      .flatMap(_.toIntOption).getOrElse(1 << 20)

  /** doc_id + distinct 3-word shingles + their base hashes (mod P). */
  private def shingled(s: SparkSession, d: String): DataFrame =
    shingledOf(documents(s, d))

  /** [[shingled]] over an arbitrary documents slice (the incremental
    * tier shingles history and the new batch separately). */
  private def shingledOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(
        """array_distinct(CASE WHEN size(toks) >= 3
             THEN transform(sequence(0, size(toks) - 3),
                            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             ELSE array(text) END)"""))
      .withColumn("hs", expr(
        s"""transform(shingles,
              s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint) % $P)"""))

  /** doc_id + MinHash signature as ONE `array<bigint>` column `sig`,
    * computed by the native codegen'd [[graft.functions.MinHashSig]]
    * expression (one traversal, primitive loops) — bit-identical to the
    * `array(array_min(transform(hs, ...)), ...)` HOF form it replaced
    * (proven by MinHashFunctionsSpec). */
  private def sigFrom(sh: DataFrame): DataFrame = {
    graft.functions.MinHashFunctions.register(sh.sparkSession, AB, P)
    sh.select(col("doc_id"), expr("minhash_sig(hs)").as("sig"))
  }

  /** (doc_id, sig, band, bkey) — one row per document per LSH band. */
  private def bandsFrom(sig: DataFrame): DataFrame = {
    val bandKeys = (0 until Bands).map { j =>
      val parts = (0 until Rows).map(r => s"sig[${j * Rows + r}]")
      s"concat_ws('_', ${parts.mkString(", ")})"
    }
    sig.select(col("doc_id"), col("sig"),
      posexplode(expr(s"array(${bandKeys.mkString(", ")})"))
        .as(Seq("band", "bkey")))
  }

  /** LSH candidate pairs: group band rows by (band, key) and explode each
    * bucket's pairs in place — ONE shuffle, no self-join, no cache. Bucket
    * sizes are bounded by r-way hash agreement, so per-bucket pair
    * generation is never all-pairs; a hot bucket (constant-text spam) is a
    * bounded quadratic blowup inherent to LSH, not a plan defect. */
  private def candidatesFrom(sig: DataFrame): DataFrame =
    bandsFrom(sig)
      .groupBy(col("band"), col("bkey"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)),
                       y -> struct(x AS doc_a, y AS doc_b))))""")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()

  /** Tier 1 — exact-duplicate groups: md5(text) → (fingerprint,
    * canonical doc, copy count). One partial-agg shuffle at any scale. */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Tier 2 — normalized-duplicate groups: lowercase, collapse whitespace,
    * trim, then the same group-by-fingerprint. */
  def dedupNorm(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Tier 3 — MinHash/LSH near-duplicate pairs.
    *
    * signature → band keys → group by (band, key) → explode in-bucket
    * pairs WITH both signatures attached → score estimated Jaccard as the
    * fraction of agreeing signature components → keep est ≥ 0.5.
    *
    * Scale shape: carrying the 12-long signature through the bucket
    * aggregate (~100 bytes/doc/band) means the pair scoring needs ZERO
    * joins and zero caches — the whole query is two shuffles (bucket
    * group-by, pair distinct), one action. Nothing is quadratic in corpus
    * size; a hot band key (constant-text spam) is AQE-skew territory, not
    * a plan change. */
  def docNeardup(s: SparkSession, d: String): DataFrame =
    bandsFrom(sigFrom(shingled(s, d)))
      .groupBy(col("band"), col("bkey"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("sig")))).as("ms"))
      .filter(size(col("ms")) >= 2)
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
             transform(slice(ms, i + 2, size(ms)), y ->
               struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
                      size(filter(zip_with(x.sig, y.sig, (p, q) -> p = q),
                                  b -> b)) AS n_eq))))""")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.n_eq").as("n_eq"))
      .distinct()
      .filter(col("n_eq") * 2 >= NumHashes)
      .select(col("doc_a"), col("doc_b"),
        expr(s"round(cast(n_eq as double) / $NumHashes, 4)")
          .as("est_jaccard"))

  /** Deterministic corpus split for the incremental tier — doc_id % 10
    * == 0 is the ARRIVING batch (~10%), the rest is history. Shared
    * with the oracle so both engines replay the same split. */
  private val NewBatchMod = 10L

  /** How many range-clustered files the persisted band index is written
    * as: enough that the probe's file skipping is observable at fixture
    * scale (each file covers one band's bhash subrange). */
  private val IncrIndexFiles = 16

  /** One row per (doc, band) of the persisted band index: the band key,
    * its LONG probe hash `bhash` (md5-derived — the file-skipping key
    * the index is range-clustered, stats'd and bloom-indexed on), and
    * the full signature, so candidate scoring never revisits the
    * corpus. */
  private def bandIndexRows(docs: DataFrame): DataFrame =
    bandsFrom(sigFrom(shingledOf(docs)))
      .withColumn("bhash", expr(
        s"cast(conv(substring(md5(bkey), 1, 8), 16, 10) as bigint) % $P"))
      .select(col("band"), col("bkey"), col("bhash"), col("doc_id"),
        col("sig"))

  /** Tier 3b — INCREMENTAL cross-run near-dup (r13): dedup the NEW
    * batch against the HISTORICAL corpus without rescanning it — the
    * operator a daily training-data pipeline actually runs.
    *
    * Setup, amortized across runs: the history's band index
    * ([[bandIndexRows]]) is PERSISTED as a [[MergeTable]] partitioned
    * by `band` and range-clustered + stats'd + bloom-indexed on
    * `bhash` (the X113 persisted-index pattern applied to the X3 LSH
    * tier). Probe, the per-batch cost: the new batch's band rows
    * compute the same bhash; the probe-hash RELATION file-skips the
    * index through the relation-valued [[MergeTable.probeKeys]]
    * (partition/stats/bloom admission joined in Spark — no IN-literal
    * ever enters a plan, and no data-scale key set is ever collected
    * to the driver), and the in-bucket (band, bkey) equi-join + signature-
    * agreement scoring runs over admitted files only, with both
    * signatures already in the index rows. Cost: O(new batch +
    * admitted index bytes); the historical DOCUMENTS are never read.
    * At 10^10-doc history the index probe touches ~|probed buckets|
    * file groups, not the corpus — and tomorrow's batch APPENDS its
    * own band rows to the same index (band-partitioned appends, no
    * rewrite), which is what makes the pattern incremental run over
    * run. */
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val hist = docs.filter(col("doc_id") % NewBatchMod =!= 0L)
    val fresh = docs.filter(col("doc_id") % NewBatchMod === 0L)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_q_dincr_idx").toString
    val t = graft.lake.MergeTable(s, idxDir, Some("band"), Seq("bhash"),
      deletionVectors = false, bloomCols = Seq("bhash"))
    t.overwrite(bandIndexRows(hist)
      .repartitionByRange(IncrIndexFiles, col("band"), col("bhash")))
    val probe = eager(bandIndexRows(fresh))
    // RELATION-valued probe (r14): the batch's distinct band hashes
    // never leave the cluster — file admission is computed by joining
    // the key relation against the index's manifest metadata and
    // sparse bloom sidecars, so driver memory stays flat no matter how
    // many distinct band hashes the arriving batch carries.
    val admitted = t.probeKeys("bhash", probe.select("bhash"))
    admitted.alias("h")
      .join(probe.alias("n"),
        col("h.band") === col("n.band") && col("h.bkey") === col("n.bkey"))
      .select(col("h.doc_id").as("doc_hist"), col("n.doc_id").as("doc_new"),
        expr("""size(filter(zip_with(h.sig, n.sig, (p, q) -> p = q),
                            b -> b))""").as("n_eq"))
      .distinct()
      .filter(col("n_eq") * 2 >= NumHashes)
      .select(col("doc_hist"), col("doc_new"),
        expr(s"round(cast(n_eq as double) / $NumHashes, 4)")
          .as("est_jaccard"))
  }

  /** Tier 4 — SimHash: 16-bit per-document fingerprint from token hashes
    * (bit j votes +1/-1 per token, sign → bit), computed by the native
    * codegen'd [[graft.functions.SimHash16]] expression in one traversal
    * (bit-identical to the 16-lambda HOF form it replaced — proven by
    * SimHashFunctionsSpec). Narrow per-row compute; hamming-neighbor
    * lookup at scale is a join on rotated bit-chunks. */
  def docSimhash(s: SparkSession, d: String): DataFrame = {
    graft.functions.SimHashFunctions.register(s)
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("ths", expr(
        "transform(toks, t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"))
      .select(col("doc_id"), expr("simhash16(ths)").as("simhash16"))
  }

  /** Tier 5 — exact n-gram Jaccard verification of the LSH candidate pairs
    * (the verify stage of the canonical candidates→verify near-dup
    * pipeline): join each candidate's distinct shingle set, intersect, and
    * keep true Jaccard ≥ 0.8. The candidate set is tiny (r-way hash
    * agreement), so the heavy shingle arrays are only shuffled for docs
    * that appear in some candidate pair — a 1-permutation min-hash bucket
    * was measured 9× slower here because globally-small-hash shingles put
    * MANY unrelated docs in one bucket. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    // The shingle arrays are deliberately NOT cached: ~0.2 s to recompute
    // from the scan but ~3 s to cache-write + cache-read (wide string
    // arrays serialize badly). Only the TINY candidate-pair relation is
    // cached (it is referenced three times below — the main join plus both
    // semi-join prunes — and Spark has no cross-branch subtree reuse).
    def sh = shingled(s, d)
      .select(col("doc_id"), col("shingles"), expr("size(shingles)").as("n"))
    val cand = eager(candidatesFrom(sigFrom(shingled(s, d))))
    // Shrink the heavy array relation to ONLY docs that appear in some
    // candidate pair before the pair joins — broadcasting the full
    // shingle-array relation was measured at ~6 s of the cold run (the
    // candidate set is tiny; the full corpus' arrays are not). The PRUNED
    // relation (candidate docs only) is small enough that one eager cache
    // beats recomputing the scan + shingle transforms per join side.
    val inCand = eager(sh.join(
      cand.select(col("doc_a").as("doc_id"))
        .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct(),
      Seq("doc_id"), "left_semi"))
    cand
      .join(inCand.as("a"), col("doc_a") === col("a.doc_id"))
      .join(inCand.as("b"), col("doc_b") === col("b.doc_id"))
      .withColumn("inter",
        expr("size(array_intersect(a.shingles, b.shingles))"))
      .select(
        col("doc_a"), col("doc_b"),
        expr("round(cast(inter as double) / (a.n + b.n - inter), 4)")
          .as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  /** Tier 6 — passage-level dedup (the C4/RefinedWeb shape): split each
    * document into fixed 10-token chunks, fingerprint each chunk, and
    * charge every chunk whose fingerprint is owned by an earlier doc as a
    * foreign duplicate. Ownership is `groupBy(fp).agg(min(doc_id))` joined
    * back on fp — NOT a fp-partitioned window: chunk fingerprints are the
    * textbook hot key at web-corpus scale (boilerplate 10-token chunks —
    * cookie banners, license headers — recur millions of times), and a
    * WindowExec partitioned by fp would funnel each hot fp through one
    * reducer with no AQE skew split. The groupBy form is map-side
    * combinable (the hot fp collapses in partial aggregation) and the
    * join-back is AQE-skew-splittable; both relations stay narrow
    * (doc_id, fp) / (fp, owner) throughout. */
  def chunkDedup(s: SparkSession, d: String): DataFrame = {
    val ch = chunked(s, d)
    val owners = ch.groupBy(col("fp")).agg(min(col("doc_id")).as("owner"))
    ch
      .join(owners, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("owner") < col("doc_id"), 1L).otherwise(0L))
          .as("n_foreign"))
      .withColumn("dup_ratio",
        round(col("n_foreign").cast("double") / col("n_chunks"), 4))
  }

  /** Window width (in tokens) for [[substrDedup]] — the ExactSubstr
    * threshold scaled to the fixtures' 10-99-token documents (the paper
    * uses 50 tokens against multi-kilotoken web pages; the INVARIANT
    * under test — any shared run of ≥ k tokens is found at every
    * offset — is width-independent). */
  private val SubstrK = 20

  /** Tier 9 — EXACT SUBSTRING dedup (the ExactSubstr discipline of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better": a span duplicated VERBATIM anywhere else in the corpus is
    * memorization fuel even when the whole documents are dissimilar —
    * MinHash at the document level never sees it). The paper builds one
    * corpus-wide suffix array, which is inherently single-machine; the
    * distributed equivalent is rolling k-token windows at EVERY offset:
    * any shared run of ≥ k tokens contains at least one aligned k-window
    * on each side, so window-fingerprint equality finds exactly the
    * ≥ k-token shared runs (no false negatives; md5 collisions are the
    * only false-positive source, as in the suffix-array variant with
    * hashed comparisons).
    *
    * Emits one row per MAXIMAL duplicated span: consecutive duplicated
    * window offsets merge by the gaps-and-islands rule (offset minus
    * per-doc rank is constant within a run), `span_tokens` counts the
    * union of the run's windows. A window is "duplicated" iff its
    * fingerprint occurs in ≥ 2 DISTINCT documents — tested as
    * `min(doc_id) <> max(doc_id)`, which stays map-side combinable where
    * `countDistinct` would carry a per-fp doc set through the shuffle
    * (boilerplate windows — license headers, cookie banners — are the
    * textbook hot key; their partial aggregates collapse to two longs).
    *
    * Scale shape: the window relation is O(total tokens) rows but three
    * narrow columns (doc_id, pos, fp); dup detection is one partial-agg
    * shuffle on fp; marking is one semi-join on fp (AQE-skew-splittable);
    * the island merge is a window function partitioned by doc_id — per
    * partition bounded by ONE document's length at any corpus size. */
  def substrDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = SubstrK
    val win = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(1, size(toks) - ${k - 1}),
                i -> md5(concat_ws(' ', slice(toks, i, $k))))"""))
          .as(Seq("off", "fp")))
      .select(col("doc_id"), (col("off") + 1).cast("long").as("pos"),
        col("fp"))
    val dupFp = win.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select(col("fp"))
    val islands = win.join(dupFp, Seq("fp"), "left_semi")
      .select(col("doc_id"), col("pos"))
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    islands
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + k).as("span_tokens"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_tokens"),
        col("n_windows"))
  }

  /** Tier 9b — EXACT SUBSTRING dedup APPLIED (the transformation the
    * ExactSubstr paper actually ships): excise every duplicated
    * k-token window from every document EXCEPT the span's earliest
    * carrier (min doc_id per fingerprint keeps its copy), then
    * reassemble each document from its surviving tokens. One row per
    * document: original token count, tokens removed, and the md5 of
    * the cleaned text (the narrow proof of the reassembly — carrying
    * megabytes of cleaned text through the gate would test IO, not
    * the operator).
    *
    * Scale shape: same O(total tokens) narrow relations as
    * [[substrDedup]] plus one covered-position explode (≤ k rows per
    * removed window, distinct-folded) and one anti-join of token
    * positions against it; the reassembly is a per-doc sort inside one
    * aggregate — bounded by a single document's length at any corpus
    * size. */
  def substrClean(s: SparkSession, d: String): DataFrame = {
    val k = SubstrK
    val toks = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val win = toks
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(1, size(toks) - ${k - 1}),
                i -> md5(concat_ws(' ', slice(toks, i, $k))))"""))
          .as(Seq("off", "fp")))
      .select(col("doc_id"), (col("off") + 1).cast("long").as("pos"),
        col("fp"))
    // the span's earliest carrier keeps its copy; every other carrier's
    // windows are excised (the paper's keep-one discipline)
    val owners = win.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("owner"), max(col("doc_id")).as("hi"))
      .filter(col("owner") =!= col("hi"))
      .select(col("fp"), col("owner"))
    val removed = win.join(owners, Seq("fp"))
      .filter(col("doc_id") > col("owner"))
      .select(col("doc_id"), col("pos"))
    val covered = removed
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${k - 1})")).as("tp"))
      .distinct()
    val tokPos = toks.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("tp0", "tok")))
      .select(col("doc_id"), (col("tp0") + 1).cast("long").as("tp"),
        col("tok"))
    val kept = tokPos.join(covered, Seq("doc_id", "tp"), "left_anti")
    val cleaned = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(tp, tok))), x -> x.tok)")))
          .as("clean_fp"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("clean_fp"), md5(lit(""))).as("clean_fp"))
  }

  /** (doc_id, fp) for every fixed 10-token chunk — the narrow chunk
    * relation shared by [[chunkDedup]] and [[decontaminate]]. */
  private def chunked(s: SparkSession, d: String): DataFrame =
    chunkedOf(documents(s, d))

  /** [[chunked]] over an arbitrary (doc_id, text) frame — so the chunk
    * machinery composes into pipelines whose corpus is not the raw
    * fixture (e.g. [[DocPipeline.curatedPacks]] decontaminating the
    * CLEANED corpus). */
  private[ext] def chunkedOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, cast(ceil(size(toks) / 10.0) as int) - 1),
             i -> concat_ws(' ', slice(toks, i * 10 + 1, 10)))"""))
        .as("chunk"))
      .withColumn("fp", md5(col("chunk")))
      .select("doc_id", "fp")

  /** The deterministic 5 % eval-holdout rule (doc_id-hash; the
    * [[TextQueries.docSample]] discipline) — one SQL expression shared
    * by [[decontaminate]] and [[evalExcluded]]. */
  private[ext] val IsEvalSql =
    """cast(conv(substring(md5(concat(cast(doc_id as string), ':eval')),
       1, 8), 16, 10) as bigint) % 100 < 5"""

  /** Everything a TRAINING corpus must exclude under the eval-holdout
    * discipline: the eval documents themselves PLUS every train
    * document sharing a 10-token chunk fingerprint with any eval
    * document ([[decontaminate]]'s flag, reduced to ids). One chunk
    * relation feeds both sides (eager-cached), the hit test is one
    * fp semi-join. Returns distinct `doc_id`s. */
  def evalExcluded(docs: DataFrame): DataFrame = {
    val ch = eager(chunkedOf(docs.select(col("doc_id"), col("text")))
      .withColumn("is_eval", expr(IsEvalSql)))
    val evalFps = ch.filter(col("is_eval")).select(col("fp")).distinct()
    val contaminated = ch.filter(!col("is_eval"))
      .join(evalFps, Seq("fp"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.filter(expr(IsEvalSql)).select(col("doc_id"))
      .unionByName(contaminated).distinct()
  }

  /** Tier 7 — train/eval DECONTAMINATION (the n-gram-overlap check run
    * before any benchmark number is trusted): a deterministic 5 %
    * hash-holdout of documents is the "eval set"; every training document
    * sharing at least one 10-token chunk fingerprint with any eval
    * document is flagged with its contamination ratio. Plan shape: the
    * narrow chunk relation is computed ONCE (eager-cached; it feeds both
    * join sides — at 100 TB it is a persisted intermediate table) and
    * split by the hash rule, eval fingerprints are deduped, and the
    * flagging is ONE equi-join on fp + one doc_id aggregate — the eval
    * side is the small join side (AQE broadcasts it when it fits). Membership
    * uses the [[TextQueries.docSample]] hash rule, so the holdout is
    * stable across engines, retries, and partitionings. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    // eager-cache the narrow chunk relation: it feeds BOTH join sides
    // (eval fingerprints + train chunks), and without the cache Spark
    // recomputes the full text scan + chunk explosion + md5 per subtree
    val ch = eager(chunked(s, d).withColumn("is_eval", expr(IsEvalSql)))
    val evalFps = ch.filter(col("is_eval"))
      .select(col("fp")).distinct().withColumn("hit", lit(1L))
    ch.filter(!col("is_eval"))
      .join(evalFps, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .filter(col("n_hits") > 0)
      .withColumn("contamination",
        round(col("n_hits").cast("double") / col("n_chunks"), 4))
  }

  /** Convergence bound for [[dedupClusters]] — label propagation needs at
    * most graph-diameter rounds; real near-dup graphs are shallow (most
    * clusters are cliques from one LSH bucket), so 50 is far beyond any
    * plausible diameter and overrunning it is a bug, not a workload. */
  private val MaxCcRounds = 50
  /** CC loop sizing: one partition per this many pair-graph edges. */
  private val CcEdgesPerPartition = 50000L

  /** Tier 8 — near-dup CLUSTERING: connected components over the LSH
    * near-dup pairs (the decision step of corpus dedup: pairs → clusters →
    * one canonical survivor per cluster, the MinHash-LSH + union-find
    * shape of C4/RefinedWeb-style pipelines; greedy per-pair dropping —
    * [[DocPipeline]] — over-deletes on transitive chains, clustering
    * doesn't). Implementation is iterative min-label propagation to a
    * FIXPOINT: each round joins labels to the bidirectional edge list and
    * takes the per-node min; rounds ≤ graph diameter.
    *
    * Scale shape: every round is ONE shuffle join over the PAIR GRAPH —
    * which is LSH output, orders of magnitude smaller than the corpus —
    * never over the corpus itself; the driver sees only the convergence
    * count per round. This is the battle-tested big-data CC shape
    * (label propagation, as in GraphX's connectedComponents, without the
    * RDD API); the round count is O(diameter), bounded by [[MaxCcRounds]]
    * and verified converged before returning. */
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    connectedComponents(docNeardup(s, d), "doc_a", "doc_b", "doc_id")

  /** The general connected-components operator behind [[dedupClusters]]
    * (and the vector-space [[SimilarityQueries.embedClusters]]) —
    * library API: min-label propagation over any (aCol, bCol) edge
    * frame, returning one row per node: `nodeCol`, `cluster_id`,
    * `cluster_size`, `is_canonical`. Scale/convergence notes on
    * [[dedupClusters]] apply: each round is one shuffle join over the
    * PAIR GRAPH, never the corpus. */
  def connectedComponents(pairsIn: DataFrame, aCol: String, bCol: String,
      nodeCol: String): DataFrame = {
    // localCheckpoint truncates the input lineage before iterating —
    // without it every round's action re-optimizes the whole upstream
    // plan (measured ~1 s of pure Catalyst work per round); the
    // iterative-algorithm idiom MLlib and GraphFrames use.
    val pairs0 = pairsIn.select(col(aCol).as("doc_a"), col(bCol).as("doc_b"))
      .truncated
    // Adaptive loop parallelism: the checkpoint above already counted the
    // pair graph, so size the iterative joins to IT, not to the corpus —
    // one partition per ~50k edges, floored at 1 (tiny graphs skip
    // per-round shuffle scheduling entirely) and capped at the session's
    // default parallelism (huge graphs use every core, never more).
    val nParts = math.max(1L, math.min(pairs0.count() / CcEdgesPerPartition,
      pairsIn.sparkSession.sparkContext.defaultParallelism.toLong)).toInt
    val pairs =
      if (nParts < pairs0.rdd.getNumPartitions) pairs0.coalesce(nParts)
      else pairs0
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = eager(edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")))
    // Convergence signal: per-node labels only ever DECREASE (min-label
    // propagation), so the overflow-safe total label sum is strictly
    // decreasing until the fixpoint — equal sums ⟺ no node changed. One
    // tiny aggregate per round (which also materializes the cached
    // `prop`), replacing the former prop⋈labels diff join whose plan was
    // the dominant per-round fixed cost on small pair graphs.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var changed = true
    var rounds = 0
    while (changed && rounds < MaxCcRounds) {
      // localCheckpoint (not cache) each round: caching materializes the
      // DATA but the logical plan still nests every prior round — at
      // graph diameters beyond ~15 the 2^rounds-node plan OOMs the
      // driver in plan stringification alone (caught by the union-find
      // property spec on a chain-heavy graph). Checkpointing truncates
      // the plan to a constant-size LogicalRDD, so rounds stay O(1) in
      // driver memory — high-diameter graphs are then bounded by
      // MaxCcRounds, not by plan explosion.
      val prop =
        edges.join(labels, edges("src") === labels("doc_id"))
          .select(col("dst").as("doc_id"), col("cluster_id"))
          .unionByName(labels.select(col("doc_id"), col("cluster_id")))
          .groupBy(col("doc_id"))
          .agg(min(col("cluster_id")).as("cluster_id"))
          .truncated
      val s = labelSum(prop)
      changed = s.compareTo(prevSum) != 0
      prevSum = s
      labels.unpersist()
      releaseCheckpointed(labels)
      labels = prop
      rounds += 1
    }
    require(!changed,
      s"connected components did not converge in $MaxCcRounds rounds")
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    // Materialize the (small — one row per pair-graph node) output, then
    // release the iteration's pinned state: the last round's cached
    // labels and the localCheckpointed pair graph. Without this, library
    // callers composing the operator with other queries in one session
    // ratchet executor memory (Bench clears cache between queries; they
    // don't). The returned frame is self-contained — callers done with
    // it can release it via [[releaseCheckpointed]].
    val out = labels.join(sizes, Seq("cluster_id"))
      .select(col("doc_id").as(nodeCol), col("cluster_id"),
        col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .truncated
    labels.unpersist()
    releaseCheckpointed(labels)
    releaseCheckpointed(pairs0)
    out
  }

  /** Back-compat alias for [[graft.Checkpoints.release]] (the release
    * discipline moved there with the [[graft.Checkpoints.truncate]]
    * durability knob). */
  private[graft] def releaseCheckpointed(df: DataFrame): Unit =
    graft.Checkpoints.release(df)

  // ---- oracle SQL (generated from the same constants) ----

  /** DuckDB oracle for [[dedupClusters]]: the same LSH pair chain
    * ([[candCte]] + the est-Jaccard cut), then transitive closure via a
    * recursive CTE and min-reachable-id labels. `WITH` is rewritten to
    * `WITH RECURSIVE` because the recursive member must share the one
    * with-list with the generated chain. */
  def dedupClustersOracle: String =
    s"""${candCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        scored AS (SELECT doc_a, doc_b,
                     len(list_filter(range(1, ${NumHashes + 1}),
                         i -> a.sig[i] = b.sig[i])) AS n_eq
                   FROM cand
                   JOIN sig a ON doc_a = a.doc_id
                   JOIN sig b ON doc_b = b.doc_id),
        nd AS (SELECT doc_a, doc_b FROM scored
               WHERE n_eq * 2 >= $NumHashes),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM nd
                  UNION SELECT doc_b, doc_a FROM nd),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lab AS (SELECT a AS doc_id, least(min(b), a) AS cluster_id
                FROM reach GROUP BY a)
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               doc_id = cluster_id AS is_canonical
        FROM lab ORDER BY doc_id"""

  /** DuckDB oracle for [[decontaminate]] — same chunking as
    * [[chunkDedupOracle]], same hash-holdout rule as the Spark side. */
  val decontaminateOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
       c AS (SELECT doc_id,
               unnest(list_transform(
                 range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
                 i -> md5(array_to_string(
                        toks[(i * 10 + 1):(i * 10 + 10)], ' ')))) AS fp
             FROM t),
       e AS (SELECT doc_id,
               ('0x' || substr(md5(doc_id || ':eval'), 1, 8))::BIGINT % 100
                 < 5 AS is_eval
             FROM documents),
       ce AS (SELECT c.doc_id, fp, is_eval
              FROM c JOIN e ON c.doc_id = e.doc_id),
       efp AS (SELECT DISTINCT fp FROM ce WHERE is_eval)
       SELECT doc_id, count(*) AS n_chunks,
              CAST(sum(CASE WHEN fp IN (SELECT fp FROM efp)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
              round(CAST(sum(CASE WHEN fp IN (SELECT fp FROM efp)
                                  THEN 1 ELSE 0 END) AS DOUBLE)
                    / count(*), 4) AS contamination
       FROM ce WHERE NOT is_eval
       GROUP BY doc_id
       HAVING sum(CASE WHEN fp IN (SELECT fp FROM efp)
                       THEN 1 ELSE 0 END) > 0
       ORDER BY doc_id"""

  /** DuckDB oracle for [[chunkDedup]]. sum() is CAST to BIGINT — DuckDB
    * sums integers into HUGEINT, which hash-mismatches Spark's LongType. */
  val chunkDedupOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
       c AS (SELECT doc_id,
               unnest(list_transform(
                 range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
                 i -> md5(array_to_string(
                        toks[(i * 10 + 1):(i * 10 + 10)], ' ')))) AS fp
             FROM t),
       o AS (SELECT fp, min(doc_id) AS owner FROM c GROUP BY fp)
       SELECT doc_id, count(*) AS n_chunks,
              CAST(sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END) AS BIGINT)
                AS n_foreign,
              round(CAST(sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*), 4) AS dup_ratio
       FROM c JOIN o USING (fp)
       GROUP BY doc_id ORDER BY doc_id"""

  /** DuckDB oracle for [[substrDedup]] — same k-token rolling windows
    * (1-based offsets, DuckDB list slices are 1-based inclusive like
    * Spark's `slice`), same `min <> max` cross-doc rule, same
    * gaps-and-islands merge. `generate_series` yields BIGINT so `pos`
    * matches the Spark side's explicit long cast. */
  val substrDedupOracle: String = {
    val k = SubstrK
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
       w AS (SELECT doc_id, i AS pos,
               md5(array_to_string(toks[i:i + ${k - 1}], ' ')) AS fp
             FROM t, UNNEST(generate_series(1, len(toks) - ${k - 1}))
                     AS u(i)
             WHERE len(toks) >= $k),
       d AS (SELECT fp FROM w GROUP BY fp
             HAVING min(doc_id) <> max(doc_id)),
       m AS (SELECT doc_id, pos FROM w JOIN d USING (fp)),
       isl AS (SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS grp
               FROM m)
       SELECT doc_id, min(pos) AS span_start,
              max(pos) - min(pos) + $k AS span_tokens,
              count(*) AS n_windows
       FROM isl GROUP BY doc_id, grp
       ORDER BY doc_id, span_start"""
  }

  /** DuckDB oracle for [[substrClean]] — identical windows, owner
    * rule, covered-position union, anti-join, and ordered reassembly
    * (`string_agg(tok, ' ' ORDER BY tp)` ≡ the sorted-collect
    * concat). */
  val substrCleanOracle: String = {
    val k = SubstrK
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
       w AS (SELECT doc_id, i AS pos,
               md5(array_to_string(toks[i:i + ${k - 1}], ' ')) AS fp
             FROM t, UNNEST(generate_series(1, len(toks) - ${k - 1}))
                     AS u(i)
             WHERE len(toks) >= $k),
       o AS (SELECT fp, min(doc_id) AS owner FROM w GROUP BY fp
             HAVING min(doc_id) <> max(doc_id)),
       rem AS (SELECT w.doc_id, w.pos FROM w JOIN o USING (fp)
               WHERE w.doc_id > o.owner),
       cov AS (SELECT DISTINCT doc_id, u.tp
               FROM rem, UNNEST(generate_series(pos, pos + ${k - 1}))
                         AS u(tp)),
       tp AS (SELECT doc_id, i AS tp, toks[i] AS tok
              FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)),
       kept AS (SELECT tp.* FROM tp ANTI JOIN cov USING (doc_id, tp)),
       cl AS (SELECT doc_id, count(*) AS n_kept,
                md5(string_agg(tok, ' ' ORDER BY tp)) AS clean_fp
              FROM kept GROUP BY doc_id)
       SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
              CAST(len(toks) - coalesce(n_kept, 0) AS BIGINT)
                AS n_removed,
              coalesce(clean_fp, md5('')) AS clean_fp
       FROM t LEFT JOIN cl ON t.doc_id = cl.doc_id
       ORDER BY t.doc_id"""
  }

  private val shingledCte =
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                   FROM documents),
        sh AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [text] END) AS shingles
               FROM t),
        hs AS (SELECT doc_id, shingles,
                 list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % $P) AS hs
               FROM sh)"""

  /** Shared CTE chain for the LSH pipeline: shingles → signatures → band
    * keys → candidate pairs, generated from [[AB]] so the hash family can
    * never drift between engines. Exposed to [[DocPipeline]] so the
    * composed pipeline oracle reuses the exact same chain (`t` carries
    * doc_id/text/toks for the quality CTEs). */
  private[ext] def candCte: String = {
    val sigList = AB.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))"
    }.mkString("[", ",\n                   ", "]")
    // band j as (j, key-string); union the four band projections
    val bandsSql = (0 until Bands).map { j =>
      val parts = (0 until Rows).map(r => s"sig[${j * Rows + r + 1}]")
      s"SELECT doc_id, $j AS band, ${parts.mkString(" || '_' || ")} AS bkey FROM sig"
    }.mkString("\n               UNION ALL ")
    s"""$shingledCte,
        sig AS (SELECT doc_id,
                  $sigList AS sig
                FROM hs),
        bands AS ($bandsSql),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bands x JOIN bands y
                   ON x.band = y.band AND x.bkey = y.bkey
                  AND x.doc_id < y.doc_id)"""
  }

  /** DuckDB oracle for [[docNeardup]]. */
  def neardupOracle: String =
    s"""$candCte,
        scored AS (SELECT doc_a, doc_b,
                     len(list_filter(range(1, ${NumHashes + 1}),
                         i -> a.sig[i] = b.sig[i])) AS n_eq
                   FROM cand
                   JOIN sig a ON doc_a = a.doc_id
                   JOIN sig b ON doc_b = b.doc_id)
        SELECT doc_a, doc_b,
               round(CAST(n_eq AS DOUBLE) / $NumHashes, 4) AS est_jaccard
        FROM scored WHERE n_eq * 2 >= $NumHashes
        ORDER BY doc_a, doc_b"""

  /** DuckDB oracle for [[dedupIncremental]]: the same LSH chain over
    * the full corpus, candidates restricted to history × new-batch by
    * the shared modulo split. (The persisted index and its file
    * skipping are the IMPLEMENTATION under test — pruning admits a
    * superset of files and the bucket equi-join is the exact residual,
    * so the result must equal this direct replay bit-for-bit.) */
  def dedupIncrementalOracle: String = {
    val sigList = AB.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))"
    }.mkString("[", ",\n                   ", "]")
    val bandsSql = (0 until Bands).map { j =>
      val parts = (0 until Rows).map(r => s"sig[${j * Rows + r + 1}]")
      s"SELECT doc_id, $j AS band, ${parts.mkString(" || '_' || ")} AS bkey FROM sig"
    }.mkString("\n               UNION ALL ")
    s"""$shingledCte,
        sig AS (SELECT doc_id, $sigList AS sig FROM hs),
        bands AS ($bandsSql),
        cand AS (SELECT DISTINCT h.doc_id AS doc_hist, n.doc_id AS doc_new
                 FROM bands h JOIN bands n
                   ON h.band = n.band AND h.bkey = n.bkey
                 WHERE h.doc_id % $NewBatchMod <> 0
                   AND n.doc_id % $NewBatchMod = 0),
        scored AS (SELECT doc_hist, doc_new,
                     len(list_filter(range(1, ${NumHashes + 1}),
                         i -> a.sig[i] = b.sig[i])) AS n_eq
                   FROM cand
                   JOIN sig a ON doc_hist = a.doc_id
                   JOIN sig b ON doc_new = b.doc_id)
        SELECT doc_hist, doc_new,
               round(CAST(n_eq AS DOUBLE) / $NumHashes, 4) AS est_jaccard
        FROM scored WHERE n_eq * 2 >= $NumHashes
        ORDER BY doc_hist, doc_new"""
  }

  def simhashOracle: String = {
    val bits = 16
    val votes = (0 until bits).map { j =>
      s"list_sum(list_transform(ths, h -> 2 * ((h >> $j) & 1) - 1)) AS v_$j"
    }.mkString(",\n                 ")
    val simhash = (0 until bits)
      .map(j => s"CASE WHEN v_$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        th AS (SELECT doc_id,
                 list_transform(toks,
                   t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS ths
               FROM t),
        v AS (SELECT doc_id,
                 $votes
              FROM th)
        SELECT doc_id, $simhash AS simhash16
        FROM v ORDER BY doc_id"""
  }

  def ngramJaccardOracle: String =
    s"""$candCte,
        pairs AS (SELECT doc_a, doc_b,
                    len(list_intersect(a.shingles, b.shingles)) AS inter,
                    len(a.shingles) AS na, len(b.shingles) AS nb
                  FROM cand
                  JOIN hs a ON doc_a = a.doc_id
                  JOIN hs b ON doc_b = b.doc_id)
        SELECT doc_a, doc_b,
               round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
        FROM pairs
        WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) >= 0.8
        ORDER BY doc_a, doc_b"""

  // ---- tier 9: EXACT similarity join via prefix filtering -----------------

  /** Jaccard threshold for [[docSimjoin]], as an exact rational so every
    * filter below is integer arithmetic (shared with the oracle). 4/5
    * matches [[ngramJaccard]]'s 0.8 cut, so the exact join doubles as a
    * recall audit of the LSH tier: any pair here but not there is an
    * LSH miss. */
  private[ext] val SimTauNum = 4L
  private[ext] val SimTauDen = 5L

  /** Tier 9 — EXACT set-similarity join (the prefix-filtering / PPJoin
    * family) over each document's distinct 3-word shingle set: ALL pairs
    * with shingle-set Jaccard ≥ [[SimTauNum]]/[[SimTauDen]], with a
    * zero-miss guarantee — the complement to the LSH tiers (3/5), which
    * trade recall for speed. Corpus-dedup pipelines run LSH for the bulk
    * tier and an exact join like this one where a miss is unacceptable
    * (license/compliance dedup, eval-set leakage audits); at the shared
    * 0.8 threshold, `q_doc_simjoin − q_ngram_jaccard` measures the LSH
    * tier's true misses.
    *
    * The all-pairs trap is avoided by the PREFIX FILTER theorem: order
    * every token by global rarity (doc-frequency, then token — a total
    * order shared with the oracle); if |A∩B| ≥ α then the first
    * |A|−α+1 tokens of A and of B (in that order) must share a token.
    * With α = ceil(τ·|s|) (valid since J ≥ τ ⇒ |A∩B| ≥ τ·max sizes),
    * each doc only emits its floor(|s|/2)+1 RAREST tokens as join keys
    * — candidate generation is an equi-join on rare tokens, whose
    * buckets are small BY CONSTRUCTION (a stopword lands in a prefix
    * only for docs of near-stopword-only content). Candidates are then
    * verified with exact integer counting: J ≥ num/den ⟺
    * den·inter ≥ num·(na+nb−inter) — no float compare anywhere.
    *
    * Scale shape: one explode (token relation), one vocab-scale
    * doc-frequency aggregate, one per-doc window (doc-sized
    * partitions), one prefix-token equi-join + length filter, then the
    * [[ngramJaccard]]-style semi-join-pruned verify. Every key is
    * doc_id or a rare token; the verify volume tracks the TRUE match
    * rate. At 100 TB the df relation is a persisted table and hot
    * residual tokens are AQE-skew territory. */
  def docSimjoin(s: SparkSession, d: String): DataFrame =
    setSimJoinOf(
      shingled(s, d).select(col("doc_id"), col("shingles").as("toks")),
      SimTauNum, SimTauDen)

  /** The general exact similarity join behind [[docSimjoin]] — library
    * API: frame of (`doc_id`, `toks` array) in, all pairs with
    * Jaccard(toks_a, toks_b) ≥ tauNum/tauDen out as (doc_a, doc_b,
    * n_inter, n_union, jaccard), doc_a < doc_b. Guaranteed lossless:
    * the prefix filter only PRUNES pairs that provably cannot reach
    * the threshold. */
  def setSimJoinOf(sets: DataFrame, tauNum: Long, tauDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = sets.select(col("doc_id"), col("toks"),
      size(col("toks")).cast("long").as("n"))
    // df = per-token document frequency as a map-side-combinable
    // groupBy(token).count() joined back on token. NOT a count window
    // partitioned by token: token frequency is Zipfian, and at corpus
    // scale the "the" partition is near-corpus-sized — WindowExec holds
    // a hot partition on ONE reducer and AQE cannot skew-split a
    // window. Partial aggregation absorbs that skew before the shuffle,
    // and the join back IS AQE-skew-splittable. The exploded token
    // relation is eager'd once so the df aggregate and the join probe
    // share one materialization of the explode chain.
    val tok = eager(base.select(col("doc_id"), col("n"),
      explode(col("toks")).as("token")))
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // Prefix length L = n − ceil(τ·n) + 1, all integer. The rank window
    // partitions by doc_id (doc-sized partitions, never a global sort).
    // The prefix relation is NARROW (token, doc_id, n — ~L rows/doc) and
    // feeds BOTH sides of the candidate self-join — cached so neither
    // side recomputes the chain.
    val prefix = eager(tok
      .join(dfreq, Seq("token"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("token"))))
      .filter(col("rk") <=
        col("n") - expr(s"(n * $tauNum + $tauDen - 1) div $tauDen") + 1)
      .select(col("token"), col("doc_id"), col("n"), col("rk")))
    // Candidates: prefix-token equi-join + two lossless cuts — the size
    // filter (J ≥ τ forces min·den ≥ max·num) and PPJoin's POSITIONAL
    // filter: a pair matched at prefix ranks (rk_a, rk_b) can overlap at
    // most 1 + min(n_a−rk_a, n_b−rk_b) tokens (everything common sits at
    // or after the matched rank in BOTH prefix orders), and J ≥ τ needs
    // overlap ≥ num·(n_a+n_b)/(den+num); a true pair always survives via
    // its FIRST common prefix token (measured at sf0.1: candidate pairs
    // 43.5k → 12.8k, a 3.4× cut before any array is touched). distinct
    // since two prefixes can share tokens.
    val cand = eager(prefix.as("x")
      .join(prefix.as("y"),
        col("x.token") === col("y.token") &&
        col("x.doc_id") < col("y.doc_id") &&
        least(col("x.n"), col("y.n")) * tauDen >=
          greatest(col("x.n"), col("y.n")) * tauNum &&
        (lit(1) + least(col("x.n") - col("x.rk"),
                        col("y.n") - col("y.rk"))) * (tauDen + tauNum) >=
          (col("x.n") + col("y.n")) * tauNum)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct())
    // Verify stage — the ngramJaccard discipline: shrink the heavy array
    // relation to candidate docs only, then join both sides and count.
    // The candidate docs' token ARRAYS are rebuilt from the CACHED token
    // relation (collect_list over candidate docs only) instead of from
    // `base`, whose tokenize/shingle chain is NOT cached and re-ran
    // whole here (r16: the second-largest job of the query). Tokens are
    // distinct per doc upstream, so array_intersect/size are
    // order-insensitive and the rebuilt arrays verify identically.
    val inCand = eager(tok.join(
      cand.select(col("doc_a").as("doc_id"))
        .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct(),
      Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(first(col("n")).as("n"), collect_list(col("token")).as("toks")))
    cand
      .join(inCand.as("a"), col("doc_a") === col("a.doc_id"))
      .join(inCand.as("b"), col("doc_b") === col("b.doc_id"))
      .withColumn("n_inter",
        expr("cast(size(array_intersect(a.toks, b.toks)) as bigint)"))
      .withColumn("n_union", col("a.n") + col("b.n") - col("n_inter"))
      .filter(col("n_inter") * tauDen >= col("n_union") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        round(col("n_inter").cast("double") / col("n_union"), 4)
          .as("jaccard"))
  }

  /** DuckDB oracle for [[docSimjoin]] — brute-force shingle self-join
    * over ALL pairs (no prefix filter: the filter is provably lossless,
    * so the exhaustive replay and the pruned plan agree exactly — that
    * equality IS what this oracle checks). Reuses [[shingledCte]]'s `sh`
    * so shingle construction can never drift between engines. */
  def docSimjoinOracle: String =
    s"""$shingledCte,
        n AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n FROM sh),
        tok AS (SELECT doc_id, unnest(shingles) AS token FROM sh),
        i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(count(*) AS BIGINT) AS n_inter
              FROM tok a JOIN tok b
                ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
        j AS (SELECT doc_a, doc_b, n_inter,
                     na.n + nb.n - n_inter AS n_union
              FROM i JOIN n na ON doc_a = na.doc_id
                     JOIN n nb ON doc_b = nb.doc_id)
        SELECT doc_a, doc_b, n_inter, CAST(n_union AS BIGINT) AS n_union,
               round(CAST(n_inter AS DOUBLE) / n_union, 4) AS jaccard
        FROM j
        WHERE n_inter * $SimTauDen >= n_union * $SimTauNum
        ORDER BY doc_a, doc_b"""
}
