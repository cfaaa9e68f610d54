package graft.ext

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` corpus
  * (`Array[Float]`, 64-dim) — SURVEY.md §7.5(b), BASELINE.json north star.
  *
  * Two tiers:
  *   - [[embedTopk]]: brute-force cosine top-k — the exactness baseline.
  *     The QUERY set is broadcast; the corpus streams through a narrow
  *     map + per-query top-k window. At 100 TB the corpus side never
  *     shuffles and never materializes on the driver.
  *   - [[embedIvf]]: IVF-style two-stage search — assign every vector to
  *     its nearest of C deterministic seed centroids (broadcast join +
  *     argmax), then search only within the query's cell (equi-join on
  *     cell id). This is the scale path: per-query work drops from O(N)
  *     to O(N/C), and the cell join partitions cleanly.
  *
  * Numeric determinism: all dot products are computed in double with a
  * sequential left fold (`aggregate(zip_with(...))`), similarities are
  * rounded to 6 decimals BEFORE ranking, and ties break on neighbor id —
  * so ranks are reproducible across engines and partitionings.
  */
object SimilarityQueries {

  /** Sequential-fold double dot product of two float-array columns — the
    * native codegen'd [[graft.functions.DotProductF]] expression
    * (bit-identical to the `aggregate(zip_with(...))` fold it replaced,
    * without per-element interpreted-lambda overhead). */
  private[ext] def dot(a: String, b: String): String = s"dot_f($a, $b)"

  /** `frame` (any (… , embedding) relation) with precomputed L2 norms
    * attached (one narrow pass). */
  private[ext] def normedOf(s: SparkSession, frame: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    frame.withColumn("nrm", expr(s"sqrt(${dot("embedding", "embedding")})"))
  }

  /** Corpus with precomputed L2 norms (one narrow pass). */
  private def normed(s: SparkSession, d: String): DataFrame =
    normedOf(s, embeddings(s, d))

  /** Brute-force cosine top-5 for query vectors vec_id < 10. */
  def embedTopk(s: SparkSession, d: String): DataFrame =
    bruteTopkFor(s, d, loId = 0, hiId = 10, k = 5)

  /** Exact cosine top-`k` for query vectors `loId ≤ vec_id < hiId` — the
    * ground-truth engine behind [[embedTopk]] and the recall measurement
    * of [[graft.tools.IvfRecall]]. */
  private[graft] def bruteTopkFor(s: SparkSession, d: String,
      loId: Long, hiId: Long, k: Int): DataFrame = {
    val e = normed(s, d)
    val q = e.filter(col("vec_id") >= loId && col("vec_id") < hiId)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("nrm").as("qnrm"))
    val sims = e
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"),
        col("nrm").as("cnrm"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        expr(s"round(${dot("qvec", "cvec")} / (qnrm * cnrm), 6)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** IVF two-stage: [[ivfCells]] seed centroids (√(N/8), min 8 — cells
    * GROW with the corpus so per-query in-cell work keeps shrinking;
    * seeds = lowest vec_ids, deterministic, the fixture ids are
    * cluster-shuffled), assign all vectors by max cosine (tie → lowest
    * centroid id), then top-3 in-cell neighbors for query vectors
    * 8 ≤ vec_id < 28. */
  def embedIvf(s: SparkSession, d: String): DataFrame =
    embedIvfRounds(s, d, LloydRounds)

  /** Per-cell vector counts at a given Lloyd round count — the balance
    * diagnostic for [[graft.tools.IvfRecall]] (max cell size bounds the
    * worst-case in-cell search cost). */
  private[graft] def cellSizes(s: SparkSession, d: String,
      rounds: Int): DataFrame =
    assignedCells(s, d, rounds).groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))

  /** [[embedIvf]] with an explicit Lloyd round count (0 = raw id-order
    * seeds) and query-id window — the recall diagnostic knobs for
    * [[graft.tools.IvfRecall]] (the oracle query fixes 8..28; recall is
    * measured over a wider window for statistical weight). */
  private[graft] def embedIvfRounds(s: SparkSession, d: String,
      rounds: Int, qLo: Long = 8, qHi: Long = 28,
      nprobe: Int = 1): DataFrame = {
    val e =
      if (rounds == 0) normed(s, d) else DedupQueries.eager(normed(s, d))
    val cent = trainedCentroids(e, embeddings(s, d).count(), rounds)
    val cells = DedupQueries.eager(assignTo(e, cent))
    // nprobe=1: the query's own corpus cell (assignTo's argmax) — the
    // oracle form. nprobe>1: the query side expands to its top-nprobe
    // centroid cells (assignTopN), the standard IVF recall knob.
    val qAsg =
      if (nprobe <= 1)
        cells.filter(col("vec_id") >= qLo && col("vec_id") < qHi)
      else
        assignTopN(e.filter(col("vec_id") >= qLo && col("vec_id") < qHi),
          cent, nprobe)
    val q = qAsg
      .select(col("vec_id").as("query_id"), col("cell"),
        col("embedding").as("qvec"), col("nrm").as("qnrm"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cells
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("embedding").as("cvec"), col("nrm").as("cnrm"))
      .join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        expr(s"round(${dot("qvec", "cvec")} / (qnrm * cnrm), 6)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("cell"), col("neighbor_id"), col("sim"),
        col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs — the 5th dedup tier (vector
    * space instead of token space). Candidates = pairs sharing a
    * hyperplane-LSH bucket in either of 2 independent bands whose WIDTH
    * GROWS WITH THE CORPUS ([[bandBits]]: target ~8 vectors/bucket, so
    * bucket count ∝ N and the expected candidate-pair count is O(N), not
    * O(N²/constant) — the round-3 fixed-8-cell all-pairs stage was
    * quadratic). Verify = exact cosine ≥ 0.4 (the fixtures plant no true
    * high-cosine dups — 0.4 keeps the verify stage demonstrably
    * exercised); a pair surviving in both bands is deduplicated by the
    * final group-by (cos is identical on both copies). */
  def embedNeardup(s: SparkSession, d: String): DataFrame =
    neardupScored(s, d)
      .filter(col("cos") >= 0.4)
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(min(col("cos")).as("cos"))

  /** Vector-space near-dup CLUSTERING: connected components over the
    * [[embedNeardup]] pair graph — the same decision step
    * [[DedupQueries.dedupClusters]] runs for token-space dups (pairs →
    * clusters → one canonical survivor), here over embedding-cosine
    * edges. Composes the shared
    * [[DedupQueries.connectedComponents]] loop; scale shape identical
    * (rounds over the PAIR graph only, never the corpus). */
  def embedClusters(s: SparkSession, d: String): DataFrame =
    DedupQueries.connectedComponents(
      embedNeardup(s, d), "vec_a", "vec_b", "vec_id")

  /** Cosine threshold above which two same-cell vectors are SEMANTIC
    * duplicates for [[embedSemdedup]]. The same 0.4 the banded
    * near-dup tier cuts at ([[embedNeardup]]) — the fixture corpus'
    * near-dup planting threshold. Shared verbatim with the oracle SQL;
    * comparisons happen on round-6 cosines, so the cut is
    * engine-independent. */
  private[ext] val SemTau = 0.4

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication via k-means cells — the embedding-space analogue of
    * the corpus-curation attrition steps, and the third dedup DECISION
    * procedure next to pair-graph CC ([[embedClusters]]) and
    * first-wins key dedup. The corpus is clustered with the SAME
    * deterministic Lloyd-refined centroids the IVF tier trains
    * ([[trainedCentroids]] — one training, two consumers), then within
    * each cell every over-threshold pair (round-6 cosine ≥ [[SemTau]])
    * marks the LATER vector in (csim-to-own-centroid ASC, vec_id ASC)
    * order as a duplicate; survivors are the order-minimal
    * representatives. Keeping the LOW-centroid-similarity member of
    * each duplicate chain is the paper's diversity rule: the kept
    * example is the one farthest from the cluster's center of mass.
    *
    * Scale shape: pair work is within-cell only — with the IVF cell
    * rule (C = √(n/8)) mean cell size grows as √n, so at true 100 TB
    * scale the cell count knob moves to C ∝ n (the paper's constant
    * cluster size, ~0.1% of corpus per cell); the decision rule and
    * plan shape are unchanged, only the centroid table grows — still
    * broadcastable at millions of cells, and the quadratic term stays
    * bounded per cell. The anti-join is on vec_id alone (dropped-id
    * set), so the survivors' projection never re-shuffles the
    * embedding payload. */
  def embedSemdedup(s: SparkSession, d: String): DataFrame = {
    val e = DedupQueries.eager(normed(s, d))
    val cent = trainedCentroids(e, embeddings(s, d).count(), LloydRounds)
    val asg = DedupQueries.eager(assignWithSim(e, cent))
    val dropped = asg.as("a")
      .join(asg.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id") &&
          (col("b.csim") < col("a.csim") ||
            (col("b.csim") === col("a.csim") &&
              col("b.vec_id") < col("a.vec_id"))))
      .withColumn("cos",
        expr(s"round(${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6)"))
      .filter(col("cos") >= SemTau)
      .select(col("a.vec_id")).distinct()
    asg.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"), col("csim").as("c2c"))
  }

  /** [[assignTo]] that ALSO carries the winning cosine-to-centroid
    * (`csim`) — [[embedSemdedup]]'s survivor order key. Kept separate so
    * the persisted-index schema ([[assignTo]] consumers) is untouched. */
  private def assignWithSim(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .withColumn("csim",
        expr(s"round(${dot("embedding", "cvec")} / (nrm * cnrm), 6)"))
      .groupBy(col("vec_id"))
      .agg(
        max(struct(col("csim"), (-col("cent_id")).as("neg_cent")))
          .as("best"),
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"))
      .select(col("vec_id"), (-col("best.neg_cent")).as("cell"),
        col("best.csim").as("csim"), col("embedding"), col("nrm"))

  /** Candidate pairs of [[embedNeardup]] with their exact cosine, BEFORE
    * the ≥ 0.4 verify cut (band-duplicated pairs included) — the
    * operator's cost diagnostic: the row count here is the verify work,
    * which must grow ~linearly in corpus size for the bucketing to be
    * scale-safe (see ScaleUp evidence, SURVEY §6.1). */
  def neardupScored(s: SparkSession, d: String): DataFrame = {
    val e = DedupQueries.eager(banded(s, d))
    def pairsIn(bcol: String): DataFrame =
      e.as("a")
        .join(e.as("b"),
          col(s"a.$bcol") === col(s"b.$bcol") &&
            col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos",
          expr(s"round(${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6)"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("cos"))
    pairsIn("b0").unionByName(pairsIn("b1"))
  }

  /** Hard ceiling on band width. 40 sign bits = up to 2^40 buckets per
    * band; the width rule below stops growing once n > 8·2^39 ≈ 4.4e12
    * vectors — for 64-dim float32 embeddings that is ≈ 1.1 PB of raw
    * vector data, an order of magnitude past the 100 TB design target.
    * (The round-4 cap of 16 bits bound at ~262k vectors — a structural
    * limit of the old 32-plane family, not of the corpus.) Buckets are
    * BIGINT so bits ≥ 31 cannot overflow. */
  private[ext] val MaxBandBits = 40

  /** Band width (sign bits per LSH band) for a corpus of `n` vectors:
    * the smallest b in [4, [[MaxBandBits]]] with 2^b buckets ≥ n / 8
    * (target ~8 vectors per bucket, so in-bucket pair work stays O(N) as
    * the corpus grows). INTEGER-ONLY arithmetic — the oracle evaluates
    * the same rule per bit as `j < 4 OR n > 8·2^j` (monotone in j, so
    * bit j is active iff j < b), with no float log that could round
    * differently across engines. */
  private[ext] def bandBits(n: Long): Int =
    4 + (4 until MaxBandBits).count(j => n > (8L << j))

  /** Corpus with TWO independent corpus-width LSH band buckets attached
    * (narrow). Band 0 uses planes 0..b and band 1 uses planes
    * [[MaxBandBits]]..[[MaxBandBits]]+b of the on-demand plane family, so
    * the two bands never share a plane at any width. */
  private def banded(s: SparkSession, d: String): DataFrame = {
    val b = bandBits(embeddings(s, d).count())
    def bucket(offset: Int): String =
      (0 until b).map { j =>
        val p = planeFamily(offset + j)
        val arr = s"CAST(array(${p.mkString(", ")}) AS ARRAY<FLOAT>)"
        s"IF(${dot("embedding", arr)} >= 0, CAST(${1L << j} AS BIGINT), 0)"
      }.mkString(" + ")
    normed(s, d)
      .withColumn("b0", expr(bucket(0)))
      .withColumn("b1", expr(bucket(MaxBandBits)))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH buckets — the third ANN
    * tier, complementing brute force ([[embedTopk]]) and IVF
    * ([[embedIvf]]). 8 deterministic Rademacher (±1) hyperplanes hash each
    * vector to sign-bit bucket 0..255; search = equi-join on bucket +
    * exact-cosine top-3. Per-query work is O(N/2^planes) and, unlike IVF,
    * bucketing needs NO centroid pass over the corpus — a single narrow
    * projection. The ±1 planes are generated from a fixed xorshift64 seed
    * and embedded as literals in BOTH engines' SQL, so the oracle shares
    * them by construction. */
  def embedLsh(s: SparkSession, d: String): DataFrame =
    lshSearch(s, d, multiProbe = false)

  /** Multi-probe variant: each query ALSO probes the 8 buckets at
    * Hamming distance 1 from its own (flip one sign bit) — the standard
    * recall knob for hyperplane LSH. Only the tiny QUERY side explodes
    * (9 probe rows per query); the corpus stays single-bucketed, so the
    * added cost is probe fan-in, never a corpus blowup. */
  def embedMplsh(s: SparkSession, d: String): DataFrame =
    lshSearch(s, d, multiProbe = true)

  private def lshSearch(s: SparkSession, d: String,
      multiProbe: Boolean): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    lshCandidatesFor(s, d, multiProbe, Planes.size, loId = 0L, hiId = 10L)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("sim"),
        col("rank"))
  }

  /** The LSH candidate relation behind [[embedLsh]]/[[embedMplsh]],
    * parameterized on plane count, probe mode and query-id window — the
    * recall-diagnostic knobs for [[graft.tools.LshRecall]] (the oracle
    * queries fix 8 planes and window 0..10; recall needs a wider
    * sample). One row per (query, candidate) scored pair — counting
    * them measures the tier's work; top-k ranking sits on top. */
  private[graft] def lshCandidatesFor(s: SparkSession, d: String,
      multiProbe: Boolean, nPlanes: Int, loId: Long,
      hiId: Long): DataFrame = {
    val b = DedupQueries.eager(bucketedWith(s, d, nPlanes))
    val probeList = "bucket" +: (if (multiProbe)
      (0 until nPlanes).map(j => s"bucket ^ ${1 << j}") else Seq.empty[String])
    val q = b.filter(col("vec_id") >= loId && col("vec_id") < hiId)
      .select(col("vec_id").as("query_id"),
        explode(expr(s"array(${probeList.mkString(", ")})")).as("bucket"),
        col("embedding").as("qvec"), col("nrm").as("qnrm"))
    b.select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("embedding").as("cvec"), col("nrm").as("cnrm"))
      .join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        expr(s"round(${dot("qvec", "cvec")} / (qnrm * cnrm), 6)"))
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("sim"))
  }

  /** Corpus with the `nPlanes`-bit hyperplane-sign bucket attached
    * (narrow; planes are the prefix of [[planeFamily]], so 8 planes
    * reproduces the oracle's bucketing exactly). */
  private def bucketedWith(s: SparkSession, d: String,
      nPlanes: Int): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= planeFamily.size,
      s"nPlanes must be in [1, ${planeFamily.size}]: $nPlanes")
    val bits = planeFamily.take(nPlanes).zipWithIndex.map { case (p, j) =>
      val arr = s"CAST(array(${p.mkString(", ")}) AS ARRAY<FLOAT>)"
      s"IF(${dot("embedding", arr)} >= 0, ${1 << j}, 0)"
    }
    normed(s, d).withColumn("bucket", expr(bits.mkString(" + ")))
  }

  /** 2·[[MaxBandBits]] Rademacher hyperplanes over 64 dims from a fixed
    * xorshift64 seed — deterministic, engine-neutral (only the literals
    * ±1 cross engines), and extendable by construction: plane k is simply
    * the k-th draw of the seeded stream, so widening [[MaxBandBits]]
    * regenerates a longer prefix-compatible family (the round-4 ADVICE
    * fix for the 16-bit structural cap). The first 8 serve
    * [[embedLsh]]/[[embedMplsh]]; [[embedNeardup]]'s two corpus-width
    * bands draw from [0, MaxBandBits) and [MaxBandBits, 2·MaxBandBits). */
  private[ext] val planeFamily: Seq[Seq[Int]] = {
    var x = 88172645463325252L
    Seq.fill(2 * MaxBandBits)(Seq.fill(64) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      if (x >= 0) 1 else -1
    })
  }

  /** The 8-plane prefix used by the fixed-width LSH search tier. */
  private[ext] val Planes: Seq[Seq[Int]] = planeFamily.take(8)

  /** IVF centroid count for a corpus of `n` vectors: √(n/8) (min 8), so
    * cells grow with the corpus and per-query in-cell work O(n/C) keeps
    * shrinking relative to n (the round-3 fixed C=8 stopped shrinking).
    * `sqrt`/`ceil` are IEEE-exact, so Scala and the oracle's SQL agree. */
  private[ext] def ivfCells(n: Long): Long =
    math.max(8L, math.ceil(math.sqrt(n / 8.0)).toLong)

  /** SQL form of [[ivfCells]] over the corpus row count. */
  private val ivfCellsSql: String =
    "(SELECT GREATEST(8, CAST(ceil(sqrt(count(*) / 8.0)) AS BIGINT)) " +
      "FROM embeddings)"

  /** Fixed Lloyd refinement rounds for the IVF centroids. Two rounds is
    * the standard cheap fix for unbalanced seed cells; the round count is
    * a constant so the oracle replays the exact same chain as CTEs. */
  private[ext] val LloydRounds = 2

  /** [[LloydRounds]] exposed for the recall tools (tools live outside
    * the ext package). */
  private[graft] def productionLloydRounds: Int = LloydRounds

  /** One argmax cell assignment of the normed corpus against `cent`
    * (broadcast C rows; corpus streams — never shuffles on this join).
    * The argmax is a map-side-combinable `max(struct(csim, −cent_id))`
    * aggregate — NOT a row_number window, which would sort-shuffle all
    * N×C scored rows; the agg combines them to N rows before the one
    * shuffle. Struct ordering compares csim first, then −cent_id, so the
    * winner is exactly the window's (csim DESC, cent_id ASC) head.
    * embedding/nrm are constant per vec_id, so `first` is
    * deterministic. */
  /** QUERY-side multi-probe assignment: the `nprobe` nearest centroids
    * per vector (csim DESC, cent_id ASC — the same order whose head is
    * [[assignTo]]'s argmax), one output row per (vec_id, cell). The
    * production IVF recall lever: probing n cells multiplies candidate
    * volume ~n× and recovers neighbors that straddle a cell boundary
    * (measured recall/candidate table in SURVEY §6.2b). QUERY-side
    * only — the window partitions by vec_id over a queries×C relation
    * (queries are search-request-scale; the CORPUS assignment stays the
    * windowless map-side-combinable argmax of [[assignTo]]). nprobe=1
    * reduces to [[assignTo]] exactly. */
  private[ext] def assignTopN(e: DataFrame, cent: DataFrame,
      nprobe: Int): DataFrame =
    if (nprobe <= 1) assignTo(e, cent)
    else {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cent_id"))
      e.crossJoin(broadcast(cent))
        .withColumn("csim",
          expr(s"round(${dot("embedding", "cvec")} / (nrm * cnrm), 6)"))
        .withColumn("prb", row_number().over(w))
        .filter(col("prb") <= nprobe)
        .select(col("vec_id"), col("cent_id").as("cell"),
          col("embedding"), col("nrm"))
    }

  private[ext] def assignTo(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .withColumn("csim",
        expr(s"round(${dot("embedding", "cvec")} / (nrm * cnrm), 6)"))
      .groupBy(col("vec_id"))
      .agg(
        max(struct(col("csim"), (-col("cent_id")).as("neg_cent")))
          .as("best"),
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"))
      .select(col("vec_id"), (-col("best.neg_cent")).as("cell"),
        col("embedding"), col("nrm"))

  /** One Lloyd step: new centroid = per-cell component mean. The mean is
    * computed over components QUANTIZED to 1e-6 fixed-point BIGINTs, so
    * the cross-partition sum is an exact integer — order-independent,
    * hence bit-identical between Spark's partial aggregation and the
    * oracle's single-threaded fold (a raw double `avg` is summed in
    * partition order and can flip a downstream round(·, 6) boundary).
    * The mean is then cast back to float so refined centroids flow
    * through the same codegen'd `dot_f` as the seed ones. Cells that end
    * up empty simply drop out (both engines group only realized cells). */
  private def lloydStep(asg: DataFrame): DataFrame = {
    val m = asg
      .select(col("cell"), posexplode(col("embedding")).as(Seq("p", "v")))
      .withColumn("q", floor(col("v").cast("double") * lit(1e6)).cast("long"))
      .groupBy(col("cell"), col("p"))
      .agg((sum(col("q")).cast("double") / count(lit(1)) / lit(1e6))
        .cast("float").as("m"))
    m.groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("m")))),
        x => x.getField("m")).as("cvec"))
      .select(col("cell").as("cent_id"), col("cvec"),
        expr(s"sqrt(${dot("cvec", "cvec")})").as("cnrm"))
  }

  /** Cell assignment used by [[embedIvf]]; callers eager-cache it because
    * they use it on two join sides (at 100 TB this is a persisted
    * intermediate table, not a recompute). Seeds = the first [[ivfCells]]
    * vec_ids (deterministic; the fixture ids are cluster-shuffled, so id
    * order is an unbiased draw), refined by [[LloydRounds]] deterministic
    * Lloyd steps — untrained seeds give luck-of-id-order cell balance on
    * clustered data; the refinement pulls centroids to actual cluster
    * mass (measured recall@3 evidence in SURVEY §6.2). Each refined
    * centroid table is C rows, eager-materialized so the corpus is
    * scanned once per assignment pass (LloydRounds + 1 total), never
    * re-derived through a nested plan. */
  /** Mean probed-cell candidate mass per query at a given `nprobe` —
    * the candidate-volume column of SURVEY §6.2b's recall table (the
    * analogue of §6.2a's LSH candidate counts): how much in-cell scoring
    * work one query buys at each probe width. */
  private[graft] def ivfCandidateMass(s: SparkSession, d: String,
      rounds: Int, qLo: Long, qHi: Long, nprobe: Int): Double = {
    val e = DedupQueries.eager(normed(s, d))
    val cent = trainedCentroids(e, embeddings(s, d).count(), rounds)
    val sizes = assignTo(e, cent).groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
    val q = assignTopN(
      e.filter(col("vec_id") >= qLo && col("vec_id") < qHi), cent, nprobe)
    val r = q.join(sizes, Seq("cell"))
      .agg(sum(col("n")).cast("double").as("mass"),
        countDistinct(col("vec_id")).as("nq"))
      .head()
    if (r.getLong(1) == 0L) 0.0 else r.getDouble(0) / r.getLong(1)
  }

  private def assignedCells(s: SparkSession, d: String,
      rounds: Int = LloydRounds): DataFrame = {
    // The normed corpus feeds rounds+1 assignment passes — cache it once
    // (at 100 TB this is the persisted normed-embedding intermediate
    // every ANN system maintains, same stance as the cells cache). The
    // materializing count doubles as the corpus count (r16 job diet).
    val (e, n) =
      if (rounds == 0) (normed(s, d), embeddings(s, d).count())
      else DedupQueries.eagerCounted(normed(s, d))
    assignTo(e, trainedCentroids(e, n, rounds))
  }

  /** The trained IVF centroid table (cent_id, cvec, cnrm) for a normed
    * corpus `e` of `n` vectors: first-[[ivfCells]] seeds refined by
    * `rounds` deterministic Lloyd steps. Exposed for
    * [[VectorIndex.build]], which persists this table instead of
    * retraining it per query. */
  private[ext] def trainedCentroids(e: DataFrame, n: Long,
      rounds: Int): DataFrame = {
    val c = ivfCells(n)
    val seed = e.filter(col("vec_id") < c)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
        col("nrm").as("cnrm"))
    // Centroid tables are DRIVER-LOCAL between rounds (see
    // [[DedupQueries.localized]]): same one-action-per-round cost as the
    // eager-cache shape, but every downstream broadcast of the result —
    // each assignment pass, and every consuming action of a lifecycle
    // caller — stops costing a broadcast-materialization job.
    if (rounds == 0) seed
    else (1 to rounds).foldLeft(DedupQueries.localized(seed)) { (cn, _) =>
      DedupQueries.localized(lloydStep(assignTo(e, cn)))
    }
  }

  // ---- persisted-index query forms (X113) ----------------------------------

  /** Per-process cache of opened/built indexes, keyed by corpus dir —
    * the driver's Verify/Bench mains call each query several times and
    * must not re-open (let alone retrain) per call. */
  private val indexCache =
    scala.collection.concurrent.TrieMap.empty[String, VectorIndex]

  /** The persisted [[VectorIndex]] for corpus dir `d` — opened if the
    * on-disk artifacts exist AND match the corpus row count (defense
    * against a stale index from an older fixture generation), built
    * otherwise. The build cost is paid once per corpus per machine;
    * every subsequent query run is search-only — the lifecycle split
    * the inline-training oracle queries deliberately don't have. */
  private[ext] def persistedIndex(s: SparkSession, d: String): VectorIndex =
    indexCache.getOrElseUpdate(d, {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val root = s"${sys.props("java.io.tmpdir")}/graft_vindex_v1_$tag"
      val n = embeddings(s, d).count()
      val opened =
        try {
          val idx = VectorIndex.open(s, root)
          if (idx.cells.read().count() == n) Some(idx) else None
        } catch { case _: IllegalArgumentException => None }
      opened.getOrElse {
        val p = java.nio.file.Paths.get(root)
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          scala.util.Using.resource(java.nio.file.Files.walk(p))(
            _.iterator().asScala.toSeq).reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
        VectorIndex.build(s, embeddings(s, d), root)
      }
    })

  /** The oracle query window as a (query_id, embedding) relation. */
  private def cornerQueries(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).filter(col("vec_id") >= 8 && col("vec_id") < 28)
      .select(col("vec_id").as("query_id"), col("embedding"))

  /** [[embedIvf]] served from the PERSISTED index — same 20 queries,
    * bit-identical rows (same `ivfOracle`), but training cost zero at
    * query time. */
  def embedIvfIdx(s: SparkSession, d: String): DataFrame =
    persistedIndex(s, d).searchIvf(cornerQueries(s, d), 3)

  /** The X113 REFRESH lifecycle under the oracle gate: a scratch source
    * table is indexed ([[VectorIndex.build]] — centroids frozen from
    * the ORIGINAL corpus), then a deterministic change wave lands
    * (updates %7=0: dimension-rotated — norm-preserving; inserts %6=1:
    * re-keyed + reversed; DELETE %10=3) and the index catches up purely
    * from the source's change feed ([[VectorIndex#refresh]] — changed
    * keys re-assigned against the FROZEN centroids, touched cell
    * partitions rewritten, never a retrain). The search result over the
    * refreshed index hash-matches a DuckDB replay that trains on the
    * original corpus (the shared `cellsCte`) and assigns the REPLAYED
    * final corpus to those frozen centroids — which is exactly the
    * catch-up-vs-rebuild contract: refresh must equal
    * assign-everything-to-old-centroids, NOT a fresh build. */
  def embedIvfRefresh(s: SparkSession, d: String): DataFrame = {
    def scratch(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val src = graft.lake.MergeTable(s, scratch("graft_q_vr_src"))
    val v1 = src.overwrite(emb)
    val idx = VectorIndex.build(s, src.read(), scratch("graft_q_vr_idx"))
    val upd = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("embedding", expr(
        "concat(slice(embedding, 2, size(embedding) - 1), slice(embedding, 1, 1))"))
    val ins = emb.filter(col("vec_id") % 6 === 1)
      .withColumn("vec_id", col("vec_id") + 10000000L)
      .withColumn("embedding", expr("reverse(embedding)"))
    src.merge(upd.unionByName(ins), "vec_id")
    val v3 = src.delete(col("vec_id") % 10 === 3)
    idx.refresh(src.changes(v1, v3, "vec_id"))
    idx.searchIvf(cornerQueries(s, d), 3)
  }

  /** [[embedIvfPq]] served from the PERSISTED index — same oracle. */
  def embedIvfPqIdx(s: SparkSession, d: String): DataFrame =
    persistedIndex(s, d).searchIvfPq(cornerQueries(s, d), 3)

  /** [[VectorIndex.searchIvfPq]] at nprobe=2 — the multi-probe knob on
    * the ADC tier: candidates come from each query's TWO nearest cells
    * (partition-pruned file reads), scoring still touches PQ CODES
    * only. Persisted-path ≡ train-inline was proven at nprobe=1
    * (`q_embed_ivfpq_idx`); here the persisted index IS the operator
    * and the oracle replays top-2 assignment + ADC directly. */
  def embedIvfPqNprobe(s: SparkSession, d: String): DataFrame =
    persistedIndex(s, d).searchIvfPq(cornerQueries(s, d), 3, nprobe = 2)

  /** [[VectorIndex.searchIvfPqRerank]] under the oracle gate: ADC
    * top-16 shortlist at nprobe=2, exact-cosine re-rank to top-3 —
    * the two-stage search that breaks the measured ADC recall ceiling
    * (§6.2b) while touching only `shortlist` full vectors per query. */
  def embedIvfPqRerank(s: SparkSession, d: String): DataFrame =
    persistedIndex(s, d).searchIvfPqRerank(cornerQueries(s, d), 3,
      shortlist = 16, nprobe = 2)

  /** The IVF MULTI-PROBE recall knob under the oracle gate: the same
    * search as `q_embed_ivf` but each query probes its TWO nearest
    * cells ([[assignTopN]] — measured in SURVEY §6.2b: nprobe 1→2 buys
    * recall@3 0.33→0.52 at sf0.01 / 0.21→0.35 at sf0.1 for exactly 2×
    * the candidates). The hash proves the probe-expansion algebra —
    * per-query centroid ranking, disjoint-cell candidate union, global
    * re-rank across both probed cells — not just the recall trend. */
  def embedIvfNprobe(s: SparkSession, d: String): DataFrame =
    embedIvfRounds(s, d, LloydRounds, 8, 28, nprobe = 2)

  /** [[VectorIndex.searchIvf]] at nprobe=2 from the PERSISTED index —
    * bit-identical to the train-inline [[embedIvfNprobe]] (same
    * oracle), with cell-partition pruning still bounding the files
    * read to the probed cells. */
  def embedIvfNprobeIdx(s: SparkSession, d: String): DataFrame =
    persistedIndex(s, d).searchIvf(cornerQueries(s, d), 3, nprobe = 2)

  // ---- oracle SQL ----

  private val normCte =
    """WITH n AS (SELECT vec_id, embedding,
                    sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
                      AS nrm
                  FROM embeddings)"""

  def topkOracle: String =
    s"""$normCte,
        q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
              FROM n WHERE vec_id < 10),
        s AS (SELECT query_id, vec_id AS neighbor_id,
                round(list_sum(list_transform(range(1, len(qvec) + 1),
                        i -> qvec[i]::DOUBLE * embedding[i]::DOUBLE))
                      / (qnrm * nrm), 6) AS sim
              FROM n CROSS JOIN q WHERE vec_id <> query_id)
        SELECT query_id, neighbor_id, sim, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS rank
          FROM s) t
        WHERE rank <= 5 ORDER BY query_id, rank"""

  /** One argmax-assignment CTE pair against centroid table `cent`:
    * `asg$k` (all csims) → `cells$k` (winning cell per vector). Mirrors
    * [[assignTo]] exactly (round-6 csim, tie → lowest cent_id). */
  private def assignCte(k: String, cent: String): String =
    s"""asg$k AS (SELECT n.vec_id, cent_id,
                  round(list_sum(list_transform(range(1, len(embedding) + 1),
                          i -> embedding[i]::DOUBLE * cvec[i]::DOUBLE))
                        / (nrm * cnrm), 6) AS csim
                FROM n CROSS JOIN $cent),
        cells$k AS (SELECT vec_id, cent_id AS cell FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id
                                ORDER BY csim DESC, cent_id) AS rn
                    FROM asg$k) t
                  WHERE rn = 1)"""

  /** One Lloyd-step CTE chain: cells`k` → centroid table `cent$next`.
    * Mirrors [[lloydStep]] bit-for-bit: components quantized to 1e-6
    * fixed-point BIGINTs, exact integer sum (order-independent), the
    * same (sum / count / 1e6) double division, cast to REAL. */
  private def lloydCte(k: String, next: String): String =
    s"""exp$next AS (SELECT cell,
                  unnest(list_transform(range(1, len(embedding) + 1),
                    i -> {'p': i,
                          'v': CAST(floor(embedding[i]::DOUBLE * 1000000.0)
                                    AS BIGINT)})) AS pv
                FROM cells$k JOIN n USING (vec_id)),
        m$next AS (SELECT cell, pv.p AS p,
                  (CAST(CAST(sum(pv.v) AS BIGINT) AS DOUBLE)
                     / count(*) / 1000000.0)::REAL AS m
                FROM exp$next GROUP BY cell, pv.p),
        cent$next AS (SELECT cell AS cent_id, cvec,
                  sqrt(list_sum(list_transform(cvec,
                    x -> x::DOUBLE * x::DOUBLE))) AS cnrm
                FROM (SELECT cell, list(m ORDER BY p) AS cvec
                      FROM m$next GROUP BY cell) t)"""

  /** Shared cell-assignment CTE chain (normed corpus → seed centroids →
    * [[LloydRounds]] Lloyd refinements → final argmax assignment → `nc` =
    * corpus with cell ids). Centroid count and every refinement step are
    * the same corpus-derived rules as the Spark side. */
  private val cellsCte: String = {
    val rounds = (1 to LloydRounds).map { r =>
      s"${assignCte(s"_r$r", s"cent${r - 1}")},\n        ${lloydCte(s"_r$r", s"$r")}"
    }.mkString(",\n        ")
    s"""$normCte,
        cent0 AS (SELECT vec_id AS cent_id, embedding AS cvec, nrm AS cnrm
                 FROM n WHERE vec_id < $ivfCellsSql),
        $rounds,
        ${assignCte("", s"cent$LloydRounds")},
        nc AS (SELECT n.vec_id, cell, embedding, nrm
               FROM n JOIN cells ON n.vec_id = cells.vec_id)"""
  }

  def ivfOracle: String =
    s"""$cellsCte,
        q AS (SELECT vec_id AS query_id, cell, embedding AS qvec,
                nrm AS qnrm
              FROM nc WHERE vec_id >= 8 AND vec_id < 28),
        s AS (SELECT query_id, q.cell AS cell, nc.vec_id AS neighbor_id,
                round(list_sum(list_transform(range(1, len(qvec) + 1),
                        i -> qvec[i]::DOUBLE * embedding[i]::DOUBLE))
                      / (qnrm * nrm), 6) AS sim
              FROM nc JOIN q ON nc.cell = q.cell
              WHERE nc.vec_id <> query_id)
        SELECT query_id, cell, neighbor_id, sim, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS rank
          FROM s) t
        WHERE rank <= 3 ORDER BY query_id, rank"""

  /** DuckDB oracle for [[embedIvfNprobe]] / [[embedIvfNprobeIdx]] —
    * the shared training chain, then the window queries' TOP-2 centroid
    * cells from the full-score CTE (`asg` — rn ≤ 2 under the same
    * (csim DESC, cent_id ASC) order whose head is the argmax), the
    * candidate union over both probed cells (disjoint — a corpus vector
    * lives in exactly one cell), and one global re-rank per query. */
  def ivfNprobeOracle: String =
    s"""$cellsCte,
        qc AS (SELECT vec_id AS query_id, cent_id AS cell FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                             ORDER BY csim DESC, cent_id) AS rn
                 FROM asg WHERE vec_id >= 8 AND vec_id < 28) t
               WHERE rn <= 2),
        q AS (SELECT query_id, cell, embedding AS qvec, nrm AS qnrm
              FROM qc JOIN n ON qc.query_id = n.vec_id),
        s AS (SELECT query_id, q.cell AS cell, nc.vec_id AS neighbor_id,
                round(list_sum(list_transform(range(1, len(qvec) + 1),
                        i -> qvec[i]::DOUBLE * embedding[i]::DOUBLE))
                      / (qnrm * nrm), 6) AS sim
              FROM nc JOIN q ON nc.cell = q.cell
              WHERE nc.vec_id <> query_id)
        SELECT query_id, cell, neighbor_id, sim, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS rank
          FROM s) t
        WHERE rank <= 3 ORDER BY query_id, rank"""

  /** DuckDB oracle for [[embedIvfPqNprobe]] — [[embedIvfPqOracle]] with
    * the query cells widened to the top-2 centroid ranks. */
  def ivfPqNprobeOracle: String =
    s"""$cellsCte,
        ${pqCteBody("pq")},
        q2 AS (SELECT query_id, cell FROM (
                 SELECT vec_id AS query_id, cent_id AS cell,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY csim DESC, cent_id) AS rn
                 FROM asg WHERE vec_id >= 8 AND vec_id < 28) t
               WHERE rn <= 2),
        cand2 AS (SELECT q2.query_id, nc.vec_id AS neighbor_id
                  FROM nc JOIN q2 ON nc.cell = q2.cell
                  WHERE nc.vec_id <> q2.query_id),
        dt2 AS (SELECT s.vec_id AS query_id, s.sub, c.cent_id,
              CAST(floor(list_sum(list_transform(range(1, len(s.svec) + 1),
                i -> (s.svec[i] - c.cvec[i]) * (s.svec[i] - c.cvec[i])))
                * 1000000.0) AS BIGINT) AS dfp
            FROM pqsub s JOIN pqcent$PqRounds c ON s.sub = c.sub
            WHERE s.vec_id >= 8 AND s.vec_id < 28),
        sc2 AS (SELECT cand2.query_id, cand2.neighbor_id,
              CAST(SUM(dfp) AS BIGINT) AS adist_fp
            FROM cand2
            JOIN pqcode_f cd ON cd.vec_id = cand2.neighbor_id
            JOIN dt2 ON dt2.query_id = cand2.query_id
              AND dt2.sub = cd.sub AND dt2.cent_id = cd.cent_id
            GROUP BY cand2.query_id, cand2.neighbor_id)
        SELECT query_id, neighbor_id, adist_fp, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adist_fp, neighbor_id) AS rank
          FROM sc2) t
        WHERE rank <= 3 ORDER BY query_id, rank"""

  /** DuckDB oracle for [[embedIvfPqRerank]] — [[ivfPqNprobeOracle]]'s
    * ADC chain, ranked to the 16-row shortlist, then the exact-cosine
    * re-rank over the fetched corpus vectors. */
  def ivfPqRerankOracle: String =
    s"""$cellsCte,
        ${pqCteBody("pq")},
        q2 AS (SELECT query_id, cell FROM (
                 SELECT vec_id AS query_id, cent_id AS cell,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY csim DESC, cent_id) AS rn
                 FROM asg WHERE vec_id >= 8 AND vec_id < 28) t
               WHERE rn <= 2),
        cand2 AS (SELECT q2.query_id, nc.vec_id AS neighbor_id
                  FROM nc JOIN q2 ON nc.cell = q2.cell
                  WHERE nc.vec_id <> q2.query_id),
        dt2 AS (SELECT s.vec_id AS query_id, s.sub, c.cent_id,
              CAST(floor(list_sum(list_transform(range(1, len(s.svec) + 1),
                i -> (s.svec[i] - c.cvec[i]) * (s.svec[i] - c.cvec[i])))
                * 1000000.0) AS BIGINT) AS dfp
            FROM pqsub s JOIN pqcent$PqRounds c ON s.sub = c.sub
            WHERE s.vec_id >= 8 AND s.vec_id < 28),
        sc2 AS (SELECT cand2.query_id, cand2.neighbor_id,
              CAST(SUM(dfp) AS BIGINT) AS adist_fp
            FROM cand2
            JOIN pqcode_f cd ON cd.vec_id = cand2.neighbor_id
            JOIN dt2 ON dt2.query_id = cand2.query_id
              AND dt2.sub = cd.sub AND dt2.cent_id = cd.cent_id
            GROUP BY cand2.query_id, cand2.neighbor_id),
        sl AS (SELECT query_id, neighbor_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                             ORDER BY adist_fp, neighbor_id) AS rr
                 FROM sc2) t WHERE rr <= 16),
        qv AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
               FROM n WHERE vec_id >= 8 AND vec_id < 28),
        ex AS (SELECT sl.query_id, sl.neighbor_id,
                 round(list_sum(list_transform(range(1, len(qvec) + 1),
                         i -> qvec[i]::DOUBLE * embedding[i]::DOUBLE))
                       / (qnrm * nrm), 6) AS sim
               FROM sl JOIN n ON n.vec_id = sl.neighbor_id
               JOIN qv ON qv.query_id = sl.query_id)
        SELECT query_id, neighbor_id, sim, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS rank
          FROM ex) t
        WHERE rank <= 3 ORDER BY query_id, rank"""

  /** Replays [[embedSemdedup]]: the shared cell-training chain, each
    * vector's winning csim recovered from the final assignment CTE, the
    * same (csim, vec_id)-ordered within-cell duplicate marking, the same
    * anti-join. */
  /** DuckDB oracle for [[embedIvfRefresh]] — the shared original-corpus
    * training chain (frozen centroids), the replayed final corpus
    * assigned to them, and the same in-cell search. Corner queries come
    * from the ORIGINAL assignment CTE (`nc`), exactly as `searchIvf`
    * assigns external query vectors against the persisted centroids. */
  def ivfRefreshOracle: String =
    s"""$cellsCte,
        fup AS (SELECT vec_id,
                  CASE WHEN vec_id % 7 = 0
                       THEN list_concat(embedding[2:len(embedding)],
                                        embedding[1:1])
                       ELSE embedding END AS embedding
                FROM embeddings),
        fins AS (SELECT vec_id + 10000000 AS vec_id,
                   list_reverse(embedding) AS embedding
                 FROM embeddings WHERE vec_id % 6 = 1),
        fcorpus AS (SELECT * FROM
                      (SELECT * FROM fup UNION ALL SELECT * FROM fins) u
                    WHERE vec_id % 10 <> 3),
        fn AS (SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                   i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
                   AS nrm
               FROM fcorpus),
        fasg AS (SELECT fn.vec_id, cent_id,
                   round(list_sum(list_transform(range(1, len(embedding) + 1),
                           i -> embedding[i]::DOUBLE * cvec[i]::DOUBLE))
                         / (nrm * cnrm), 6) AS csim
                 FROM fn CROSS JOIN cent$LloydRounds),
        fcells AS (SELECT vec_id, cent_id AS cell FROM (
                     SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cent_id) AS rn
                     FROM fasg) t WHERE rn = 1),
        fnc AS (SELECT fn.vec_id, cell, embedding, nrm
                FROM fn JOIN fcells ON fn.vec_id = fcells.vec_id),
        q AS (SELECT vec_id AS query_id, cell, embedding AS qvec,
                nrm AS qnrm
              FROM nc WHERE vec_id >= 8 AND vec_id < 28),
        sr AS (SELECT query_id, q.cell AS cell, fnc.vec_id AS neighbor_id,
                 round(list_sum(list_transform(range(1, len(qvec) + 1),
                         i -> qvec[i]::DOUBLE * embedding[i]::DOUBLE))
                       / (qnrm * nrm), 6) AS sim
               FROM fnc JOIN q ON fnc.cell = q.cell
               WHERE fnc.vec_id <> query_id)
        SELECT query_id, cell, neighbor_id, sim, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS rank
          FROM sr) t
        WHERE rank <= 3 ORDER BY query_id, rank"""

  /** K-means cluster profile (`q_embed_kmeans`): the [[trainedCentroids]]
    * Lloyd machinery exposed as a clustering RESULT rather than an ANN
    * index — one row per realized cluster with size, centroid norm, and
    * mean member-to-centroid cosine (the per-cluster inertia analog,
    * the number a curation pipeline watches to pick k / spot degenerate
    * clusters). The mean is an exact-integer fold: each member's winning
    * csim (already 6dp-rounded, so ×1e6 is whole) is fixed-pointed to a
    * BIGINT, integer-summed (order-independent — no float-sum hash
    * risk), and divided ONCE. Scale shape: centroids broadcast, corpus
    * streams through one assignment pass, profile is k rows. */
  def embedKmeans(s: SparkSession, d: String): DataFrame = {
    val e = DedupQueries.eager(normed(s, d))
    val cent = trainedCentroids(e, embeddings(s, d).count(), LloydRounds)
    assignWithSim(e, cent)
      .withColumn("fp",
        expr("CAST(floor(csim * 1000000.0 + 0.5) AS BIGINT)"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("fp")).as("sfp"))
      .join(cent.select(col("cent_id").as("cell"),
        round(col("cnrm"), 6).as("centroid_norm")), Seq("cell"))
      .select(col("cell"), col("n_vectors"), col("centroid_norm"),
        round(col("sfp").cast("double") / col("n_vectors") / lit(1e6), 6)
          .as("avg_sim"))
  }

  /** DuckDB oracle for [[embedKmeans]] — the shared cell-training chain,
    * winning csim recovered from the final assignment, the same
    * fixed-point mean fold. */
  def kmeansOracle: String =
    s"""$cellsCte,
        c2c AS (SELECT vec_id, cent_id AS cell, csim FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cent_id) AS rn
                  FROM asg) t
                WHERE rn = 1),
        prof AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
                   CAST(sum(CAST(floor(csim * 1000000.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS sfp
                 FROM c2c GROUP BY cell)
        SELECT p.cell, p.n_vectors, round(cnrm, 6) AS centroid_norm,
               round(CAST(p.sfp AS DOUBLE) / p.n_vectors / 1000000.0, 6)
                 AS avg_sim
        FROM prof p JOIN cent$LloydRounds c ON p.cell = c.cent_id
        ORDER BY p.cell"""

  def semdedupOracle: String =
    s"""$cellsCte,
        c2c AS (SELECT vec_id, cent_id AS cell, csim FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cent_id) AS rn
                  FROM asg) t
                WHERE rn = 1),
        o AS (SELECT c2c.vec_id, c2c.cell, c2c.csim, embedding, nrm
              FROM c2c JOIN n ON c2c.vec_id = n.vec_id),
        dropped AS (SELECT DISTINCT a.vec_id
              FROM o a JOIN o b
                ON a.cell = b.cell AND a.vec_id <> b.vec_id
               AND (b.csim < a.csim
                    OR (b.csim = a.csim AND b.vec_id < a.vec_id))
              WHERE round(list_sum(list_transform(
                        range(1, len(a.embedding) + 1),
                        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                      / (a.nrm * b.nrm), 6) >= $SemTau)
        SELECT vec_id, cell, csim AS c2c FROM o
        WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        ORDER BY vec_id"""

  def lshOracle: String = lshOracleImpl(multiProbe = false)
  def mplshOracle: String = lshOracleImpl(multiProbe = true)

  private def lshOracleImpl(multiProbe: Boolean): String = {
    val bits = Planes.zipWithIndex.map { case (p, j) =>
      val lst = p.mkString("[", ", ", "]")
      s"""CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
            i -> embedding[i]::DOUBLE * ($lst)[i])) >= 0
          THEN ${1 << j} ELSE 0 END"""
    }.mkString(" + ")
    val probes = "bucket" +: (if (multiProbe)
      Planes.indices.map(j => s"xor(bucket, ${1 << j})") else Seq.empty[String])
    s"""$normCte,
        b AS (SELECT vec_id, embedding, nrm, $bits AS bucket FROM n),
        q AS (SELECT vec_id AS query_id,
                unnest([${probes.mkString(", ")}]) AS bucket,
                embedding AS qvec, nrm AS qnrm
              FROM b WHERE vec_id < 10),
        s AS (SELECT query_id, q.bucket AS bucket, b.vec_id AS neighbor_id,
                round(list_sum(list_transform(range(1, len(qvec) + 1),
                        i -> qvec[i]::DOUBLE * embedding[i]::DOUBLE))
                      / (qnrm * nrm), 6) AS sim
              FROM b JOIN q ON b.bucket = q.bucket
              WHERE b.vec_id <> query_id)
        SELECT query_id, bucket, neighbor_id, sim, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS rank
          FROM s) t
        WHERE rank <= 3 ORDER BY query_id, rank"""
  }

  /** Shared WITH-chain for the neardup family: normed corpus → band
    * buckets → candidate `pairs(vec_a, vec_b, cos)`. Same corpus-width
    * band rule as the Spark side ([[bandBits]]): bit j of a band bucket
    * is active iff j < 4 OR n > 8·2^j — pure integer comparisons, so the
    * two engines can never disagree on the width. */
  private def neardupChain: String = {
    def bucketSql(offset: Int): String =
      (0 until MaxBandBits).map { j =>
        val lst = planeFamily(offset + j).mkString("[", ", ", "]")
        val sign =
          s"""list_sum(list_transform(range(1, len(embedding) + 1),
                i -> embedding[i]::DOUBLE * ($lst)[i])) >= 0"""
        val cond = if (j < 4) sign else s"nn > ${8L << j} AND $sign"
        s"CASE WHEN $cond THEN CAST(${1L << j} AS BIGINT) ELSE 0 END"
      }.mkString("\n                 + ")
    val pairCos =
      """round(list_sum(list_transform(range(1, len(x.embedding) + 1),
               i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
             / (x.nrm * y.nrm), 6)"""
    s"""$normCte,
        params AS (SELECT count(*) AS nn FROM embeddings),
        bb AS (SELECT vec_id, embedding, nrm,
                 ${bucketSql(0)} AS b0,
                 ${bucketSql(MaxBandBits)} AS b1
               FROM n, params),
        pairs AS (
          SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, $pairCos AS cos
          FROM bb x JOIN bb y ON x.b0 = y.b0 AND x.vec_id < y.vec_id
          UNION ALL
          SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, $pairCos AS cos
          FROM bb x JOIN bb y ON x.b1 = y.b1 AND x.vec_id < y.vec_id)"""
  }

  def neardupOracle: String =
    s"""$neardupChain
        SELECT vec_a, vec_b, min(cos) AS cos
        FROM pairs WHERE cos >= 0.4
        GROUP BY vec_a, vec_b ORDER BY vec_a, vec_b"""

  /** DuckDB oracle for [[embedClusters]]: the neardup pair chain, then
    * transitive closure via a recursive CTE and min-reachable-id labels
    * (the same construction as `dedupClustersOracle`). */
  def embedClustersOracle: String =
    s"""${neardupChain.replaceFirst("WITH ", "WITH RECURSIVE ")},
        nd AS (SELECT vec_a, vec_b FROM pairs WHERE cos >= 0.4
               GROUP BY vec_a, vec_b),
        edges AS (SELECT vec_a AS a, vec_b AS b FROM nd
                  UNION SELECT vec_b, vec_a FROM nd),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lab AS (SELECT a AS vec_id, least(min(b), a) AS cluster_id
                FROM reach GROUP BY a)
        SELECT vec_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               vec_id = cluster_id AS is_canonical
        FROM lab ORDER BY vec_id"""

  /** Symmetric int8 quantization — the storage/serving compression step
    * of an embedding pipeline: per vector, scale by max|component|/127
    * and round each component to an int8 code. Cuts a float32 corpus 4×
    * (the first thing you do before a 100 TB ANN index).
    *
    * Everything is per-row higher-order-function arithmetic in DOUBLE
    * (components are cast up from float32 first, so Spark and DuckDB do
    * the identical IEEE ops) — narrow, codegen'd, zero shuffle. The
    * rounding rule is an explicit `floor(x + 0.5)` so both engines share
    * one halfway convention, and the reported `max_err` uses `array_max`
    * (order-independent), never a sequential float fold. Zero vectors
    * quantize to all-zero codes (scale 0 guard). */
  def embedQuant(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("dv", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("mx", expr("array_max(transform(dv, x -> abs(x)))"))
      .withColumn("q", expr(
        """CASE WHEN mx > 0.0
             THEN transform(dv, x -> cast(floor(x * 127.0 / mx + 0.5) as int))
             ELSE transform(dv, x -> 0) END"""))
      .select(
        col("vec_id"),
        expr("size(dv)").as("n_dims"),
        expr("round(mx / 127.0, 8)").as("scale"),
        expr("cast(aggregate(q, 0, (acc, x) -> acc + x) as bigint)")
          .as("q_sum"),
        md5(expr("concat_ws(',', transform(q, x -> cast(x as string)))"))
          .as("q_fp"),
        expr(
          """CASE WHEN mx > 0.0
               THEN round(array_max(transform(dv, x ->
                 abs(x - floor(x * 127.0 / mx + 0.5) * mx / 127.0))), 8)
               ELSE 0.0 END""").as("max_err"))

  // ---- product quantization (the IVF-PQ storage half) ---------------------

  /** PQ geometry, shared with the oracle: [[PqSubs]] subspaces, [[PqK]]
    * centroids per subspace (codes fit a byte at K ≤ 256), [[PqRounds]]
    * deterministic Lloyd rounds from first-K seeds. */
  private[ext] val PqSubs = 4
  private[ext] val PqK = 8
  private[ext] val PqRounds = 1

  /** Product quantization: each vector's M=[[PqSubs]] sub-vectors coded
    * as their nearest per-subspace centroid — the storage half of
    * FAISS-style IVF-PQ, compressing a float32 corpus to M small codes
    * per vector (vs [[embedQuant]]'s scalar int8: PQ is the variant
    * whose asymmetric distance tables make coded search cheap). Output:
    * one row per (vec_id, sub) with the code and the squared
    * reconstruction error in that subspace.
    *
    * Determinism: sub-vector distances are in-order double folds both
    * engines evaluate identically (round-6 like the IVF csim); argmin =
    * `min(struct(dist, cent_id))` — a map-side-combinable aggregate,
    * tie → lowest cent_id; Lloyd means use the 1e-6 fixed-point integer
    * sums of [[lloydStep]], so centroid training is bit-identical under
    * any partitioning.
    *
    * Scale shape: centroid tables are (M × K) rows — broadcast; the
    * corpus streams through assignment (never shuffles on the join);
    * training aggregates are map-side combinable; each Lloyd round is
    * materialized so rounds never nest plans. */
  def embedPq(s: SparkSession, d: String): DataFrame =
    pqCodesOf(embeddings(s, d), PqSubs, PqK, PqRounds)

  /** The general PQ operator behind [[embedPq]] — library API over any
    * (vec_id, embedding) frame. */
  def pqCodesOf(e: DataFrame, subs: Int, k: Int, rounds: Int): DataFrame = {
    val sub = pqSubRel(e, subs)
    pqAssign(sub, pqTrain(sub, k, rounds))
      .select(col("vec_id"), col("sub"), col("code"), col("err"))
  }

  /** Subspace relation: one row per (vec_id, sub) with the double-cast
    * sub-vector — eager-cached because training + assignment make
    * rounds+1 passes over it. */
  private[ext] def pqSubRel(e: DataFrame, subs: Int,
      cache: Boolean = true): DataFrame = {
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    require(dim % subs == 0, s"dim $dim not divisible into $subs subspaces")
    val subLen = dim / subs
    val rel = e.select(col("vec_id"), posexplode(array((0 until subs).map(i =>
      expr(s"transform(slice(embedding, ${i * subLen + 1}, $subLen), " +
        "x -> cast(x as double))")): _*)).as(Seq("sub", "svec")))
    // `cache = false` for QUERY-side sub relations a caller localizes
    // whole: caching a request-batch-sized relation costs a count job
    // per call for nothing (r16 job diet).
    if (cache) DedupQueries.eager(rel) else rel
  }

  /** First-K seeds refined by `rounds` fixed-point Lloyd steps; each
    * refined table is materialized so rounds never nest plans. */
  private[ext] def pqTrain(sub: DataFrame, k: Int, rounds: Int): DataFrame = {
    val seed = sub.filter(col("vec_id") < k)
      .select(col("sub"), col("vec_id").as("cent_id"), col("svec").as("cvec"))
    // M×K codebooks stay driver-local between rounds, same rationale as
    // [[trainedCentroids]].
    if (rounds == 0) seed
    else (1 to rounds).foldLeft(DedupQueries.localized(seed)) { (cn, _) =>
      DedupQueries.localized(pqLloyd(pqAssign(sub, cn)))
    }
  }

  /** Nearest-centroid assignment within each subspace: round-6 squared
    * L2, argmin via `min(struct(dist, cent_id))` (no N×K sort window). */
  private[ext] def pqAssign(sub: DataFrame, cent: DataFrame): DataFrame =
    sub.join(broadcast(cent), Seq("sub"))
      .withColumn("dist", expr(
        "round(aggregate(zip_with(svec, cvec, (x, c) -> (x - c) * (x - c)), " +
          "0D, (acc, v) -> acc + v), 6)"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("cent_id"))).as("best"),
        first(col("svec")).as("svec"))
      .select(col("vec_id"), col("sub"), col("best.cent_id").as("code"),
        col("best.dist").as("err"), col("svec"))

  /** One per-subspace Lloyd step with [[lloydStep]]'s 1e-6 fixed-point
    * mean discipline (exact integer sums — order-independent). */
  private def pqLloyd(asg: DataFrame): DataFrame =
    asg.select(col("sub"), col("code").as("cell"),
        posexplode(col("svec")).as(Seq("p", "v")))
      .withColumn("q", floor(col("v") * lit(1e6)).cast("long"))
      .groupBy(col("sub"), col("cell"), col("p"))
      .agg((sum(col("q")).cast("double") / count(lit(1)) / lit(1e6)).as("m"))
      .groupBy(col("sub"), col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("m")))),
        x => x.getField("m")).as("cvec"))
      .select(col("sub"), col("cell").as("cent_id"), col("cvec"))

  /** ADC search over the PQ codes — the search half of IVF-PQ: each
    * query computes its exact per-subspace distance to every centroid
    * (an M×K distance TABLE, tiny), then every coded vector's
    * approximate distance is the SUM of table lookups at its codes —
    * never a full-dimension computation against corpus vectors. Top-3
    * per query by approximate distance.
    *
    * Determinism: per-subspace lookup distances are floored to 1e-6
    * fixed-point BIGINTs (both engines compute the raw double with the
    * same in-order fold, so the floor agrees), making the per-vector
    * sum an order-independent integer — no float-summation hash risk.
    *
    * Scale shape: the distance table is (queries × M × K) rows —
    * broadcast; the codes relation streams through the lookup join (no
    * corpus shuffle); the only shuffle is the (query, vec) sum — rows,
    * not vectors. At 100 TB you'd first prune candidates to the probed
    * IVF cells (X7) and ADC-score only those; corpus-wide ADC here
    * keeps the oracle exhaustive. */
  def embedPqSearch(s: SparkSession, d: String): DataFrame = {
    val sub = pqSubRel(embeddings(s, d), PqSubs)
    val cent = pqTrain(sub, PqK, PqRounds)
    val codes = pqAssign(sub, cent).select(col("vec_id"), col("sub"),
      col("code"))
    val dt = sub.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cent), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id"),
        expr("CAST(floor(aggregate(zip_with(svec, cvec, " +
          "(x, c) -> (x - c) * (x - c)), 0D, (acc, v) -> acc + v) " +
          "* 1000000.0) AS BIGINT)").as("dfp"))
    val scored = codes
      .join(broadcast(dt),
        codes("sub") === dt("sub") && codes("code") === dt("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dfp")).as("adist_fp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_fp"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adist_fp"), col("rank"))
  }

  /** DuckDB oracle for [[embedPqSearch]] — the shared PQ training chain
    * plus the same fixed-point distance-table lookup sum. */
  def embedPqSearchOracle: String =
    s"""$pqCteChain,
        dt AS (SELECT s.vec_id AS query_id, s.sub, c.cent_id,
              CAST(floor(list_sum(list_transform(range(1, len(s.svec) + 1),
                i -> (s.svec[i] - c.cvec[i]) * (s.svec[i] - c.cvec[i])))
                * 1000000.0) AS BIGINT) AS dfp
            FROM sub s JOIN cent$PqRounds c ON s.sub = c.sub
            WHERE s.vec_id < 10),
        sc AS (SELECT query_id, cd.vec_id AS neighbor_id,
              CAST(SUM(dfp) AS BIGINT) AS adist_fp
            FROM code_f cd JOIN dt
              ON cd.sub = dt.sub AND cd.cent_id = dt.cent_id
            WHERE cd.vec_id <> dt.query_id
            GROUP BY query_id, cd.vec_id)
        SELECT query_id, neighbor_id, adist_fp, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adist_fp, neighbor_id) AS rank
          FROM sc) t
        WHERE rank <= 3 ORDER BY query_id, rank"""

  /** Shared PQ training CTE chain BODY (subspace slicing → first-K
    * seeds → [[PqRounds]] fixed-point Lloyd rounds → final assignment
    * `${p}code_f`), used by all PQ oracles. Every CTE name takes the
    * `p` prefix so the chain composes into one WITH-list with the IVF
    * [[cellsCte]] (whose cent/asg/exp/m names would otherwise
    * collide). */
  private def pqCteBody(p: String): String = {
    def asgCte(k: String, cent: String): String =
      s"""${p}asg$k AS (SELECT s.vec_id, s.sub, c.cent_id,
              round(list_sum(list_transform(range(1, len(s.svec) + 1),
                i -> (s.svec[i] - c.cvec[i]) * (s.svec[i] - c.cvec[i]))), 6)
                AS dist
            FROM ${p}sub s JOIN $cent c ON s.sub = c.sub),
          ${p}code$k AS (SELECT vec_id, sub, cent_id, dist FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                          ORDER BY dist, cent_id) AS rn
              FROM ${p}asg$k) t
            WHERE rn = 1)"""
    val lloydCtes = (1 to PqRounds).map { r =>
      s"""${asgCte(s"_r$r", s"${p}cent${r - 1}")},
          ${p}exp$r AS (SELECT s.sub, c.cent_id AS cell,
                unnest(list_transform(range(1, len(s.svec) + 1),
                  i -> {'p': i,
                        'v': CAST(floor(s.svec[i] * 1000000.0) AS BIGINT)}))
                  AS pv
              FROM ${p}code_r$r c JOIN ${p}sub s
                ON c.vec_id = s.vec_id AND c.sub = s.sub),
          ${p}m$r AS (SELECT sub, cell, pv.p AS p,
                CAST(CAST(sum(pv.v) AS BIGINT) AS DOUBLE)
                  / count(*) / 1000000.0 AS m
              FROM ${p}exp$r GROUP BY sub, cell, pv.p),
          ${p}cent$r AS (SELECT sub, cell AS cent_id,
                list(m ORDER BY p) AS cvec
              FROM (SELECT sub, cell, p, m FROM ${p}m$r) t
              GROUP BY sub, cell)"""
    }.mkString(",\n")
    s"""${p}sub AS (
          SELECT vec_id, s.sub AS sub,
                 list_transform(
                   embedding[(s.sub * (len(embedding) // $PqSubs) + 1):
                             ((s.sub + 1) * (len(embedding) // $PqSubs))],
                   x -> CAST(x AS DOUBLE)) AS svec
          FROM embeddings, (SELECT unnest(range(0, $PqSubs)) AS sub) s),
        ${p}cent0 AS (SELECT sub, vec_id AS cent_id, svec AS cvec
                  FROM ${p}sub WHERE vec_id < $PqK),
        $lloydCtes,
        ${asgCte("_f", s"${p}cent$PqRounds")}"""
  }

  private def pqCteChain: String = s"WITH ${pqCteBody("")}"

  /** IVF-PQ combined search — the canonical big-ANN shape: the IVF
    * index PRUNES candidates to the query's cell (X7's √N Lloyd-refined
    * cells), then ADC over PQ codes SCORES only those candidates — the
    * corpus is touched once for cell assignment and once for coding;
    * search itself reads codes, never vectors. Same 20 queries as
    * [[embedIvf]]; same fixed-point ADC determinism as
    * [[embedPqSearch]].
    *
    * Scale shape: candidate generation is the one cell-keyed equi-join
    * [[embedIvf]] already pays; scoring joins candidates to the codes
    * relation on vec_id and to the broadcast distance table — the full
    * ADC sweep of [[embedPqSearch]] never happens. This is the
    * composition the X99 scaladoc promises for 100 TB. */
  def embedIvfPq(s: SparkSession, d: String): DataFrame = {
    val cells = DedupQueries.eager(
      assignedCells(s, d).select(col("vec_id"), col("cell")))
    val sub = pqSubRel(embeddings(s, d), PqSubs)
    val cent = pqTrain(sub, PqK, PqRounds)
    val codes = pqAssign(sub, cent)
      .select(col("vec_id"), col("sub"), col("code"))
    val q = cells.filter(col("vec_id") >= 8 && col("vec_id") < 28)
      .select(col("vec_id").as("query_id"), col("cell"))
    val cand = cells.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val dt = sub.filter(col("vec_id") >= 8 && col("vec_id") < 28)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cent), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id"),
        expr("CAST(floor(aggregate(zip_with(svec, cvec, " +
          "(x, c) -> (x - c) * (x - c)), 0D, (acc, v) -> acc + v) " +
          "* 1000000.0) AS BIGINT)").as("dfp"))
    val scored = cand.join(codes, Seq("vec_id"))
      .join(broadcast(dt), Seq("query_id", "sub"))
      .filter(col("code") === col("cent_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dfp")).as("adist_fp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_fp"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adist_fp"), col("rank"))
  }

  /** DuckDB oracle for [[embedIvfPq]] — the IVF cells chain and the
    * prefix-renamed PQ chain composed in one WITH-list, then the same
    * prune→ADC→rank. */
  def embedIvfPqOracle: String =
    s"""$cellsCte,
        ${pqCteBody("pq")},
        q2 AS (SELECT vec_id AS query_id, cell FROM nc
               WHERE vec_id >= 8 AND vec_id < 28),
        cand2 AS (SELECT q2.query_id, nc.vec_id AS neighbor_id
                  FROM nc JOIN q2 ON nc.cell = q2.cell
                  WHERE nc.vec_id <> q2.query_id),
        dt2 AS (SELECT s.vec_id AS query_id, s.sub, c.cent_id,
              CAST(floor(list_sum(list_transform(range(1, len(s.svec) + 1),
                i -> (s.svec[i] - c.cvec[i]) * (s.svec[i] - c.cvec[i])))
                * 1000000.0) AS BIGINT) AS dfp
            FROM pqsub s JOIN pqcent$PqRounds c ON s.sub = c.sub
            WHERE s.vec_id >= 8 AND s.vec_id < 28),
        sc2 AS (SELECT cand2.query_id, cand2.neighbor_id,
              CAST(SUM(dfp) AS BIGINT) AS adist_fp
            FROM cand2
            JOIN pqcode_f cd ON cd.vec_id = cand2.neighbor_id
            JOIN dt2 ON dt2.query_id = cand2.query_id
              AND dt2.sub = cd.sub AND dt2.cent_id = cd.cent_id
            GROUP BY cand2.query_id, cand2.neighbor_id)
        SELECT query_id, neighbor_id, adist_fp, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adist_fp, neighbor_id) AS rank
          FROM sc2) t
        WHERE rank <= 3 ORDER BY query_id, rank"""

  /** DuckDB oracle for [[embedPq]]: identical subspace slicing, round-6
    * distances, argmin tie rule, and fixed-point Lloyd means, with the
    * [[PqRounds]] training rounds unrolled as CTEs. */
  def embedPqOracle: String =
    s"""$pqCteChain
        SELECT vec_id, sub, cent_id AS code, dist AS err
        FROM code_f ORDER BY vec_id, sub"""

  /** DuckDB oracle for [[embedQuant]] — same double-only arithmetic and
    * the same explicit `floor(x + 0.5)` halfway rule. */
  def embedQuantOracle: String =
    """WITH t AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
         FROM embeddings),
       m AS (
         SELECT vec_id, dv,
                list_max(list_transform(dv, x -> abs(x))) AS mx
         FROM t),
       q AS (
         SELECT vec_id, dv, mx,
                CASE WHEN mx > 0.0
                  THEN list_transform(dv,
                         x -> CAST(FLOOR(x * 127.0 / mx + 0.5) AS INTEGER))
                  ELSE list_transform(dv, x -> 0) END AS qc
         FROM m)
       SELECT vec_id,
              CAST(len(dv) AS INTEGER) AS n_dims,
              round(mx / 127.0, 8) AS scale,
              CAST(list_sum(qc) AS BIGINT) AS q_sum,
              md5(array_to_string(qc, ',')) AS q_fp,
              CASE WHEN mx > 0.0
                THEN round(list_max(list_transform(dv, x ->
                  abs(x - FLOOR(x * 127.0 / mx + 0.5) * mx / 127.0))), 8)
                ELSE 0.0 END AS max_err
       FROM q ORDER BY vec_id"""
}
