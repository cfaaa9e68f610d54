package graft.ext

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch operators — distributed cardinality estimation with
  * ORACLE-REPRODUCIBLE results.
  *
  * Spark's own `approx_count_distinct` (HyperLogLog++) cannot be verified
  * against DuckDB (different sketch internals), so the estimator here is
  * KMV (k-minimum-values): over a shared md5-derived 32-bit hash space,
  * the k-th smallest distinct hash h_k of a group estimates its
  * cardinality as `(k-1) * 2^32 / h_k`. Both engines compute the same
  * integers, so the estimate matches bit-for-bit — a sketch with an
  * exact oracle.
  *
  * Scale shape: distinct-(group, hash) is one shuffle; the k smallest
  * per group is a WindowGroupLimit (top-k pushed before the final sort),
  * never a per-group collect. Merging partial sketches = merging sorted
  * k-min lists — the same associativity HLL offers.
  */
object SketchQueries {

  private val K = 64
  private val HashSpace = 4294967296.0 // 2^32 — 8 hex chars of md5

  /** (source, shingle-hash) stream — NOT deduplicated (the sketch and the
    * exact path each dedup their own way). */
  private def shingleHashes(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(
        """array_distinct(CASE WHEN size(toks) >= 3
             THEN transform(sequence(0, size(toks) - 3),
                            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             ELSE array(text) END)"""))
      .select(col("source"),
        explode(expr(
          "transform(shingles, x -> cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint))"))
          .as("th"))

  /** Per `source`: exact distinct 3-word-shingle count vs KMV estimate. */
  def sketchDistinct(s: SparkSession, d: String): DataFrame = {
    val hashed = shingleHashes(s, d).distinct()
    // One pass: rank hashes per source, then a same-key aggregate reads
    // off BOTH the exact count (max rank) and the k-th smallest hash —
    // no second distinct, no join. The agg reuses the window's
    // partitioning, so the whole query is two shuffles total.
    val w = Window.partitionBy(col("source")).orderBy(col("th"))
    hashed.withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(
        max(col("rn")).cast("long").as("n_exact"),
        max(when(col("rn") === K, col("th"))).as("h_k"))
      .select(
        col("source"), col("n_exact"),
        // fewer than K distinct values → the sketch IS the exact count
        expr(s"""CASE WHEN h_k IS NULL THEN cast(n_exact as double)
                 ELSE round(($K - 1) * $HashSpace / h_k, 2) END""")
          .as("kmv_est"))
  }

  /** Per `source`: KMV estimate via the bounded-memory [[KmvSketch]]
    * Aggregator — O(k) state per group regardless of cardinality, with
    * map-side partial aggregation (the scale path; [[sketchDistinct]] is
    * the exact-comparison variant). Feeds the RAW hash stream: the sketch
    * dedups internally. */
  def sketchKmv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    shingleHashes(s, d)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new KmvSketch(K).toColumn.name("raw"))
      .toDF("source", "raw")
      .select(col("source"), round(col("raw"), 2).as("kmv_est"))
  }

  // ---- deterministic HyperLogLog ----

  /** HLL registers: p = 4 ⇒ m = 16; the 32-bit md5 hash splits into a
    * 4-bit register index (top bits) and a 28-bit suffix whose
    * leading-zero count (+1) is the register's rho. */
  private val HllP = 4
  private val HllM = 1 << HllP // 16
  private val SuffixBits = 32 - HllP // 28
  /** alpha_m · m² for the raw HLL estimate — computed ONCE here and
    * embedded as the same double literal in both engines' SQL. */
  private val HllAlphaM2 = 0.7213 / (1 + 1.079 / HllM) * HllM * HllM

  /** Per `source`: exact distinct shingle count vs a DETERMINISTIC
    * HyperLogLog estimate — the production cardinality sketch, made
    * oracle-exact: registers derive from the shared md5 hash space, rho
    * comes from `length(bin(v))` (integer/string arithmetic, no float
    * log), and register contributions are 1/2^rho — exact binary
    * fractions, so both engines sum identical doubles. Spark's own
    * `approx_count_distinct` is also HLL but its sketch internals are
    * engine-private and unverifiable; this one is reproducible anywhere.
    *
    * Scale shape: distinct-(source, hash) is one shuffle, then the
    * register fold is an O(m)-state aggregate (map-side combinable) —
    * the same merge-by-max associativity real HLL relies on. The
    * small-range linear-counting branch (E ≤ 2.5m with empty registers)
    * uses `ln` — the one non-exact float op — and does not trigger on
    * corpora with ≥ ~10·m distinct values per group (all fixtures). */
  def sketchHll(s: SparkSession, d: String): DataFrame = {
    val hashed = shingleHashes(s, d).distinct()
    hashed
      .withColumn("idx", expr(s"th >> $SuffixBits"))
      .withColumn("v", expr(s"th & ${(1L << SuffixBits) - 1}"))
      .withColumn("rho", expr(
        s"""CASE WHEN v = 0 THEN ${SuffixBits + 1}
            ELSE $SuffixBits - length(bin(v)) + 1 END"""))
      .groupBy(col("source"), col("idx"))
      .agg(max(col("rho")).as("rho"), count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_exact"),
        count(lit(1)).as("m_used"),
        sum(expr("1.0 / cast(shiftleft(1L, rho) as double)")).as("s_used"))
      .select(
        col("source"), col("n_exact"),
        expr(
          s"""round(CASE WHEN $HllAlphaM2 / (s_used + ($HllM - m_used) * 1.0)
                           <= 2.5 * $HllM AND m_used < $HllM
                    THEN $HllM * ln($HllM / cast($HllM - m_used as double))
                    ELSE $HllAlphaM2 / (s_used + ($HllM - m_used) * 1.0)
                    END, 2)""").as("hll_est"))
  }

  /** Same shared hash CTE as the KMV oracles; the HLL register fold in
    * DuckDB SQL, generated from the same constants. */
  def sketchHllOracle: String =
    s"""WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks
                   FROM documents),
        sh AS (SELECT source,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [text] END) AS shingles
               FROM t),
        h AS (SELECT DISTINCT source,
                unnest(list_transform(shingles,
                  x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)) AS th
              FROM sh),
        b AS (SELECT source, th >> $SuffixBits AS idx,
                th & ${(1L << SuffixBits) - 1} AS v
              FROM h),
        r AS (SELECT source, idx,
                CASE WHEN v = 0 THEN ${SuffixBits + 1}
                     ELSE $SuffixBits - length(bin(v)) + 1 END AS rho
              FROM b),
        reg AS (SELECT source, idx, max(rho) AS rho, count(*) AS cnt
                FROM r GROUP BY 1, 2),
        g AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_exact,
                count(*) AS m_used,
                sum(1.0 / CAST(1::BIGINT << rho AS DOUBLE)) AS s_used
              FROM reg GROUP BY source)
        SELECT source, n_exact,
               round(CASE WHEN $HllAlphaM2 / (s_used + ($HllM - m_used) * 1.0)
                              <= 2.5 * $HllM AND m_used < $HllM
                     THEN $HllM * ln($HllM / CAST($HllM - m_used AS DOUBLE))
                     ELSE $HllAlphaM2 / (s_used + ($HllM - m_used) * 1.0)
                     END, 2) AS hll_est
        FROM g ORDER BY source"""

  def sketchDistinctOracle: String =
    s"""WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks
                   FROM documents),
        sh AS (SELECT source,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [text] END) AS shingles
               FROM t),
        h AS (SELECT DISTINCT source,
                unnest(list_transform(shingles,
                  x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)) AS th
              FROM sh),
        r AS (SELECT source, th,
                row_number() OVER (PARTITION BY source ORDER BY th) AS rn
              FROM h),
        ex AS (SELECT source, count(*) AS n_exact FROM h GROUP BY source),
        kk AS (SELECT source, th AS h_k FROM r WHERE rn = $K)
        SELECT ex.source, n_exact,
               CASE WHEN h_k IS NULL THEN CAST(n_exact AS DOUBLE)
                    ELSE round(($K - 1) * $HashSpace / h_k, 2) END AS kmv_est
        FROM ex LEFT JOIN kk ON ex.source = kk.source
        ORDER BY ex.source"""

  /** Same CTE chain as [[sketchDistinctOracle]], estimate only. */
  def sketchKmvOracle: String =
    s"""WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks
                   FROM documents),
        sh AS (SELECT source,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [text] END) AS shingles
               FROM t),
        h AS (SELECT DISTINCT source,
                unnest(list_transform(shingles,
                  x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)) AS th
              FROM sh),
        r AS (SELECT source, th,
                row_number() OVER (PARTITION BY source ORDER BY th) AS rn
              FROM h),
        ex AS (SELECT source, count(*) AS n_exact FROM h GROUP BY source),
        kk AS (SELECT source, th AS h_k FROM r WHERE rn = $K)
        SELECT ex.source,
               CASE WHEN h_k IS NULL THEN CAST(n_exact AS DOUBLE)
                    ELSE round(($K - 1) * $HashSpace / h_k, 2) END AS kmv_est
        FROM ex LEFT JOIN kk ON ex.source = kk.source
        ORDER BY ex.source"""

  /** Count-min sketch geometry: [[CmsDepth]] independent md5-derived hash
    * rows × [[CmsWidth]] counters. Width is deliberately SMALL relative
    * to the fixture vocabulary so collisions (and therefore nonzero
    * overcounts) are actually exercised, not just theoretically possible. */
  private val CmsDepth = 4
  private val CmsWidth = 256

  /** Count-min sketch heavy hitters over the token stream — the classic
    * bounded-memory frequency sketch: each occurrence increments one
    * counter per hash row; estimate(t) = min over rows of the counter t
    * hashes to, always ≥ the true count. Returns the top 20 tokens by
    * estimate (token tie-break) with their true counts and overcounts.
    *
    * Deterministic by construction: hashes are md5-derived, counters are
    * exact integers — the DuckDB oracle rebuilds the SAME sketch
    * bit-for-bit (unlike Spark's private `count_min_sketch` binary).
    *
    * Scale shape: the corpus is touched ONCE — the (term, tf) aggregate
    * (map-side-combinable, one shuffle on term). The cell matrix is then
    * built from that VOCAB-scale relation (each cell's counter = sum of
    * the tf of the terms hashing into it — identical to counting
    * occurrences directly, at 1/corpus-size the explode cost), collapsing
    * to depth·width = 1024 rows of constant, mergeable state (the point
    * of CMS over exact counting); the probe joins vocab×depth rows to
    * the tiny cell table on (row, cell). Nothing after the first
    * aggregate is corpus-scale. */
  /** The shared md5 cell rule: term × hash-row index → counter column. */
  private def cellExpr(termCol: String, jCol: String): String =
    s"""cast(conv(substring(md5(concat($termCol, ':cms:',
          cast($jCol as string))), 1, 8), 16, 10) as bigint) % $CmsWidth"""

  /** Count-min cell counters for a raw term frame — the STREAMABLE face
    * of [[sketchCms]]: groupBy (row, cell) count is an incrementally
    * maintainable aggregation with constant depth·width state, so the
    * same expression runs over a batch frame or a `readStream`
    * (Update/Complete mode) and the sketch merges across micro-batches
    * by construction (spec-verified equal to the one-shot batch sketch). */
  def cmsCells(terms: DataFrame, termCol: String): DataFrame =
    terms
      .select(explode(expr(
        s"""transform(sequence(0, ${CmsDepth - 1}),
              j -> struct(j AS j, ${cellExpr(termCol, "j")} AS cell))"""))
        .as("jc"))
      .groupBy(col("jc.j").as("j"), col("jc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))

  def sketchCms(s: SparkSession, d: String): DataFrame = {
    // vocab-scale; used on both the build and probe sides, so eager-cache
    // (at 100 TB this is the persisted term-frequency table)
    val truth = DedupQueries.eager(
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("true_cnt")))
    val probed = truth
      .select(col("term"), col("true_cnt"),
        explode(expr(s"sequence(0, ${CmsDepth - 1})")).as("j"))
      .withColumn("cell", expr(cellExpr("term", "j")))
    val cells = probed
      .groupBy(col("j"), col("cell"))
      .agg(sum(col("true_cnt")).as("cnt"))
    probed
      .join(cells, Seq("j", "cell"))
      .groupBy(col("term"))
      .agg(min(col("cnt")).as("est_cnt"), min(col("true_cnt")).as("true_cnt"))
      .withColumn("overcount", col("est_cnt") - col("true_cnt"))
      .orderBy(col("est_cnt").desc, col("term"))
      .limit(20)
      .select(col("term"), col("est_cnt"), col("true_cnt"), col("overcount"))
  }

  /** Bloom filter geometry: [[BloomBits]]-bit array, [[BloomHashes]]
    * md5-derived set bits per key. Sized so the fixture holdout (~5% of
    * docs) yields a visible-but-small false-positive rate. */
  private val BloomBits = 4096
  private val BloomHashes = 3

  /** Bloom-filter semi-join prefilter — the scale path for
    * membership-style joins (the decontamination shape: "which corpus
    * docs might be in the eval holdout?"). Build side = distinct
    * fingerprints of the 5% hash-holdout; the filter is ONE distinct
    * aggregate down to ≤ [[BloomBits]] set-bit positions (constant-size,
    * broadcastable state — exactly the bloom-pruning engines push into
    * scans); probing is a narrow per-row hash + a broadcast join. The
    * exact semi-join runs here ONLY to measure the false-positive rate
    * per source; a production pipeline would run it solely on the
    * bloom-surviving fraction. No false negatives by construction
    * (`n_true` rows are always `maybe` — asserted in the spec).
    *
    * Deterministic: positions are md5-derived integers, so the DuckDB
    * oracle rebuilds the same filter bit-for-bit. */
  def sketchBloom(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("fp", md5(col("text")))
      .withColumn("hold", expr(
        """cast(conv(substring(md5(concat(cast(doc_id as string),
           ':bloomhold')), 1, 8), 16, 10) as bigint) % 100 < 5"""))
    val evalFps = docs.filter(col("hold")).select(col("fp")).distinct()
    bloomPrefilter(evalFps, docs, "fp")
      .join(evalFps.withColumn("tr", lit(1)), Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("bloom_maybe"), 1L).otherwise(0L)).as("n_maybe"),
        sum(when(col("tr") === 1, 1L).otherwise(0L)).as("n_true"),
        sum(when(col("bloom_maybe") && col("tr").isNull, 1L).otherwise(0L))
          .as("n_false_pos"))
  }

  /** The general Bloom prefilter behind [[sketchBloom]] — library API:
    * tag every `probe` row with `bloom_maybe`, true iff `keyCol` MIGHT
    * appear among `build`'s keys (never a false negative). The filter is
    * materialized as its REAL representation — an m-bit bitmap packed
    * into m/64 long words, collected once (constant-size driver
    * metadata, the same way engines ship bloom filters into scans) and
    * embedded as an array literal — so each probe is `hashes` O(1) bit
    * tests in one narrow codegen'd expression: no join, no shuffle, no
    * per-row explode. Keys hash through their canonical string form on
    * both sides. */
  def bloomPrefilter(build: DataFrame, probe: DataFrame, keyCol: String,
      bits: Int = BloomBits, hashes: Int = BloomHashes): DataFrame = {
    require(bits > 0 && bits % 64 == 0, s"bits must be a multiple of 64: $bits")
    def posArr(c: String): String =
      s"""array_distinct(transform(sequence(0, ${hashes - 1}), j ->
            cast(conv(substring(md5(concat(CAST($c AS STRING), ':b',
              cast(j as string))), 1, 8), 16, 10) as bigint) % $bits))"""
    val words = new Array[Long](bits / 64)
    build.select(col(keyCol).as("k")).na.drop()
      .select(explode(expr(posArr("k"))).as("pos")).distinct()
      .collect()
      .foreach { r =>
        val p = r.getLong(0)
        words((p >> 6).toInt) |= 1L << (p & 63)
      }
    val wordArr = words.mkString("array(", "L, ", "L)")
    probe.withColumn("bloom_maybe", expr(
      s"""forall(${posArr(keyCol)}, p ->
            ((shiftright(element_at($wordArr, CAST(p DIV 64 AS INT) + 1),
              CAST(p % 64 AS INT))) & 1) = 1)"""))
  }

  /** DuckDB oracle for [[sketchBloom]] — same geometry, same md5 position
    * rule. */
  def sketchBloomOracle: String =
    s"""WITH dd AS (SELECT doc_id, source, md5(text) AS fp,
              ('0x' || substr(md5(doc_id || ':bloomhold'), 1, 8))::BIGINT
                % 100 < 5 AS hold
            FROM documents),
        pp AS (SELECT doc_id, source, fp, hold,
                 list_distinct(list_transform(range(0, $BloomHashes),
                   j -> ('0x' || substr(md5(fp || ':b' || j), 1, 8))::BIGINT
                        % $BloomBits)) AS parr
               FROM dd),
        ev AS (SELECT DISTINCT fp FROM dd WHERE hold),
        bits AS (SELECT DISTINCT
                   unnest(list_distinct(list_transform(range(0, $BloomHashes),
                     j -> ('0x' || substr(md5(fp || ':b' || j), 1, 8))::BIGINT
                          % $BloomBits))) AS pos
                 FROM ev),
        pr AS (SELECT doc_id, source, fp, len(parr) AS n_pos,
                 unnest(parr) AS pos
               FROM pp),
        hits AS (SELECT doc_id, source, fp, n_pos,
                   sum(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END)
                     AS n_hits
                 FROM pr LEFT JOIN bits ON pr.pos = bits.pos
                 GROUP BY 1, 2, 3, 4),
        fl AS (SELECT h.doc_id, h.source, (n_hits = n_pos) AS maybe,
                 (ev.fp IS NOT NULL) AS tr
               FROM hits h LEFT JOIN ev ON h.fp = ev.fp)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_maybe,
               CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
               CAST(sum(CASE WHEN maybe AND NOT tr THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_false_pos
        FROM fl GROUP BY source ORDER BY source"""

  /** DuckDB oracle for [[sketchCms]] — same geometry constants, same md5
    * cell rule, so the sketch is rebuilt identically. */
  def sketchCmsOracle: String =
    s"""WITH occ AS (SELECT unnest(string_split(text, ' ')) AS term
                     FROM documents),
        js AS (SELECT unnest(range(0, $CmsDepth)) AS j),
        jc AS (SELECT term, j,
                 ('0x' || substr(md5(term || ':cms:' || j), 1, 8))::BIGINT
                   % $CmsWidth AS cell
               FROM occ CROSS JOIN js),
        cells AS (SELECT j, cell, count(*) AS cnt FROM jc GROUP BY j, cell),
        truth AS (SELECT term, count(*) AS true_cnt FROM occ GROUP BY term),
        probe AS (SELECT term, true_cnt, j,
                    ('0x' || substr(md5(term || ':cms:' || j), 1, 8))::BIGINT
                      % $CmsWidth AS cell
                  FROM truth CROSS JOIN js),
        est AS (SELECT term, min(cnt) AS est_cnt, min(true_cnt) AS true_cnt
                FROM probe JOIN cells USING (j, cell) GROUP BY term)
        SELECT term, est_cnt, true_cnt, est_cnt - true_cnt AS overcount
        FROM est ORDER BY est_cnt DESC, term LIMIT 20"""

  // ---- X137: mergeable relative-error quantile sketch -------------------

  /** Sub-bucket bits per octave: 2^7 = 128 linear sub-buckets, so the
    * bucket width at value v is ≤ v·2⁻⁷ and any quantile estimate is
    * within 0.79% of the true value (≤ 2⁻⁷, midpoint halves it). */
  private[ext] val QSubBits = 7
  private[ext] val QExact: Long = 1L << QSubBits

  /** Bucket id of positive long `vCol` in a log₂-octave histogram with
    * [[QSubBits]] linear sub-buckets per octave — the DDSketch /
    * log-histogram shape in PURE INTEGER arithmetic (octave = binary
    * bit-length via `bin()`, sub-bucket = an integer shift-divide), so
    * Spark and the DuckDB oracle agree bit-for-bit (a float `log()`
    * bucketing flips ids at representation boundaries). Values below
    * 2^[[QSubBits]] are their own bucket (the exact region); ids are
    * monotone in v, so per-bucket counts ordered by id ARE the
    * distribution. */
  private[ext] def quantileBucket(vCol: String): String =
    quantileBucket(vCol, QSubBits)

  /** [[quantileBucket]] at an explicit sub-bit width `k` — the
    * error/size knob ([[graft.tools.QuantileErr]] measures the trade;
    * the oracle queries pin k = [[QSubBits]]). */
  private[graft] def quantileBucket(vCol: String, k: Int): String = {
    val ex = 1L << k
    s"""CASE WHEN $vCol < $ex THEN $vCol
        ELSE (length(bin($vCol)) - $k) * $ex
             + ($vCol - cast(pow(2, length(bin($vCol)) - 1) as bigint))
               div cast(pow(2, length(bin($vCol)) - 1 - $k) as bigint)
        END"""
  }

  /** Midpoint representative value of bucket `b` — the estimate a
    * quantile lookup returns. Inverts [[quantileBucket]]: octave
    * o = b div 2^k carries width 2^(o-1), lower bound 2^(o+k-1) +
    * (b mod 2^k)·2^(o-1). */
  private[ext] def quantileEstimate(b: String): String =
    quantileEstimate(b, QSubBits)

  private[graft] def quantileEstimate(b: String, k: Int): String = {
    val ex = 1L << k
    s"""CASE WHEN $b < $ex THEN $b
        ELSE cast(pow(2, ($b div $ex) + $k - 1) as bigint)
             + ($b % $ex) * cast(pow(2, ($b div $ex) - 1) as bigint)
             + (cast(pow(2, ($b div $ex) - 1) as bigint) - 1) div 2
        END"""
  }

  /** Per-group quantile SKETCH over a positive long metric: one
    * groupBy(group, bucket) count — the sketch IS that tiny relation
    * (≤ 128·octaves rows per group, here ~2.5k for a 24-octave cents
    * domain vs millions of rows), and MERGING sketches is bucket-wise
    * count addition (associative, partial-aggregation-friendly), which
    * is what exact percentiles can never offer at 100 TB: they need the
    * values. Quantile lookup walks the cumulative counts (a window over
    * the BUCKET-domain relation, partitioned by group — never
    * row-scale) and returns the target bucket's midpoint. */
  private[ext] def quantileSketchOf(rows: DataFrame, grpCol: String,
      vCol: String): DataFrame =
    rows.withColumn("bid", expr(quantileBucket(vCol)))
      .groupBy(col(grpCol), col("bid"))
      .agg(count(lit(1)).as("c"))

  /** `q_sketch_quantile`: p50/p90/p99 of l_extendedprice (as exact
    * cents) per returnflag from the mergeable sketch. Bounded relative
    * error (≤2⁻⁷), bit-exact against the oracle's integer replay —
    * [[SketchQuantileSpec]] proves the error bound vs true percentiles
    * and merge associativity. */
  def sketchQuantile(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d).select(col("l_returnflag").as("grp"),
      expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("v"))
    quantilesOf(eagerCache(quantileSketchOf(base, "grp", "v")))
  }

  /** p50/p90/p99 read off a `(grp, bid, c)` sketch relation: one
    * cumulative window over the BUCKET-domain rows (per group — never
    * row-scale) and a conditional-min per target rank (ceil(q·n),
    * integer arithmetic). Output (grp, n, n_buckets, p50, p90, p99). */
  private[ext] def quantilesOf(sk: DataFrame): DataFrame = {
    val cum = sk.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("grp")).orderBy(col("bid"))))
    val n = sk.groupBy(col("grp"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_buckets"))
    cum.join(n, Seq("grp"))
      .groupBy(col("grp"))
      .agg(
        first(col("n")).as("n"),
        first(col("n_buckets")).as("n_buckets"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("bid"))).as("b50"),
        min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("bid"))).as("b90"),
        min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("bid"))).as("b99"))
      .select(col("grp"), col("n"), col("n_buckets"),
        expr(quantileEstimate("b50")).as("p50"),
        expr(quantileEstimate("b90")).as("p90"),
        expr(quantileEstimate("b99")).as("p99"))
  }

  /** Signed per-(group, bucket) count delta from a
    * `changes(..., updateImages = true)` slice — the sketch is
    * SELF-MAINTAINABLE under insert/update/delete with only the feed
    * (bucket counts are signed sums), which exact percentiles never
    * are: a deleted value forces them back to the base table, a deleted
    * bucket increment is just −1 here. */
  private[ext] def quantileSketchDelta(cdf: DataFrame, grpCol: String,
      vCol: String): DataFrame =
    cdf
      .withColumn("_sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .withColumn("bid", expr(quantileBucket(vCol)))
      .groupBy(col(grpCol).as("grp"), col("bid"))
      .agg(sum(col("_sign")).as("dc"))

  /** Fold a signed delta into a `(grp, bid, c)` sketch; emptied buckets
    * drop out, new buckets appear. */
  private[ext] def applySketchDelta(sk: DataFrame,
      delta: DataFrame): DataFrame =
    sk.join(delta, Seq("grp", "bid"), "full_outer")
      .select(col("grp"), col("bid"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("c"))
      .filter(col("c") > 0)

  /** `q_sketch_quantile_mv` — X137 composed with the CDF machinery
    * (X60/X74): a per-status quantile sketch over order-price cents is
    * materialized ONCE, then maintained purely from the change feed
    * across a MERGE wave (updates %4: +1000 cents, re-keyed inserts
    * %6=3: +777) and a DELETE (%9) — the base table is never
    * rescanned. The returned quantiles come from the MAINTAINED sketch;
    * the oracle computes them from a direct sketch of the replayed
    * final state — hash equality IS the self-maintainability proof,
    * and it is exactly the monitoring loop a 100 TB pipeline runs
    * (latency/price/size percentiles per partition, refreshed from
    * deltas, never recomputed). */
  def sketchQuantileMv(s: SparkSession, d: String): DataFrame = {
    val base = graft.Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderstatus").as("grp"),
      expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("v"))
    val t = graft.lake.MergeTable(s,
      java.nio.file.Files.createTempDirectory("graft_q_qmv").toString)
    val v1 = t.overwrite(base)
    var sk = quantileSketchOf(t.read(), "grp", "v")
    val upd = base.filter(col("o_orderkey") % 4 === 0)
      .withColumn("v", col("v") + 1000L)
    val ins = base.filter(col("o_orderkey") % 6 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("v", col("v") + 777L)
    val v2 = t.merge(upd.unionByName(ins), "o_orderkey")
    sk = applySketchDelta(sk, quantileSketchDelta(
      t.changes(v1, v2, "o_orderkey", updateImages = true), "grp", "v"))
    val v3 = t.delete(col("o_orderkey") % 9 === 0)
    sk = applySketchDelta(sk, quantileSketchDelta(
      t.changes(v2, v3, "o_orderkey", updateImages = true), "grp", "v"))
    quantilesOf(eagerCache(sk))
  }

  def sketchQuantileMvOracle: String = {
    def bid(v: String) = quantileBucket(v).replace(" div ", " // ")
    def est(b: String) = quantileEstimate(b).replace(" div ", " // ")
    s"""WITH base AS (
          SELECT o_orderkey, o_orderstatus AS grp,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
          FROM orders),
        upd AS (
          SELECT o_orderkey, grp,
                 CASE WHEN o_orderkey % 4 = 0 THEN v + 1000 ELSE v END AS v
          FROM base),
        ins AS (
          SELECT o_orderkey + 100000000 AS o_orderkey, grp, v + 777 AS v
          FROM base WHERE o_orderkey % 6 = 3),
        fin AS (
          SELECT * FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins) u
          WHERE o_orderkey % 9 <> 0),
        bkt AS (SELECT grp, ${bid("v")} AS bid FROM fin),
        sk AS (SELECT grp, bid, CAST(count(*) AS BIGINT) AS c
               FROM bkt GROUP BY grp, bid),
        cum AS (SELECT grp, bid, c,
                  CAST(sum(c) OVER (PARTITION BY grp ORDER BY bid)
                       AS BIGINT) AS cum
                FROM sk),
        nn AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_buckets
               FROM sk GROUP BY grp),
        sel AS (SELECT cum.grp,
                  min(CASE WHEN cum.cum >= (nn.n + 1) // 2
                           THEN cum.bid END) AS b50,
                  min(CASE WHEN cum.cum >= (9 * nn.n + 9) // 10
                           THEN cum.bid END) AS b90,
                  min(CASE WHEN cum.cum >= (99 * nn.n + 99) // 100
                           THEN cum.bid END) AS b99
                FROM cum JOIN nn ON cum.grp = nn.grp GROUP BY cum.grp)
        SELECT nn.grp, nn.n, nn.n_buckets,
               ${est("b50")} AS p50, ${est("b90")} AS p90,
               ${est("b99")} AS p99
        FROM sel JOIN nn ON sel.grp = nn.grp
        ORDER BY nn.grp"""
  }

  private def eagerCache(df: DataFrame): DataFrame = DedupQueries.eager(df)

  def sketchQuantileOracle: String = {
    def bid(v: String) = quantileBucket(v).replace(" div ", " // ")
    def est(b: String) = quantileEstimate(b).replace(" div ", " // ")
    s"""WITH base AS (
          SELECT l_returnflag AS grp,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
          FROM lineitem),
        bkt AS (SELECT grp, ${bid("v")} AS bid FROM base),
        sk AS (SELECT grp, bid, CAST(count(*) AS BIGINT) AS c
               FROM bkt GROUP BY grp, bid),
        cum AS (SELECT grp, bid, c,
                  CAST(sum(c) OVER (PARTITION BY grp ORDER BY bid)
                       AS BIGINT) AS cum
                FROM sk),
        nn AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_buckets
               FROM sk GROUP BY grp),
        sel AS (SELECT cum.grp,
                  min(CASE WHEN cum.cum >= (nn.n + 1) // 2
                           THEN cum.bid END) AS b50,
                  min(CASE WHEN cum.cum >= (9 * nn.n + 9) // 10
                           THEN cum.bid END) AS b90,
                  min(CASE WHEN cum.cum >= (99 * nn.n + 99) // 100
                           THEN cum.bid END) AS b99
                FROM cum JOIN nn ON cum.grp = nn.grp GROUP BY cum.grp)
        SELECT nn.grp, nn.n, nn.n_buckets,
               ${est("b50")} AS p50, ${est("b90")} AS p90,
               ${est("b99")} AS p99
        FROM sel JOIN nn ON sel.grp = nn.grp
        ORDER BY nn.grp"""
  }
}
