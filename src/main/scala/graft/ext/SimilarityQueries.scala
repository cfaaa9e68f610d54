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
  private def dot(a: String, b: String): String = s"dot_f($a, $b)"

  /** Corpus with precomputed L2 norms (one narrow pass). */
  private def normed(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    embeddings(s, d)
      .withColumn("nrm", expr(s"sqrt(${dot("embedding", "embedding")})"))
  }

  /** Brute-force cosine top-5 for query vectors vec_id < 10. */
  def embedTopk(s: SparkSession, d: String): DataFrame = {
    val e = normed(s, d)
    val q = e.filter(col("vec_id") < 10)
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
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** IVF two-stage: 8 seed centroids (vec_id < 8 — deterministic, the
    * fixture ids are cluster-shuffled), assign all vectors by max cosine
    * (tie → lowest centroid id), then top-3 in-cell neighbors for query
    * vectors 8 ≤ vec_id < 28. */
  def embedIvf(s: SparkSession, d: String): DataFrame = {
    val cells = DedupQueries.eager(assignedCells(s, d))
    val q = cells.filter(col("vec_id") >= 8 && col("vec_id") < 28)
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
    * space instead of token space). Candidates = pairs sharing an IVF cell
    * (bucketed equi-join on cell id, never all-pairs); verify = exact
    * cosine ≥ 0.4 (the fixtures plant no true high-cosine dups — 0.4 keeps
    * the verify stage demonstrably exercised: ~20 surviving pairs at
    * sf0.01). */
  def embedNeardup(s: SparkSession, d: String): DataFrame = {
    val cells = DedupQueries.eager(assignedCells(s, d))
    cells.as("a")
      .join(cells.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        expr(s"round(${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6)"))
      .filter(col("cos") >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.cell").as("cell"), col("cos"))
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
    val b = DedupQueries.eager(bucketed(s, d))
    val probeList = "bucket" +: (if (multiProbe)
      Planes.indices.map(j => s"bucket ^ ${1 << j}") else Seq.empty[String])
    val q = b.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        explode(expr(s"array(${probeList.mkString(", ")})")).as("bucket"),
        col("embedding").as("qvec"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    b.select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("embedding").as("cvec"), col("nrm").as("cnrm"))
      .join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        expr(s"round(${dot("qvec", "cvec")} / (qnrm * cnrm), 6)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("sim"),
        col("rank"))
  }

  /** Corpus with the 8-bit hyperplane-sign bucket attached (narrow). */
  private def bucketed(s: SparkSession, d: String): DataFrame = {
    val bits = Planes.zipWithIndex.map { case (p, j) =>
      val arr = s"CAST(array(${p.mkString(", ")}) AS ARRAY<FLOAT>)"
      s"IF(${dot("embedding", arr)} >= 0, ${1 << j}, 0)"
    }
    normed(s, d).withColumn("bucket", expr(bits.mkString(" + ")))
  }

  /** 8 Rademacher hyperplanes over 64 dims from a fixed xorshift64 seed —
    * deterministic, engine-neutral (only the literals ±1 cross engines). */
  private[ext] val Planes: Seq[Seq[Int]] = {
    var x = 88172645463325252L
    Seq.fill(8)(Seq.fill(64) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      if (x >= 0) 1 else -1
    })
  }

  /** Cell assignment shared by [[embedIvf]] and [[embedNeardup]]; callers
    * eager-cache it because they use it on two join sides (at 100 TB this
    * is a persisted intermediate table, not a recompute). */
  private def assignedCells(s: SparkSession, d: String): DataFrame = {
    val e = normed(s, d)
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
        col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    e.crossJoin(broadcast(cent))
      .withColumn("csim",
        expr(s"round(${dot("embedding", "cvec")} / (nrm * cnrm), 6)"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"), col("embedding"),
        col("nrm"))
  }

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

  /** Shared cell-assignment CTE chain (normed corpus → centroids → argmax
    * assignment → `nc` = corpus with cell ids). */
  private val cellsCte: String =
    s"""$normCte,
        cent AS (SELECT vec_id AS cent_id, embedding AS cvec, nrm AS cnrm
                 FROM n WHERE vec_id < 8),
        asg AS (SELECT n.vec_id, cent_id,
                  round(list_sum(list_transform(range(1, len(embedding) + 1),
                          i -> embedding[i]::DOUBLE * cvec[i]::DOUBLE))
                        / (nrm * cnrm), 6) AS csim
                FROM n CROSS JOIN cent),
        cells AS (SELECT vec_id, cent_id AS cell FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id
                                ORDER BY csim DESC, cent_id) AS rn
                    FROM asg) t
                  WHERE rn = 1),
        nc AS (SELECT n.vec_id, cell, embedding, nrm
               FROM n JOIN cells ON n.vec_id = cells.vec_id)"""

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

  def neardupOracle: String =
    s"""$cellsCte
        SELECT vec_a, vec_b, cell, cos FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell AS cell,
                 round(list_sum(list_transform(range(1, len(a.embedding) + 1),
                         i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                       / (a.nrm * b.nrm), 6) AS cos
          FROM nc a JOIN nc b
            ON a.cell = b.cell AND a.vec_id < b.vec_id) t
        WHERE cos >= 0.4 ORDER BY vec_a, vec_b"""
}
