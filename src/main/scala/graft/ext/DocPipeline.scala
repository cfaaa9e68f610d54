package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline: quality gate → exact
  * dedup → near-dup removal, as one user-facing call. This is the shape
  * the individual operators ([[TextQueries]], [[DedupQueries]]) exist to
  * serve — a corpus goes in, a cleaned corpus + per-stage attrition
  * stats come out.
  *
  * Stage order is the cheap-first rule of large-scale dedup:
  *   1. quality gate — narrow filter, drops junk before anything shuffles;
  *   2. exact dedup — one hash-shuffle, keeps the lowest doc_id per
  *      fingerprint;
  *   3. near-dup removal — MinHash/LSH candidate pairs; from each
  *      surviving pair the higher doc_id is dropped (union-find-free
  *      greedy: transitive chains collapse to their minimum member over
  *      repeated pairs since pairs always point up-id).
  */
object DocPipeline {

  final case class CleanStats(
      input: Long, afterQuality: Long, afterExact: Long, afterNeardup: Long)

  /** The three stage outputs, built LAZILY (no actions). `maxRepRatio`
    * is the Gopher-style boilerplate cutoff: documents whose most
    * frequent bigram takes more than this share of all bigrams drop at
    * the gate. */
  private def stages(s: SparkSession, sfDir: String,
      maxRepRatio: Double): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = graft.Tables.documents(s, sfDir)

    // 1 — quality gate: q_text_quality's pass flag AND the repetition
    // cutoff (both narrow per-doc signals; cheapest stage runs first)
    val quality = TextQueries.textQuality(s, sfDir)
      .filter(col("quality_pass")).select("doc_id")
    val lowRep = TextQueries.textRepetition(s, sfDir)
      .filter(col("rep_ratio") <= maxRepRatio).select("doc_id")
    val kept1 = docs.join(quality, Seq("doc_id"), "left_semi")
      .join(lowRep, Seq("doc_id"), "left_semi")

    // 2 — exact dedup: keep the canonical (lowest) doc_id per fingerprint
    val canonical = DedupQueries.dedupExact(s, sfDir).select(
      col("canonical_id").as("doc_id"))
    val kept2 = kept1.join(canonical, Seq("doc_id"), "left_semi")

    // 3 — near-dup removal: drop the higher id of every verified pair,
    // restricted to pairs whose BOTH sides survived stages 1-2. If the
    // lower-id partner was already dropped (quality/exact-dup), doc_b is
    // the last surviving copy of that content and must stay.
    val keptIds = kept2.select("doc_id")
    val survivingPairs = DedupQueries.docNeardup(s, sfDir)
      .join(keptIds.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
      .join(keptIds.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
    val losers = survivingPairs.select(col("doc_b").as("doc_id")).distinct()
    val kept3 = kept2.join(losers, Seq("doc_id"), "left_anti")
    (docs, kept1, kept2, kept3)
  }

  /** The cleaned corpus as ONE lazy plan — no stats actions; use this
    * when only the output matters (the `q_doc_pipeline` bench entry). */
  def cleanedCorpus(s: SparkSession, sfDir: String,
      maxRepRatio: Double = 0.2): DataFrame =
    stages(s, sfDir, maxRepRatio)._4

  /** Returns (cleaned corpus, attrition stats); the stats cost one
    * count() action per stage. */
  def clean(s: SparkSession, sfDir: String,
      maxRepRatio: Double = 0.2): (DataFrame, CleanStats) = {
    val (docs, kept1, kept2, kept3) = stages(s, sfDir, maxRepRatio)
    (kept3, CleanStats(docs.count(), kept1.count(), kept2.count(),
      kept3.count()))
  }

  /** DuckDB oracle for the COMPOSED pipeline — the stage CTEs of
    * `q_text_quality`, `q_text_repetition`, `q_dedup_exact`, and
    * `q_doc_neardup` (via [[DedupQueries.candCte]], so the LSH hash
    * family is shared by construction) chained into one statement with
    * the same kept1→kept2→kept3 attrition as [[stages]]. The repetition
    * gate compares the ROUNDED rep_ratio, exactly like the Spark side
    * (which filters on textRepetition's round(...,4) column). */
  def pipelineOracle(maxRepRatio: Double = 0.2): String =
    s"""${pipelineCtes(maxRepRatio)}
        SELECT d.doc_id, d.source, d.n_chars FROM documents d
        WHERE d.doc_id IN (SELECT doc_id FROM kept2)
          AND d.doc_id NOT IN (SELECT doc_id FROM losers)
        ORDER BY d.doc_id"""

  /** The pipeline's CTE chain alone (ends with `kept2` + `losers`), for
    * composition into larger statements ([[assembledPacksOracle]]). */
  private def pipelineCtes(maxRepRatio: Double): String = {
    val nh = DedupQueries.NumHashes
    s"""${DedupQueries.candCte},
        quality AS (
          SELECT doc_id FROM (
            SELECT doc_id, len(toks) AS n_tokens,
                   CAST(len(list_filter(toks,
                     t -> t IN ('the', 'a', 'and', 'is', 'of'))) AS DOUBLE)
                     / len(toks) AS stop_ratio_raw,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     AS ttr_raw
            FROM t) u
          WHERE n_tokens >= 20 AND stop_ratio_raw <= 0.5
            AND ttr_raw >= 0.05),
        bg AS (SELECT doc_id,
                 unnest(CASE WHEN len(toks) >= 2
                   THEN list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])
                   ELSE [text] END) AS bigram
               FROM t),
        bgc AS (SELECT doc_id, bigram, count(*) AS cnt
                FROM bg GROUP BY 1, 2),
        lowrep AS (SELECT doc_id FROM bgc GROUP BY doc_id
                   HAVING round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 4)
                          <= $maxRepRatio),
        kept2 AS (
          SELECT doc_id FROM documents
          WHERE doc_id IN (SELECT doc_id FROM quality)
            AND doc_id IN (SELECT doc_id FROM lowrep)
            AND doc_id IN (SELECT min(doc_id) FROM documents
                           GROUP BY md5(text))),
        losers AS (
          SELECT DISTINCT doc_b AS doc_id
          FROM (SELECT doc_a, doc_b,
                  len(list_filter(range(1, ${nh + 1}),
                      i -> a.sig[i] = b.sig[i])) AS n_eq
                FROM cand
                JOIN sig a ON doc_a = a.doc_id
                JOIN sig b ON doc_b = b.doc_id) p
          WHERE n_eq * 2 >= $nh
            AND doc_a IN (SELECT doc_id FROM kept2)
            AND doc_b IN (SELECT doc_id FROM kept2))"""
  }

  /** End-to-end corpus ASSEMBLY: the cleaned corpus flowing straight
    * into sequence packing ([[TextQueries.packOf]]) — clean → pack as
    * ONE lazy composed plan, the full prep line from raw documents to
    * the training-sequence manifest. Attrition happens before the
    * packing window ever sees a row, so the expensive stages run on the
    * smallest possible relation. */
  def assembledPacks(s: SparkSession, sfDir: String,
      maxRepRatio: Double = 0.2): DataFrame =
    TextQueries.packOf(
      cleanedCorpus(s, sfDir, maxRepRatio)
        .select(col("source"), col("doc_id"),
          expr("size(split(text, ' '))").as("n_tokens")))

  /** The FULL curation line: clean (X17) → eval-holdout exclusion +
    * decontamination over the CLEANED corpus (X55's machinery via
    * [[DedupQueries.evalExcluded]]) → sequence packing (X82). What X92
    * packs is "everything that survived cleaning"; what a TRAINING run
    * actually packs is that minus the eval holdout and minus every doc
    * contaminated by it — this operator is that corpus, as ONE lazy
    * composed plan (the chunk relation is built from cleaned docs only,
    * so decontamination work tracks post-attrition size). */
  def curatedPacks(s: SparkSession, sfDir: String,
      maxRepRatio: Double = 0.2): DataFrame = {
    // cleaned feeds BOTH the exclusion side and the anti-join left side
    // — eager-cache it or the whole attrition pipeline (LSH included)
    // runs twice (measured ~2× the query)
    val cleaned = DedupQueries.eager(cleanedCorpus(s, sfDir, maxRepRatio))
    val excluded = DedupQueries.evalExcluded(cleaned)
    TextQueries.packOf(
      cleaned.join(excluded, Seq("doc_id"), "left_anti")
        .select(col("source"), col("doc_id"),
          expr("size(split(text, ' '))").as("n_tokens")))
  }

  /** DuckDB oracle for [[curatedPacks]] — pipeline CTEs + the chunk/
    * holdout CTEs rewritten over the cleaned corpus + the shared pack
    * rule. */
  def curatedPacksOracle(maxRepRatio: Double = 0.2): String = {
    val budget = TextQueries.PackBudget
    val shards = TextQueries.PackShards
    s"""${pipelineCtes(maxRepRatio)},
        cl0 AS (
          SELECT d.doc_id, d.source, d.text
          FROM documents d
          WHERE d.doc_id IN (SELECT doc_id FROM kept2)
            AND d.doc_id NOT IN (SELECT doc_id FROM losers)),
        tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM cl0),
        ck AS (SELECT doc_id,
                 unnest(list_transform(
                   range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
                   i -> md5(array_to_string(
                          toks[(i * 10 + 1):(i * 10 + 10)], ' ')))) AS fp
               FROM tk),
        ev AS (SELECT doc_id,
                 ('0x' || substr(md5(doc_id || ':eval'), 1, 8))::BIGINT
                   % 100 < 5 AS is_eval
               FROM cl0),
        cke AS (SELECT ck.doc_id, fp, is_eval
                FROM ck JOIN ev ON ck.doc_id = ev.doc_id),
        efp AS (SELECT DISTINCT fp FROM cke WHERE is_eval),
        excl AS (SELECT doc_id FROM ev WHERE is_eval
                 UNION
                 SELECT DISTINCT doc_id FROM cke
                 WHERE NOT is_eval AND fp IN (SELECT fp FROM efp)),
        cleaned AS (
          SELECT c.source, c.doc_id,
                 len(string_split(c.text, ' ')) AS n_tokens,
                 c.doc_id % $shards AS pshard
          FROM cl0 c
          WHERE c.doc_id NOT IN (SELECT doc_id FROM excl)),
        cum AS (
          SELECT source, pshard, doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source, pshard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev_cum
          FROM cleaned)
        SELECT source, pshard,
               CAST(FLOOR(prev_cum / $budget.0) AS BIGINT) AS pack_id,
               count(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM cum GROUP BY source, pshard, pack_id
        ORDER BY source, pshard, pack_id"""
  }

  /** DuckDB oracle for [[assembledPacks]] — the pipeline CTE chain plus
    * the SAME shard/window/floor pack rule as `q_doc_pack`, generated
    * from the shared constants. */
  def assembledPacksOracle(maxRepRatio: Double = 0.2): String = {
    val budget = TextQueries.PackBudget
    val shards = TextQueries.PackShards
    s"""${pipelineCtes(maxRepRatio)},
        cleaned AS (
          SELECT d.source, d.doc_id,
                 len(string_split(d.text, ' ')) AS n_tokens,
                 d.doc_id % $shards AS pshard
          FROM documents d
          WHERE d.doc_id IN (SELECT doc_id FROM kept2)
            AND d.doc_id NOT IN (SELECT doc_id FROM losers)),
        cum AS (
          SELECT source, pshard, doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source, pshard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev_cum
          FROM cleaned)
        SELECT source, pshard,
               CAST(FLOOR(prev_cum / $budget.0) AS BIGINT) AS pack_id,
               count(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM cum GROUP BY source, pshard, pack_id
        ORDER BY source, pshard, pack_id"""
  }
}
