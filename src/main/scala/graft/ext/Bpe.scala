package graft.ext

import graft.Checkpoints.Truncate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY INDUCTION over a corpus — the tokenizer-
  * training step of an LLM data pipeline (X15/`q_text_bpe` segments with a
  * fixed rule; this LEARNS the merge table). Classic word-internal BPE:
  * words start as character sequences with an end-of-word marker on the
  * last symbol; each round merges the corpus-wide most frequent adjacent
  * symbol pair into one symbol.
  *
  * Scale shape, per round:
  *   - pair counting is explode→groupBy — ONE shuffle keyed by the pair
  *     (map-side partial aggregation does the heavy lifting; the reduced
  *     relation is vocabulary²-bounded, tiny);
  *   - the argmax pair is a 1-row driver collect (vocabulary-scale
  *     metadata, the same contract as a broadcast variable);
  *   - applying the merge is a NARROW per-word left-to-right fold
  *     (`aggregate` HOF — codegen'd, no UDF, no shuffle);
  *   - per-round `localCheckpoint` truncates the growing lineage so k
  *     rounds never nest k plans (the CC-loop discipline).
  * Real trainers run tens of thousands of merges on a corpus SAMPLE —
  * compose with [[TextQueries.docSample]]'s hash-stable sampling for
  * that; rounds are corpus passes by design, exactly like the reference
  * implementations of record.
  *
  * Determinism: ties on pair frequency break lexicographically, so the
  * learned merge list is a pure function of the corpus. */
object Bpe {

  /** End-of-word marker, appended to a word's LAST character-symbol so
    * word-final and word-internal units stay distinct (the standard
    * construction). Chosen outside the fixtures' alphabet. */
  val Eow = "</w>"

  /** Split `textCol` into words, then each word into its initial symbol
    * sequence: characters, with [[Eow]] appended to the last. One row
    * per word occurrence, column `syms: array<string>`. */
  private[ext] def initialSymbols(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(expr(
        s"""transform(sequence(1, length(w)),
              i -> IF(i = length(w),
                      concat(substring(w, i, 1), '$Eow'),
                      substring(w, i, 1)))""")
        .as("syms"))

  /** Adjacent-pair frequencies of the current segmentation: one explode +
    * one count aggregate (the only shuffle in a round). */
  private[ext] def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(syms) - 2),
             i -> named_struct('a', syms[i], 'b', syms[i + 1]))"""))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))

  /** Merge every left-to-right non-overlapping occurrence of the
    * adjacent pair (a, b) inside a symbol array — a single `aggregate`
    * fold, narrow and codegen'd. Non-overlap matters: in `a a a` with
    * merge (a,a), the FIRST two merge and the third survives, exactly
    * like the reference BPE implementations. */
  private[ext] def mergePair(symsCol: String, a: String, b: String): Column = {
    def lit1(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    expr(
      s"""CASE WHEN size($symsCol) < 2 THEN $symsCol ELSE
           aggregate(
             $symsCol,
             named_struct('out', CAST(array() AS ARRAY<STRING>),
                          'pend', CAST(NULL AS STRING)),
             (acc, x) -> CASE
               WHEN acc.pend IS NULL THEN
                 named_struct('out', acc.out, 'pend', x)
               WHEN acc.pend = '${lit1(a)}' AND x = '${lit1(b)}' THEN
                 named_struct(
                   'out', concat(acc.out, array('${lit1(a)}${lit1(b)}')),
                   'pend', CAST(NULL AS STRING))
               ELSE
                 named_struct('out', concat(acc.out, array(acc.pend)),
                              'pend', x) END,
             acc -> IF(acc.pend IS NULL, acc.out,
                       concat(acc.out, array(acc.pend))))
         END""")
  }

  /** Learn `merges` BPE merge rules from `textCol` of `docs`. Returns
    * the ordered merge list (most frequent first); stops early when no
    * adjacent pair is left. */
  def train(docs: DataFrame, textCol: String, merges: Int): Seq[(String, String)] = {
    require(merges >= 1, "need at least one merge round")
    var words = initialSymbols(docs, textCol).truncated
    val learned = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < merges && !exhausted) {
      // deterministic argmax: count desc, then (a, b) asc
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        learned += ((a, b))
        val next = words.select(mergePair("syms", a, b).as("syms"))
          .truncated
        words.unpersist()
        words = next
      }
      round += 1
    }
    words.unpersist()
    learned.result()
  }

  /** Apply a learned merge list to a corpus: the same narrow fold per
    * rule, in training order (BPE inference). Output: one row per word
    * with its final subword segmentation. */
  def segment(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(initialSymbols(docs, textCol)) { case (df, (a, b)) =>
      df.select(mergePair("syms", a, b).as("syms"))
    }
}
