package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance over a [[MergeTable]] —
  * the lakehouse way to keep dimension HISTORY (the reference's customer/
  * product dims overwrite in place, ref: product_etl.py:72-81; SCD2 is
  * what a warehouse team layers on top the moment "what did this product
  * cost in March" becomes a question).
  *
  * Row model: the table carries the source's business columns plus
  *   - [[EffFrom]]: the batch label that opened the row,
  *   - [[EffTo]]:   the label that closed it (null = still open),
  *   - [[Current]]: the open-row flag,
  *   - a surrogate merge key `pk@effFrom`, so each VERSION of a business
  *     key is its own MERGE row.
  *
  * Per batch: a source row whose tracked columns differ from the key's
  * current row (null-safe comparison) CLOSES that row (update in place
  * via its surrogate key) and OPENS a new current one; a brand-new key
  * just opens; an unchanged key touches nothing — re-running the same
  * batch is a no-op (idempotent restart, same as the reference's marker
  * discipline).
  *
  * Scale shape: ONE pk equi-join between the batch and the CURRENT
  * slice (never the history), then one MERGE whose source is only the
  * changed/new rows. Partition the backing table by [[Slice]] so the
  * current-slice read is a log-level partition prune and closing a row
  * is the partition-move MERGE already supports; history files are
  * never rewritten by later batches. Labels must sort lexicographically
  * by time (ISO dates/timestamps) — [[asOfView]] relies on it. */
object Scd2 {
  val EffFrom = "_eff_from"
  val EffTo = "_eff_to"
  val Current = "_current"

  /** Open/closed slice marker, as a STRING so it can serve as the
    * backing table's partition column (hive partition values are
    * strings on disk). Partitioning by it makes every batch's
    * current-slice read a log-level partition prune — history files
    * are never even listed, let alone scanned. */
  val Slice = "_slice"
  val SliceOpen = "open"
  val SliceClosed = "closed"

  private[lake] val SKey = "_scd_key"

  private def stamped(df: DataFrame, pk: String, asOf: String): DataFrame =
    df.withColumn(EffFrom, lit(asOf))
      .withColumn(EffTo, lit(null).cast("string"))
      .withColumn(Current, lit(true))
      .withColumn(Slice, lit(SliceOpen))
      .withColumn(SKey,
        concat(col(pk).cast("string"), lit("@"), lit(asOf)))

  /** The current slice, partition-pruned at the log level when the
    * table is partitioned EXACTLY by [[Slice]] (the recommended
    * layout). The filter sees the manifest-ENCODED partition value —
    * the raw slice string only on a single-column layout, so a
    * multi-column layout (slice × something) must NOT take this path
    * (the encoded tuple would never equal the raw token and the prune
    * would silently drop every file); it reads unpruned instead. */
  private def currentSlice(t: MergeTable): DataFrame = {
    val base =
      if (t.partitionCols == Seq(Slice)) t.read(Some(_ == SliceOpen))
      else t.read()
    base.filter(col(Current))
  }

  /** Apply one source batch labeled `asOf`. Returns the committed
    * version. The first batch on an empty table initializes it. */
  def merge(t: MergeTable, source: DataFrame, pk: String,
      asOf: String): Long = {
    if (t.latestVersion() == 0L) return t.overwrite(stamped(source, pk, asOf))
    val bizCols = source.columns.toSeq
    val tracked = bizCols.filterNot(_ == pk)
    require(tracked.nonEmpty, "SCD2 needs at least one tracked column")
    val j = source.alias("s").join(
      currentSlice(t).alias("c"),
      col(s"s.$pk") === col(s"c.$pk"), "left")
    val isNew = col(s"c.$pk").isNull
    val changed =
      !tracked.map(cn => col(s"s.$cn") <=> col(s"c.$cn")).reduce(_ && _)
    val opened = stamped(
      j.filter(isNew || changed)
        .select(bizCols.map(cn => col(s"s.$cn").as(cn)): _*),
      pk, asOf)
    val closed = j.filter(!isNew && changed)
      .select(bizCols.map(cn => col(s"c.$cn").as(cn)) :+
        col(s"c.$EffFrom").as(EffFrom): _*)
      .withColumn(EffTo, lit(asOf))
      .withColumn(Current, lit(false))
      .withColumn(Slice, lit(SliceClosed))
      .withColumn(SKey,
        concat(col(pk).cast("string"), lit("@"), col(EffFrom)))
    t.merge(opened.unionByName(closed), SKey)
  }

  /** The dimension as of `label` (inclusive): rows opened at or before
    * it and not yet closed at it — point-in-time semantics over sortable
    * batch labels, complementing [[MergeTable.readVersion]]'s physical
    * time travel. */
  def asOfView(t: MergeTable, label: String): DataFrame =
    t.read().filter(col(EffFrom) <= lit(label) &&
      (col(EffTo).isNull || col(EffTo) > lit(label)))

  /** Point-in-time-correct enrichment: join each fact row to the
    * dimension VERSION that was in effect at the fact's own `labelCol`
    * — the leakage-safe feature join for training data (joining today's
    * dimension onto yesterday's facts trains on information the model
    * wouldn't have had; the ML-feature-store "time travel" rule).
    * [[asOfView]] answers one label; this answers every fact's label in
    * one pass.
    *
    * Facts whose label predates the key's first version (or whose key
    * never existed) keep their row with null dimension columns — a
    * training pipeline drops or imputes explicitly, never silently.
    *
    * Scale shape: ONE pk equi-join (the interval predicate piggybacks
    * on it — history rows per key are few, so the per-key interval
    * filter is cheap post-join work, never a range-join explosion);
    * facts stream, history is dimension-sized. Dimension columns win
    * name clashes via the `_dim` suffix only when needed. */
  def pointInTimeJoin(facts: DataFrame, t: MergeTable, pk: String,
      labelCol: String): DataFrame = {
    val hist = t.read()
    val dimCols = hist.columns.filterNot(
      Seq(pk, SKey, Slice).contains(_))
    val factCols = facts.columns.toSet
    val renamed = dimCols.map { c =>
      if (factCols(c)) col(s"h.$c").as(s"${c}_dim") else col(s"h.$c")
    }
    facts.alias("f").join(
      hist.alias("h"),
      col(s"f.$pk") === col(s"h.$pk") &&
        col(s"h.$EffFrom") <= col(s"f.$labelCol") &&
        (col(s"h.$EffTo").isNull ||
          col(s"h.$EffTo") > col(s"f.$labelCol")),
      "left")
      .select(facts.columns.map(c => col(s"f.$c")) ++ renamed: _*)
  }
}
