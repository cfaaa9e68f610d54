package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lakehouse-lite: a partitioned parquet table with ACID-ish versioned
  * commits and join-based MERGE upsert.
  *
  * Re-implements the Delta semantics the reference depends on (no Delta jars
  * ship in this environment — SURVEY §7.3): MERGE
  * `whenMatchedUpdateAll.whenNotMatchedInsertAll` (ref: product_etl.py:72-81,
  * orders_etl.py:82-91, order_items_etl.py:109-118), partitioned overwrite
  * first-load (ref: orders_etl.py:93-96), and time travel (DOC-ONLY,
  * README.md:118 — implemented for real via [[readVersion]]).
  *
  * Layout:
  * {{{
  *   <root>/commit-<version>-<uuid>/<partCol>=<v>/part-*.parquet  (data)
  *   <root>/_graft_log/<version%020d>.txt                         (manifest)
  * }}}
  *
  * A manifest is the FULL list of live files (path TAB partition-value).
  * Commit = write data files to a fresh commit dir, then atomically move a
  * temp manifest to `<nextVersion>.txt` — the move fails if a concurrent
  * writer took that version (optimistic concurrency, retried by re-reading).
  * Readers resolve the highest manifest and see a consistent snapshot;
  * uncommitted data dirs are invisible to them.
  *
  * Scale notes (100 TB stance):
  *  - Only log METADATA ever touches the driver (file names + partition
  *    values) — never row data. Same contract as Delta's log.
  *  - MERGE rewrites only partitions that contain a matching key or receive
  *    an insert (computed with a semi-join, not a full scan collect), so a
  *    merge touching 1 of 10k date partitions rewrites 1/10k of the table.
  *  - Readers prune files from the manifest by partition value before the
  *    scan ([[read(partitionFilter)]]) — log-level partition pruning.
  */
final class MergeTable private (
    val spark: SparkSession,
    val root: Path,
    val partitionCol: Option[String]) {

  import MergeTable._

  private def logDir: Path = root.resolve(LogDir)

  // ---- log ----------------------------------------------------------------

  /** Live (version, entries) of the latest committed manifest. */
  private def latest(): (Long, Seq[FileEntry]) = {
    val v = latestVersion()
    if (v == 0L) (0L, Seq.empty) else (v, readManifest(v))
  }

  def latestVersion(): Long =
    if (!Files.isDirectory(logDir)) 0L
    else Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".txt"))
      .map(_.stripSuffix(".txt").toLong)
      .foldLeft(0L)(math.max)

  private def readManifest(v: Long): Seq[FileEntry] =
    Files.readAllLines(logDir.resolve(f"$v%020d.txt")).asScala.toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val Array(rel, pv) = line.split('\t')
        FileEntry(rel, if (pv == NoPartition) None else Some(pv))
      }

  /** Atomically publish `entries` as the next version after `expected`.
    * Returns the committed version. Retries on version collision. */
  private def commit(entries: Seq[FileEntry], expected: Long): Long = {
    Files.createDirectories(logDir)
    val body = entries
      .map(e => s"${e.relPath}\t${e.partitionValue.getOrElse(NoPartition)}")
      .mkString("\n")
    var v = expected + 1
    while (true) {
      val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}")
      Files.writeString(tmp, body)
      try {
        Files.move(tmp, logDir.resolve(f"$v%020d.txt"),
          StandardCopyOption.ATOMIC_MOVE)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          v = latestVersion() + 1 // lost the race; retry on top
      }
    }
    v
  }

  // ---- write paths --------------------------------------------------------

  /** Write `df` into a fresh commit dir; return its new file entries. */
  private def writeData(df: DataFrame): (String, Seq[FileEntry]) = {
    val commitDir = s"commit-${UUID.randomUUID().toString.take(12)}"
    val target = root.resolve(commitDir)
    partitionCol match {
      case Some(pc) =>
        df.write.partitionBy(pc).mode("overwrite").parquet(target.toString)
      case None =>
        df.write.mode("overwrite").parquet(target.toString)
    }
    val entries = Files.walk(target).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        Files.isRegularFile(p))
      .map { p =>
        val rel = root.relativize(p).toString
        val pv = partitionCol.flatMap { pc =>
          target.relativize(p).iterator().asScala
            .map(_.toString)
            .find(_.startsWith(pc + "="))
            .map(s => unescapePathValue(s.substring(pc.length + 1)))
        }
        FileEntry(rel, pv)
      }.toSeq
    (commitDir, entries)
  }

  /** S5 — full overwrite (the reference's first-load path,
    * ref: orders_etl.py:93-96). */
  def overwrite(df: DataFrame): Long = {
    val (before, _) = latest()
    val (_, entries) = writeData(df)
    commit(entries, before)
  }

  /** S6 — MERGE upsert: source wins on key match, inserts otherwise;
    * untouched partitions' files are carried over unchanged. */
  def merge(source: DataFrame, pk: String): Long = {
    val (version, live) = latest()
    if (live.isEmpty) return overwrite(source)
    val src = source.cache()
    try {
      partitionCol match {
        case Some(pc) =>
          // Partitions needing rewrite = those holding a matched key, plus
          // those receiving inserts. Distinct partition *values* are log-
          // scale metadata — safe to collect.
          val srcParts = src.select(col(pc).cast("string")).distinct()
            .collect().map(r => Option(r.getString(0))).toSet
          val matchedParts = readEntries(live)
            .join(src.select(col(pk)).distinct(), Seq(pk), "left_semi")
            .select(col(pc).cast("string")).distinct()
            .collect().map(r => Option(r.getString(0))).toSet
          val touched: Set[Option[String]] =
            srcParts.map(_.asInstanceOf[Option[String]]) ++ matchedParts
          val (touchedFiles, keptFiles) =
            live.partition(e => touched.contains(e.partitionValue))
          val remaining = readEntries(touchedFiles)
            .join(src.select(col(pk)).distinct(), Seq(pk), "left_anti")
          val out = remaining.unionByName(src)
          val (_, newEntries) = writeData(out)
          commit(keptFiles ++ newEntries, version)
        case None =>
          val remaining = readEntries(live)
            .join(src.select(col(pk)).distinct(), Seq(pk), "left_anti")
          val (_, newEntries) = writeData(remaining.unionByName(src))
          commit(newEntries, version)
      }
    } finally src.unpersist()
  }

  /** DOC-ONLY OPTIMIZE implemented for real (README.md:119): rewrite live
    * files into `filesPerPartition` files, optionally range-clustered on
    * `clusterBy` (the practical stand-in for Z-ordering — multi-dimensional
    * locality via range repartition + intra-file sort). */
  def compact(filesPerPartition: Int = 1, clusterBy: Seq[Column] = Nil): Long = {
    val (version, live) = latest()
    val df0 = readEntries(live)
    val df =
      if (clusterBy.nonEmpty)
        df0.repartitionByRange(filesPerPartition, clusterBy: _*)
          .sortWithinPartitions(clusterBy: _*)
      else df0.repartition(filesPerPartition)
    val (_, entries) = writeData(df)
    commit(entries, version)
  }

  /** Drop data dirs no manifest ≤ latest references (VACUUM-lite). */
  def vacuum(): Unit = {
    val (_, live) = latest()
    val liveDirs = live.map(_.relPath.split('/').head).toSet
    Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("commit-") &&
        !liveDirs.contains(p.getFileName.toString))
      .foreach(deleteRecursively)
  }

  // ---- read paths ---------------------------------------------------------

  /** Snapshot read of the latest version. `partitionFilter` prunes files at
    * the log level before Spark ever lists them. */
  def read(partitionFilter: Option[String => Boolean] = None): DataFrame = {
    val (_, live) = latest()
    val pruned = (partitionFilter, partitionCol) match {
      case (Some(f), Some(_)) =>
        live.filter(_.partitionValue.forall(f))
      case _ => live
    }
    readEntries(pruned)
  }

  /** Time travel — snapshot of historical `version`. */
  def readVersion(version: Long): DataFrame = readEntries(readManifest(version))

  private def readEntries(entries: Seq[FileEntry]): DataFrame = {
    if (entries.isEmpty) return emptyLike()
    // Group by commit dir: each dir is one hive-partitioned write whose
    // basePath restores the partition column.
    entries.groupBy(_.relPath.split('/').head).toSeq.sortBy(_._1)
      .map { case (dir, es) =>
        val paths = es.map(e => root.resolve(e.relPath).toString)
        spark.read
          .option("basePath", root.resolve(dir).toString)
          .parquet(paths: _*)
      }
      .reduce(_ unionByName _)
  }

  private def emptyLike(): DataFrame = {
    // No live files: derive schema from any historical manifest, else fail.
    val vs = (1L to latestVersion()).reverse
    vs.map(readManifest).find(_.nonEmpty) match {
      case Some(entries) => readEntries(entries).limit(0)
      case None => throw new IllegalStateException(
        s"MergeTable at $root has no data and no history")
    }
  }
}

object MergeTable {
  private val LogDir = "_graft_log"
  private val NoPartition = "-"

  private final case class FileEntry(relPath: String,
      partitionValue: Option[String])

  /** Open (or lazily create on first write) a table at `root`. */
  def apply(spark: SparkSession, root: String,
      partitionCol: Option[String] = None): MergeTable =
    new MergeTable(spark, Paths.get(root), partitionCol)

  /** Spark escapes special chars in partition dir names (URL-style). */
  private def unescapePathValue(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }
}
