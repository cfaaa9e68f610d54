package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measures what the [[graft.lake.GraftScanPruning]] rule
  * buys on a many-file table.
  *
  * Pattern A (default): the same point lookup through `read().filter`
  * with the table unregistered (full scan; the rule's manifest pattern
  * needs the registry) vs registered (stats+bloom file pruning).
  * Prints warm medians and the planned file counts.
  * Usage: runMain graft.tools.PruneBench [nFiles] [rowsPerFile]
  *
  * Pattern B (`B` as the first arg): the REGISTRY-FREE partition-map
  * pattern on a multi-commit-dir PARTITIONED table — the layout whose
  * partition values re-attach from the manifest via the broadcast
  * (file → pv) map, where parquet partition pruning does not exist and
  * the rule's map pattern is the ONLY file skipping. Point and
  * multi-partition (`isin`) predicates are measured with the rule
  * (extensions on) and then in a FRESH extension-less session over the
  * same table (full scan), with planned-file counts from the optimized
  * plan both ways.
  * Usage: runMain graft.tools.PruneBench B [nParts] [rowsPerPart]
  *
  * Pattern B2 (`B2`): pattern B on a TWO-COLUMN (a × b) partitioned
  * multi-commit-dir layout — the file keys carry three components
  * (fileKeyDepth scales with partition depth) and the rule infers the
  * depth from the map's own keys. A conjunctive (a AND b) point
  * predicate and a single-column (a only) predicate are measured.
  * Usage: runMain graft.tools.PruneBench B2 [nA] [nB] [rowsPerPart]
  */
object PruneBench {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("B")) {
      patternB(args.lift(1).map(_.toInt).getOrElse(1024),
        args.lift(2).map(_.toInt).getOrElse(2000))
      return
    }
    if (args.headOption.contains("B2")) {
      patternB2(args.lift(1).map(_.toInt).getOrElse(32),
        args.lift(2).map(_.toInt).getOrElse(32),
        args.lift(3).map(_.toInt).getOrElse(2000))
      return
    }
    if (args.headOption.contains("C")) {
      patternC(args.lift(1).map(_.toInt).getOrElse(256),
        args.lift(2).map(_.toInt).getOrElse(5000),
        args.lift(3).map(_.toInt).getOrElse(64))
      return
    }
    val nFiles = args.headOption.map(_.toInt).getOrElse(256)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("prunebench").toString
    val t = graft.lake.MergeTable(spark, dir, None, Seq("id"),
      deletionVectors = false, bloomCols = Seq("id"))
    // nFiles files of DISJOINT id ranges (range-partitioned by the sort,
    // so stats prune hard), one commit
    val n = nFiles.toLong * rowsPer
    t.overwrite(spark.range(n).select(col("id"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .repartitionByRange(nFiles, col("id")))
    println(s"files=${t.read().inputFiles.length} rows=$n")

    val probe = n / 2 + 7
    def timeWarm(label: String): Double = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val c = t.read().filter(col("id") === probe).count()
        require(c == 1L, s"probe lost: $c")
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = runs(runs.size / 2)
      println(f"$label median=${med}%.3f s (runs ${runs.map(r => f"$r%.3f").mkString(", ")})")
      med
    }
    // warmup + unregistered baseline
    timeWarm("warmup      ")
    val full = timeWarm("unregistered")
    graft.sql.GraftSql.register("pb", t)
    val pruned = timeWarm("registered  ")
    val planned = t.read().filter(col("id") === probe)
      .queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.inputFiles.length
            case _ => -1
          }
      }.sum
    println(f"planned files with rule: $planned of $nFiles; speedup ${full / pruned}%.1fx")
    spark.stop()
  }

  /** Planned parquet files of `df`'s OPTIMIZED plan (pattern B leaves
    * the attach join in place, so count every parquet relation's root
    * paths under it). */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.length
          case _ => 0
        }
    }.sum

  /** Pattern C (`C`): the INCREMENTAL-DEDUP index probe
    * ([[graft.ext.DedupQueries.dedupIncremental]]'s layout) in its
    * scale regime — an index of MANY range-clustered files probed with
    * a batch-sized key set (files ≫ keys; md5 hashes are uniform, so
    * skipping comes from each key admitting only the few files whose
    * bhash range + bloom it hits). Prints admitted-file counts and
    * warm medians of the probe-join vs the unpruned full-index join.
    * Usage: runMain graft.tools.PruneBench C [files] [rowsPerFile] [keys] */
  private def patternC(nFiles: Int, rowsPer: Int, nKeys: Int): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("prunebenchC").toString
    val t = graft.lake.MergeTable(spark, dir, Some("band"), Seq("bhash"),
      deletionVectors = false, bloomCols = Seq("bhash"))
    val n = nFiles.toLong * rowsPer
    // band-index rows with a uniform long hash (the md5-derived bhash
    // stand-in) and a 12-long signature payload
    val rows = spark.range(n).select(
      (col("id") % 4).cast("int").as("band"),
      concat(lit("k"), col("id")).as("bkey"),
      (hash(col("id").cast("string")).cast("long") +
        lit(Int.MaxValue.toLong) + 1L).as("bhash"),
      col("id").as("doc_id"),
      array((1 to 12).map(i => col("id") * i % 1000003): _*).as("sig"))
    t.overwrite(rows.repartitionByRange(nFiles, col("band"), col("bhash")))
    val files = t.read().inputFiles.length
    // the arriving batch: nKeys of the index's own keys (hit path)
    val probe = rows.filter(col("id") % (n / nKeys) === 0)
      .select(col("band"), col("bkey"), col("bhash")).cache()
    val keys: Seq[Any] = probe.select("bhash").distinct()
      .collect().map(_.getLong(0)).toSeq
    def timeWarm(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var c = 0L
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        c = mk().count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (runs(runs.size / 2), c)
    }
    val pruned = () => t.probeKeys("bhash", keys)
      .join(probe, Seq("band", "bkey"))
    // the r14 relation-valued probe: same admission, keys never
    // collected — the q_dedup_incr scale path
    val prunedRel = () => t.probeKeys("bhash", probe.select("bhash"))
      .join(probe, Seq("band", "bkey"))
    val full = () => t.read().join(probe, Seq("band", "bkey"))
    val admitted = t.probeKeys("bhash", keys).inputFiles.length
    val admittedRel =
      t.probeKeys("bhash", probe.select("bhash")).inputFiles.length
    val (mp, cp) = timeWarm(pruned)
    val (mr, cr) = timeWarm(prunedRel)
    val (mf, cf) = timeWarm(full)
    require(cp == cf, s"probe-join drift: $cp != $cf")
    require(cr == cf, s"rel-probe-join drift: $cr != $cf")
    println(f"patternC index_files=$files admitted=$admitted " +
      f"admitted_rel=$admittedRel keys=${keys.size} " +
      f"probe_join=$mp%.3f s probe_join_rel=$mr%.3f s " +
      f"full_join=$mf%.3f s rows=$cp")
    spark.stop()
  }

  private def patternB(nParts: Int, rowsPer: Int): Unit = {
    def session(ext: Boolean): SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions",
        if (ext) "graft.functions.GraftExtensions" else "")
      .config("spark.ui.enabled", "false").getOrCreate()

    val dir = java.nio.file.Files.createTempDirectory("prunebenchB").toString
    val n = nParts.toLong * rowsPer

    def build(spark: SparkSession): graft.lake.MergeTable = {
      val t = graft.lake.MergeTable(spark, dir, Some("p"))
      if (t.latestVersion() == 0L) {
        // two commits covering disjoint partition halves → the live
        // snapshot spans TWO commit dirs, forcing the multi-dir read
        // whose partition column re-attaches via the broadcast map
        val rows = spark.range(n).select(col("id"),
          concat(lit("p"), col("id") % nParts).as("p"),
          sha2(col("id").cast("string"), 256).as("payload"))
        t.overwrite(rows.filter((col("id") % nParts) % 2 === 0)
          .repartition(col("p")))
        t.merge(rows.filter((col("id") % nParts) % 2 === 1)
          .repartition(col("p")), "id")
      }
      t
    }

    def measure(spark: SparkSession, label: String): Unit = {
      val t = build(spark)
      val point = () => t.read().filter(col("p") === "p7")
      val multi = () => t.read().filter(col("p").isin("p7", "p250", "p901"))
      def timeWarm(mk: () => org.apache.spark.sql.DataFrame,
          expect: Long): Double = {
        val runs = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          val c = mk().count()
          require(c == expect, s"probe lost: $c != $expect")
          (System.nanoTime() - t0) / 1e9
        }.sorted
        runs(runs.size / 2)
      }
      val files = t.read().inputFiles.length
      val mp = timeWarm(point, rowsPer.toLong)
      val mm = timeWarm(multi, 3L * rowsPer)
      println(f"$label files=$files " +
        f"point: planned=${plannedFiles(point())} median=$mp%.3f s; " +
        f"isin3: planned=${plannedFiles(multi())} median=$mm%.3f s")
    }

    val s1 = session(ext = true)
    s1.sparkContext.setLogLevel("WARN")
    measure(s1, "with rule   ")
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s0 = session(ext = false)
    s0.sparkContext.setLogLevel("WARN")
    measure(s0, "without rule")
    s0.stop()
  }

  private def patternB2(nA: Int, nB: Int, rowsPer: Int): Unit = {
    def session(ext: Boolean): SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions",
        if (ext) "graft.functions.GraftExtensions" else "")
      .config("spark.ui.enabled", "false").getOrCreate()

    val dir = java.nio.file.Files.createTempDirectory("prunebenchB2").toString
    val n = nA.toLong * nB * rowsPer

    def build(spark: SparkSession): graft.lake.MergeTable = {
      val t = graft.lake.MergeTable(spark, dir, Seq("a", "b"), Nil,
        deletionVectors = false, bloomCols = Nil)
      if (t.latestVersion() == 0L) {
        val rows = spark.range(n).select(col("id"),
          concat(lit("a"), col("id") % nA).as("a"),
          concat(lit("b"), floor(col("id") / nA).cast("long") % nB).as("b"),
          sha2(col("id").cast("string"), 256).as("payload"))
        t.overwrite(rows.filter(col("id") % 2 === 0)
          .repartition(col("a"), col("b")))
        t.merge(rows.filter(col("id") % 2 === 1)
          .repartition(col("a"), col("b")), "id")
      }
      t
    }

    def measure(spark: SparkSession, label: String): Unit = {
      val t = build(spark)
      val both = () =>
        t.read().filter(col("a") === "a7" && col("b") === "b3")
      val one = () => t.read().filter(col("a") === "a7")
      def timeWarm(mk: () => org.apache.spark.sql.DataFrame): Double = {
        val runs = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          mk().count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        runs(runs.size / 2)
      }
      val files = t.read().inputFiles.length
      val mb = timeWarm(both)
      val mo = timeWarm(one)
      println(f"$label files=$files " +
        f"a&b: planned=${plannedFiles(both())} median=$mb%.3f s; " +
        f"a-only: planned=${plannedFiles(one())} median=$mo%.3f s")
    }

    val s1 = session(ext = true)
    s1.sparkContext.setLogLevel("WARN")
    measure(s1, "with rule   ")
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s0 = session(ext = false)
    s0.sparkContext.setLogLevel("WARN")
    measure(s0, "without rule")
    s0.stop()
  }
}
