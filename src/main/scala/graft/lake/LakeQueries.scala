package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-checked query forms for the lakehouse write surface — the
  * reference's whole reason to exist is its MERGE path
  * (ref: glue_jobs/product_etl.py:72-81, orders_etl.py:82-91), and
  * unit tests alone don't put it under the driver's hash gate. Each
  * query here BUILDS a deterministic table from the fixture corpus at
  * query time (a fresh temp dir per run — the table is scratch, the
  * RESULT is the contract), applies the lake operation, and returns the
  * final state; the paired DuckDB oracle replays the same feed with
  * plain SQL CTEs. Everything derives arithmetically from fixture rows,
  * so both engines see identical inputs at every scale factor.
  */
object LakeQueries {

  private def scratch(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** CDC APPLY under the oracle gate: a tagged change feed derived from
    * `orders` — deletes (key%10=0), two sequenced updates per key
    * (key%10∈{1,2}; seq 2 must win), inserts (key%10=3 re-keyed high) —
    * applied in ONE [[MergeTable.mergeCdc]] commit with SEQUENCE BY,
    * then the final table state read back. The oracle collapses the
    * same feed with a row_number window and applies it as
    * anti-join ∪ upserts. */
  def cdcApply(s: SparkSession, d: String): DataFrame = {
    val ct = MergeTable.ChangeType
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"))
    val t = MergeTable(s, scratch("graft_q_cdc"))
    t.overwrite(base)
    val dels = base.filter(col("o_orderkey") % 10 === 0)
      .withColumn(ct, lit("delete")).withColumn("seq", lit(1L))
    val upd1 = base.filter((col("o_orderkey") % 10).isin(1, 2))
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .withColumn(ct, lit("update")).withColumn("seq", lit(1L))
    val upd2 = base.filter((col("o_orderkey") % 10).isin(1, 2))
      .withColumn("o_totalprice", col("o_totalprice") + 2.0)
      .withColumn(ct, lit("update")).withColumn("seq", lit(2L))
    val ins = base.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn(ct, lit("insert")).withColumn("seq", lit(1L))
    t.mergeCdc(dels.unionByName(upd1).unionByName(upd2).unionByName(ins),
      "o_orderkey", sequenceBy = Some("seq"))
    t.read().select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice"), 2).as("price"), col("o_orderdate"))
  }

  val cdcApplyOracle: String =
    """WITH base AS (
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate
         FROM orders),
       feed AS (
         SELECT *, 'delete' AS ct, 1 AS seq FROM base
         WHERE o_orderkey % 10 = 0
         UNION ALL
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1.0,
                o_orderdate, 'update', 1
         FROM base WHERE o_orderkey % 10 IN (1, 2)
         UNION ALL
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 2.0,
                o_orderdate, 'update', 2
         FROM base WHERE o_orderkey % 10 IN (1, 2)
         UNION ALL
         SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
                o_totalprice, o_orderdate, 'insert', 1
         FROM base WHERE o_orderkey % 10 = 3),
       coll AS (
         SELECT * FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
                       ORDER BY seq DESC) AS rn
           FROM feed) t
         WHERE rn = 1)
       SELECT o_orderkey, o_custkey, o_orderstatus,
              round(o_totalprice, 2) AS price, o_orderdate
       FROM (
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate
         FROM base
         WHERE o_orderkey NOT IN (SELECT o_orderkey FROM coll)
         UNION ALL
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate
         FROM coll WHERE ct <> 'delete') f
       ORDER BY o_orderkey"""

  /** SCD2 point-in-time join under the oracle gate: a 3-wave customer
    * history (everyone at 2024-01-01; key%5=0 rebalanced +100 at
    * 2024-02-01; key%3=0 rebalanced +200 at 2024-03-01 — %15=0 keys get
    * THREE versions) maintained via [[Scd2.merge]], then every order
    * (labeled mid-Jan/Feb/Mar by key%3) joined to the dimension version
    * in effect AT ITS OWN LABEL via [[Scd2.pointInTimeJoin]]. The
    * oracle rebuilds the history as CTEs, closes rows with
    * lead(eff_from), and interval-joins. */
  def scd2Pit(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal").as("bal"))
    val t = MergeTable(s, scratch("graft_q_scd2"), Some(Scd2.Slice))
    Scd2.merge(t, cust, "c_custkey", "2024-01-01")
    Scd2.merge(t,
      cust.filter(col("c_custkey") % 5 === 0)
        .withColumn("bal", col("bal") + 100.0),
      "c_custkey", "2024-02-01")
    Scd2.merge(t,
      cust.filter(col("c_custkey") % 3 === 0)
        .withColumn("bal", col("bal") + 200.0),
      "c_custkey", "2024-03-01")
    val facts = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey").as("c_custkey"))
      .withColumn("label", expr(
        """CASE CAST(o_orderkey % 3 AS INT)
             WHEN 0 THEN '2024-01-15'
             WHEN 1 THEN '2024-02-15'
             ELSE '2024-03-15' END"""))
    Scd2.pointInTimeJoin(facts, t, "c_custkey", "label")
      .select(col("o_orderkey"), col("c_custkey"), col("label"),
        round(col("bal"), 2).as("bal"),
        col(Scd2.EffFrom).as("eff_from"))
  }

  /** Time travel under the oracle gate: overwrite (v1) → MERGE price
    * bump for key%7=0 (v2) → DELETE key%11=0 (v3), then read VERSION 2.
    * The hash proves two things at once: snapshot reconstruction
    * resolves exactly the post-merge state, and the later delete's file
    * rewrite did NOT contaminate the historical snapshot (commits never
    * rewrite files in place). The oracle replays waves 1-2 and ignores
    * the delete entirely. */
  def timeTravel(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val t = MergeTable(s, scratch("graft_q_tt"))
    t.overwrite(base)
    val v2 = t.merge(
      base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0),
      "o_orderkey")
    t.delete(col("o_orderkey") % 11 === 0)
    t.readVersion(v2).select(
      col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice"), 2).as("price"))
  }

  val timeTravelOracle: String =
    """SELECT o_orderkey, o_custkey,
              round(CASE WHEN o_orderkey % 7 = 0
                         THEN o_totalprice + 5.0
                         ELSE o_totalprice END, 2) AS price
       FROM orders
       ORDER BY o_orderkey"""

  /** FSCK under the oracle gate (log-vs-storage repair, r14): a
    * partitioned table loses one partition's data files BEHIND THE
    * LOG'S BACK (the object-store lifecycle-policy / partial-restore
    * shape), [[MergeTable.fsckDryRun]] names exactly the missing
    * entries, [[MergeTable.fsck]] commits the repair, and the table
    * reads clean with the surviving partitions — while the repair
    * commit's own snapshot CHECKSUM verifies (the log still folds to
    * what the repair published). The oracle is the surviving
    * partitions' rows, so a fsck that dropped too much or too little
    * hash-mismatches. */
  def fsckRepair(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      substring(col("o_orderpriority"), 1, 1).as("pri"))
    val root = scratch("graft_q_fsck")
    val t = MergeTable(s, root, Some("pri"))
    t.overwrite(base)
    // storage eats every file of the '1' partition
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(
      java.nio.file.Files.walk(java.nio.file.Paths.get(root))) { st =>
      st.iterator().asScala.toSeq
        .filter(p => p.toString.contains("pri=1") &&
          p.toString.endsWith(".parquet"))
        .foreach(java.nio.file.Files.delete)
    }
    val dry = t.fsckDryRun()
    require(dry.nonEmpty && dry.forall(_.contains("pri=1")),
      s"fsck dry run should name exactly the eaten partition, got $dry")
    require(t.fsck() > 1L, "fsck should commit a repair")
    require(t.fsckDryRun().isEmpty, "fsck should leave a clean table")
    require(t.verifyChecksum(),
      "the repair commit's snapshot checksum should verify")
    // the hive layout re-infers the partition value's type on read
    // (pri '2'..'5' → int); the gate compares STRINGS, so cast back
    t.read().select(col("o_orderkey"), col("o_custkey"),
      col("pri").cast("string").as("pri"))
  }

  val fsckRepairOracle: String =
    """SELECT o_orderkey, o_custkey,
              substr(o_orderpriority, 1, 1) AS pri
       FROM orders
       WHERE substr(o_orderpriority, 1, 1) <> '1'
       ORDER BY o_orderkey"""

  /** Incremental MV maintenance under the oracle gate (X74 end-to-end):
    * a per-customer SUM/COUNT aggregate is materialized ONCE at v1 and
    * then maintained purely from the change feed across two commits —
    * a MERGE carrying updates (key%4=0: v+1000) and re-keyed inserts
    * (key%6=3), then a DELETE (key%9=0) — never rescanning the base.
    * The measure is `o_orderkey % 997` (integer, computed on the
    * ORIGINAL key so inserts replay trivially): long sums are exact, so
    * the incrementally-maintained totals hash-match the oracle's direct
    * aggregate over the replayed final state bit-for-bit — the
    * self-maintainability proof, under the gate, at every scale
    * factor. */
  def incrementalMv(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      (col("o_orderkey") % 997).as("v"))
    val t = MergeTable(s, scratch("graft_q_mv"))
    val v1 = t.overwrite(base)
    var mv = IncrementalAgg.fullAggregate(t.readVersion(v1),
      "o_custkey", "v")
    val upd = base.filter(col("o_orderkey") % 4 === 0)
      .withColumn("v", col("v") + 1000L)
    val ins = base.filter(col("o_orderkey") % 6 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("v", col("v") + 7L)
    val v2 = t.merge(upd.unionByName(ins), "o_orderkey")
    mv = IncrementalAgg.applyDelta(mv,
      IncrementalAgg.sumCountDelta(
        t.changes(v1, v2, "o_orderkey", updateImages = true),
        "o_custkey", "v"),
      "o_custkey")
    val v3 = t.delete(col("o_orderkey") % 9 === 0)
    mv = IncrementalAgg.applyDelta(mv,
      IncrementalAgg.sumCountDelta(
        t.changes(v2, v3, "o_orderkey", updateImages = true),
        "o_custkey", "v"),
      "o_custkey")
    mv.select(col("o_custkey"),
      col("total_sum").cast("long").as("total_sum"), col("n_rows"))
  }

  val incrementalMvOracle: String =
    """WITH base AS (
         SELECT o_orderkey, o_custkey, o_orderkey % 997 AS v FROM orders),
       upd AS (
         SELECT o_orderkey, o_custkey,
                CASE WHEN o_orderkey % 4 = 0 THEN v + 1000 ELSE v END AS v
         FROM base),
       ins AS (
         SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey, v + 7 AS v
         FROM base WHERE o_orderkey % 6 = 3),
       fin AS (
         SELECT * FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins) u
         WHERE o_orderkey % 9 <> 0)
       SELECT o_custkey, CAST(sum(v) AS BIGINT) AS total_sum,
              CAST(count(*) AS BIGINT) AS n_rows
       FROM fin GROUP BY o_custkey ORDER BY o_custkey"""

  /** Deletion vectors under the oracle gate (X120 end-to-end): a
    * partitioned, DV-enabled table takes a merge-on-read DELETE
    * (key%10=0 — positions vectorized, zero files rewritten), then a
    * merge-on-read UPDATE (key%7=0: price+3 — matched rows vectorized
    * out of their old files and rewritten into NEW files), then a
    * second DELETE (cust%13=0) that must hit BOTH generations — old
    * files via cumulative-vector union and the update's fresh files
    * via new vectors. The final read anti-joins every vector and
    * restores the partition column through the tagged multi-dir scan;
    * the oracle is the plain-SQL replay of the three mutations. */
  def dvState(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val t = MergeTable(s, scratch("graft_q_dv"), Some("o_orderstatus"),
      Nil, deletionVectors = true)
    t.overwrite(base)
    t.delete(col("o_orderkey") % 10 === 0)
    t.update(col("o_orderkey") % 7 === 0,
      Map("o_totalprice" -> (col("o_totalprice") + 3.0)))
    t.delete(col("o_custkey") % 13 === 0)
    t.read().select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice"), 2).as("price"))
  }

  val dvStateOracle: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
              round(CASE WHEN o_orderkey % 7 = 0
                         THEN o_totalprice + 3.0
                         ELSE o_totalprice END, 2) AS price
       FROM orders
       WHERE o_orderkey % 10 <> 0 AND o_custkey % 13 <> 0
       ORDER BY o_orderkey"""

  /** Incremental JOIN-view maintenance under the oracle gate (the
    * [[IncrementalJoin]] end-to-end): an orders⋈customer enriched-fact
    * view is materialized ONCE, then maintained purely from both
    * tables' change feeds across a fact wave (MERGE updates %4=0 +
    * re-keyed inserts %6=3, DELETE %9=0) and a dim wave (MERGE bal+100
    * for %5=0, inserts matching the deliberately-dangling %3=1 fact
    * keys, DELETE %13=0) — two refreshes, each ONE atomic mergeCdc
    * commit; the base fact table is only touched by the dim-side
    * key-pruned probe. The oracle replays both final states and joins
    * them directly — equality proves the delta algebra (including the
    * dim-insert path that resurrects formerly-unmatched facts, and
    * inner-join drops for deleted dim keys) at every scale factor. */
  def joinMv(s: SparkSession, d: String): DataFrame = {
    val fbase = Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_custkey") % 3 === 1, col("o_custkey") + 10000000L)
        .otherwise(col("o_custkey")).as("c_custkey"),
      col("o_totalprice").as("price0"))
    val dbase = Tables.customer(s, d).select(
      col("c_custkey"), col("c_acctbal").as("bal"))
    // jk stats + bloom on the fact table feed the refresh's key-pruned
    // probe (the [[MergeTable.scanVersion]] planner skips fact files
    // whose range/bloom can't hold a changed dim key).
    val tf = MergeTable(s, scratch("graft_q_ijf"), None,
      Seq("c_custkey"), deletionVectors = false,
      bloomCols = Seq("c_custkey"))
    val td = MergeTable(s, scratch("graft_q_ijd"))
    val tv = MergeTable(s, scratch("graft_q_ijv"))
    val vf0 = tf.overwrite(fbase)
    val vd0 = td.overwrite(dbase)
    tv.overwrite(IncrementalJoin.fullJoin(tf.read(), td.read(),
      "c_custkey"))
    // fact wave
    val fupd = fbase.filter(col("o_orderkey") % 4 === 0)
      .withColumn("price0", col("price0") + 10.0)
    val fins = fbase.filter(col("o_orderkey") % 6 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("price0", col("price0") + 7.0)
    tf.merge(fupd.unionByName(fins), "o_orderkey")
    val vf2 = tf.delete(col("o_orderkey") % 9 === 0)
    IncrementalJoin.refresh(tv, tf, td, "o_orderkey", "c_custkey",
      vf0, vf2, vd0, vd0)
    // dim wave
    val dupd = dbase.filter(col("c_custkey") % 5 === 0)
      .withColumn("bal", col("bal") + 100.0)
    val dins = Tables.customer(s, d)
      .filter(col("c_custkey") % 2 === 0)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        ((col("c_custkey") % 1000).cast("double") + 0.25).as("bal"))
    td.merge(dupd.unionByName(dins), "c_custkey")
    val vd2 = td.delete(col("c_custkey") % 13 === 0)
    IncrementalJoin.refresh(tv, tf, td, "o_orderkey", "c_custkey",
      vf2, vf2, vd0, vd2)
    tv.read().select(
      col("o_orderkey"), col("c_custkey"),
      round(col("price0"), 2).as("price"), round(col("bal"), 2).as("bal"))
  }

  val joinMvOracle: String =
    """WITH fbase AS (
         SELECT o_orderkey,
                CASE WHEN o_custkey % 3 = 1 THEN o_custkey + 10000000
                     ELSE o_custkey END AS c_custkey,
                o_totalprice AS price0
         FROM orders),
       fupd AS (
         SELECT o_orderkey, c_custkey,
                CASE WHEN o_orderkey % 4 = 0 THEN price0 + 10.0
                     ELSE price0 END AS price0
         FROM fbase),
       fins AS (
         SELECT o_orderkey + 100000000 AS o_orderkey, c_custkey,
                price0 + 7.0 AS price0
         FROM fbase WHERE o_orderkey % 6 = 3),
       ffin AS (
         SELECT * FROM (SELECT * FROM fupd UNION ALL SELECT * FROM fins) u
         WHERE o_orderkey % 9 <> 0),
       dbase AS (SELECT c_custkey, c_acctbal AS bal FROM customer),
       dupd AS (
         SELECT c_custkey,
                CASE WHEN c_custkey % 5 = 0 THEN bal + 100.0 ELSE bal END
                  AS bal
         FROM dbase),
       dins AS (
         SELECT c_custkey + 10000000 AS c_custkey,
                CAST(c_custkey % 1000 AS DOUBLE) + 0.25 AS bal
         FROM customer WHERE c_custkey % 2 = 0),
       dfin AS (
         SELECT * FROM (SELECT * FROM dupd UNION ALL SELECT * FROM dins) u
         WHERE c_custkey % 13 <> 0)
       SELECT f.o_orderkey, f.c_custkey,
              round(f.price0, 2) AS price, round(d.bal, 2) AS bal
       FROM ffin f JOIN dfin d ON f.c_custkey = d.c_custkey
       ORDER BY f.o_orderkey"""

  val scd2PitOracle: String =
    """WITH hist AS (
         SELECT c_custkey, c_acctbal AS bal, '2024-01-01' AS eff_from
         FROM customer
         UNION ALL
         SELECT c_custkey, c_acctbal + 100.0, '2024-02-01'
         FROM customer WHERE c_custkey % 5 = 0
         UNION ALL
         SELECT c_custkey, c_acctbal + 200.0, '2024-03-01'
         FROM customer WHERE c_custkey % 3 = 0),
       h2 AS (
         SELECT c_custkey, bal, eff_from,
                lead(eff_from) OVER (PARTITION BY c_custkey
                  ORDER BY eff_from) AS eff_to
         FROM hist),
       facts AS (
         SELECT o_orderkey, o_custkey AS c_custkey,
                CASE CAST(o_orderkey % 3 AS INT)
                  WHEN 0 THEN '2024-01-15'
                  WHEN 1 THEN '2024-02-15'
                  ELSE '2024-03-15' END AS label
         FROM orders)
       SELECT f.o_orderkey, f.c_custkey, f.label,
              round(h.bal, 2) AS bal, h.eff_from
       FROM facts f
       LEFT JOIN h2 h
         ON f.c_custkey = h.c_custkey
        AND h.eff_from <= f.label
        AND (h.eff_to IS NULL OR h.eff_to > f.label)
       ORDER BY f.o_orderkey"""

  /** GENERATED-COLUMN partition pruning under the oracle gate (X163,
    * r11): a lake table partitioned by `event_date GENERATED ALWAYS AS
    * (to_date(ts))` — the write POPULATES the partition column (the
    * source frame never carries it), and the scan predicate mentions
    * only the SOURCE column `ts`, so the returned rows are correct only
    * if population computed every date right; the derived prune
    * (ts-range → date-range partition skip) is plan-side and
    * correctness-invisible here — GeneratedColumnSpec pins the actual
    * file-skip counts. */
  def genPrune(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val t = MergeTable(s, scratch("graft_q_genp"), Some("event_date"))
    t.addGeneratedColumn("event_date", "to_date(ts)")
    t.overwrite(ev) // event_date derived by the engine
    t.scan(col("ts") >= to_timestamp(lit("2024-01-10 12:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-13 00:00:00")))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val genPruneOracle: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-10 12:00:00'
         AND ts < TIMESTAMP '2024-01-13 00:00:00'
       ORDER BY event_id"""

  /** X172 — IDENTITY COLUMNS, gated end-to-end: declare
    * `row_seq GENERATED BY DEFAULT AS IDENTITY` on a scratch table,
    * append the orders in TWO waves (split by key parity, so the
    * allocation watermark must carry correctly across commits), and
    * return the invariants the assignment guarantees: n rows get
    * EXACTLY the values 1..n — count, min, max, distinct count, and
    * the closed-form sum n(n+1)/2 all pin it, while staying
    * deterministic even though WHICH row gets WHICH value is not.
    * The assignment itself is distributed (per-partition slot bases
    * from one narrow count job — no window, no single-partition
    * shuffle); the oracle derives every figure from count(*) alone. */
  def identityAssign(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val t = MergeTable(s, scratch("graft_q_idn"))
    t.addIdentityColumn("row_seq")
    t.append(o.filter(col("o_orderkey") % 2 === 0))
    t.append(o.filter(col("o_orderkey") % 2 =!= 0))
    t.read().agg(
      count(lit(1)).as("n_rows"),
      min(col("row_seq")).as("min_id"),
      max(col("row_seq")).as("max_id"),
      countDistinct(col("row_seq")).as("n_distinct"),
      sum(col("row_seq")).as("sum_id"))
  }

  val identityAssignOracle: String =
    """SELECT count(*) AS n_rows,
              CAST(1 AS BIGINT) AS min_id,
              count(*) AS max_id,
              count(*) AS n_distinct,
              CAST((count(*) * (count(*) + 1)) / 2 AS BIGINT) AS sum_id
       FROM orders"""

  /** X178 — CONVERT-in-place under the oracle gate: write a PLAIN
    * hive-partitioned parquet dir (no manifest), adopt it with
    * `convertInPlace` (zero bytes moved — the commit references the
    * files where they lie and declares the hive-inferred schema), then
    * prove the adopted table is a first-class lake table by running a
    * MERGE wave on top and reading everything back. The hash matches
    * only if adopted files scan correctly through the declared-schema
    * path (manifest-attached partition values included), the merge
    * rewrote exactly the matched rows, and untouched adopted files
    * still serve their originals. */
  def convertAdopt(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("graft_q_conv") + "/lake"
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    base.write.partitionBy("o_orderstatus").parquet(dir)
    val t = MergeTable(s, dir, Some("o_orderstatus"))
    t.convertInPlace()
    t.merge(base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 5.0), "o_orderkey")
    t.read()
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
        col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  val convertAdoptOracle: String =
    """SELECT o_orderkey,
              round(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 5.0
                         ELSE o_totalprice END, 2) AS price,
              o_orderstatus
       FROM orders ORDER BY o_orderkey"""

  /** MULTI-COLUMN partitioning under the oracle gate: a
    * (l_returnflag × l_linestatus) two-level layout built from
    * `lineitem`, exercised end-to-end — seed overwrite, a
    * tuple-scoped OPTIMIZE WHERE over BOTH columns, a MERGE whose
    * touched-partition probe collects value TUPLES, and a final
    * pruned read. The oracle replays the upsert arithmetically (the
    * layout operations are logically content-preserving). */
  def multiPart(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("graft_q_mpart") + "/lake"
    val base = Tables.lineitem(s, d).select(
      (col("l_orderkey") * 8 + col("l_linenumber")).as("pk"),
      col("l_quantity"), col("l_returnflag"), col("l_linestatus"))
    val t = MergeTable(s, dir, Seq("l_returnflag", "l_linestatus"), Nil,
      deletionVectors = false, bloomCols = Nil)
    t.overwrite(base)
    t.compactWhere(col("l_returnflag") === "A" && col("l_linestatus") === "F")
    t.merge(base.filter(col("pk") % 97 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100.0), "pk")
    t.read()
      .filter(col("l_returnflag") =!= "N" || col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val multiPartOracle: String =
    """WITH b AS (SELECT l_orderkey * 8 + l_linenumber AS pk, l_quantity,
                         l_returnflag, l_linestatus
                  FROM lineitem),
         m AS (SELECT pk,
                      CASE WHEN pk % 97 = 0 THEN l_quantity + 100.0
                           ELSE l_quantity END AS l_quantity,
                      l_returnflag, l_linestatus
               FROM b)
       SELECT l_returnflag, l_linestatus,
              CAST(count(*) AS BIGINT) AS n,
              round(sum(l_quantity), 2) AS qty
       FROM m
       WHERE l_returnflag <> 'N' OR l_linestatus = 'F'
       GROUP BY 1, 2 ORDER BY 1, 2"""
}
