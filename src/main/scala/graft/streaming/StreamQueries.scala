package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

import graft.Tables
import graft.lake.{IncrementalAgg, MergeTable}

/** Oracle-checked query forms for the STREAMING surface — the
  * `streaming/` operators otherwise rest on unit tests alone, and the
  * harness's strongest signal is a DuckDB hash match. An
  * `AvailableNow` drain is deterministic (the file-source checkpoint
  * fixes which files each drain consumes; every per-batch write is a
  * deterministic MERGE), so a streaming pipeline CAN live under the
  * hash gate: each query here materializes a raw zone of CSV waves
  * from the fixture corpus at query time, drains it through the real
  * Structured Streaming path (file source → checkpoint → foreachBatch
  * lake write) wave by wave, and returns the final state; the paired
  * oracle replays the same arithmetic in plain SQL.
  *
  * The wave-per-drain shape is the point, not a convenience: drain 2
  * starting from drain 1's checkpoint proves the file-source position
  * tracking (only NEW files are read — the reference's marker-file
  * idempotency, ref: lambda/lakehouse_check_processed_marker/
  * lambda_function.py:17-28, subsumed by the checkpoint), and the CDC
  * query's wave 3 proves the cross-batch late-event guards that no
  * single-batch unit can exercise end-to-end.
  */
object StreamQueries {

  private def scratch(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Run a streaming drain pipeline with `spark.sql.shuffle.partitions`
    * pinned to min(8, session value), restoring the session conf after.
    *
    * Every stateful streaming operator materializes ONE state store per
    * shuffle partition per micro-batch — checkpoint dirs, delta files,
    * maintenance snapshots — so at the fixtures' scale the drain cost is
    * dominated by state-store file churn ∝ partitions, not by data:
    * r13 measured q_stream_ojoin at 21.2 s warm under 32 partitions vs
    * 8.1 s under 8, q_stream_window 9.2 → 6.4, on identical data. The
    * pin applies to the HARNESS pipelines only (the library operators in
    * [[EventStreams]]/[[StreamIngest]] inherit whatever the deployment
    * configures — at 100 TB you'd size state partitions UP); it is also
    * exactly the regime the correctness gate verifies (Verify runs at
    * 8 cores / 8 partitions). The restore happens before the returned
    * (lazy) final batch read executes, so only the drains run pinned. */
  private def withStatePartitions[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    val cap = sys.env.get("SPARK_GRAFT_STREAM_STATE_PARTS")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(8)
    val pinned = math.min(cap, scala.util.Try(old.toInt).getOrElse(cap))
    s.conf.set(key, pinned.toString)
    try body finally s.conf.set(key, old)
  }

  /** Append one wave of CSV files to the raw zone. Column order is the
    * contract (the stream reads with an explicit schema; Spark's CSV
    * reader applies it positionally under enforceSchema). */
  private def writeWave(df: DataFrame, rawDir: String): Unit =
    df.write.mode("append").option("header", "true").csv(rawDir)

  /** [[writeWave]] as ONE file stamped into a strictly increasing
    * mtime slot: a `maxFilesPerTrigger = 1` AvailableNow run then
    * consumes the backlog in wave order as separate micro-batches —
    * the file source orders its backlog by mtime and its
    * same-millisecond tie-break is unspecified, so the stamp is what
    * makes the order a contract. Lets a corpus + sentinel-waves layout
    * drain in ONE query start instead of one start per wave (the
    * watermark advances BETWEEN micro-batches exactly as it would
    * between drains), cutting the per-start fixed cost that dominates
    * these fixture-scale pipelines. Slots are written into the fixed
    * past (all real files' mtimes are far above it), so each new
    * wave's files are stamped exactly once. */
  private def stampedWave(df: DataFrame, dir: String, slot: Int): Unit = {
    writeWave(df.coalesce(1), dir)
    val slot0 = 1_600_000_000_000L
    scala.util.Using.resource(
      Files.list(java.nio.file.Paths.get(dir))) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".csv"))
        .filter(p => Files.getLastModifiedTime(p).toMillis >
          slot0 + 600_000L)
        .foreach(p => Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            slot0 + slot * 60_000L)))
    }
  }

  /** Streaming ingest → CDF SUBSCRIPTION → incremental MV, under the
    * oracle gate (X13 + X60 + X74 + X153 end-to-end): two CSV waves —
    * the base corpus, then updates (key%4=0: v+1000) plus re-keyed
    * inserts (key%6=3) — are drained by TWO AvailableNow runs sharing
    * one checkpoint, each micro-batch MERGE-upserted into a lake
    * table. A per-customer SUM/COUNT aggregate SUBSCRIBES to the table
    * through `readStream.format("graft-cdf")` (its own checkpoint;
    * version = offset) and folds each emitted change batch — initial
    * snapshot included — the base table is never rescanned. The measure
    * `o_orderkey % 997` keeps sums integral, so the maintained totals
    * hash-match the oracle's direct aggregate over the replayed final
    * state bit-for-bit.
    *
    * Drain 2 reads ONLY wave-2 files (same checkpoint): if the
    * file-source position tracking re-consumed wave 1, the re-merge
    * would be idempotent on the pk — but the CDF between v1 and v2
    * would then carry spurious update images for every base row and
    * the maintained MV would drift from the oracle. The hash equality
    * is therefore also a checkpoint-correctness proof.
    *
    * Both drains run with `maxFilesPerTrigger = 1` over 2-file waves,
    * so each wave lands as TWO bounded micro-batch MERGEs (the backfill
    * discipline at scale: peak shuffle ∝ cap, not ∝ backlog) — and the
    * hash equality then also proves multi-batch drain stability: the MV
    * is maintained over a multi-commit change-feed range, and any
    * file→batch assignment nondeterminism would have to cancel out to
    * the same final state (each key changes exactly once per wave, so
    * it does — by design). */
  def streamMv(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamMvImpl(s, d))

  private def streamMvImpl(s: SparkSession, d: String): DataFrame = {
    val schema = new StructType()
      .add("o_orderkey", LongType).add("o_custkey", LongType)
      .add("v", LongType)
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      (col("o_orderkey") % 997).as("v"))
    val rawDir = scratch("graft_q_smv_raw")
    val ckpt = scratch("graft_q_smv_ckpt")
    val t = MergeTable(s, scratch("graft_q_smv_tbl"))
    def drain(): Unit = {
      StreamIngest.runAvailableNow(s, rawDir, schema, t, "o_orderkey",
        ckpt, maxFilesPerTrigger = Some(1))
      ()
    }

    // r11: the MV SUBSCRIBES to the table through the `graft-cdf`
    // streaming source (X153) instead of pulling changes() batch-wise —
    // version-offset checkpointing replaces the hand-held (v1, v2)
    // bookkeeping, and the INITIAL batch is the initial snapshot as
    // inserts (startingVersion = 0), so the whole MV lifecycle —
    // first materialization included — is one feed fold. Each
    // refresh is an AvailableNow drain of the SAME subscription
    // checkpoint; state lives distributed (localCheckpoint), the
    // driver never holds row data.
    graft.sql.GraftSql.register("q_smv_t", t)
    val cdfCkpt = scratch("graft_q_smv_cdfckpt")
    var mv: DataFrame = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      new StructType().add("o_custkey", LongType)
        .add("total_sum", org.apache.spark.sql.types.DoubleType)
        .add("n_rows", LongType))
    def refreshMv(): Unit = {
      val q = s.readStream.format("graft-cdf")
        .option("table", "q_smv_t").option("pk", "o_orderkey").load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cdfCkpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          mv = IncrementalAgg.applyDelta(mv,
            IncrementalAgg.sumCountDelta(b, "o_custkey", "v"),
            "o_custkey").localCheckpoint()
          ()
        }
        .start()
      q.awaitTermination()
    }

    writeWave(base.repartition(2), rawDir)
    drain()
    refreshMv()

    val upd = base.filter(col("o_orderkey") % 4 === 0)
      .withColumn("v", col("v") + 1000L)
    val ins = base.filter(col("o_orderkey") % 6 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("v", col("v") + 7L)
    writeWave(upd.unionByName(ins).repartition(2), rawDir)
    drain()
    refreshMv()

    mv.select(col("o_custkey"),
      col("total_sum").cast("long").as("total_sum"), col("n_rows"))
  }

  /** THE STREAMING SINK under the oracle gate (X168, r11): a file
    * stream of order waves lands in a lake table through
    * `writeStream.format("graft")` across TWO AvailableNow drains —
    * the second a genuine RESTART of the subscription, and
    * `maxFilesPerTrigger = 1` forcing one txn-gated append commit per
    * wave file. The final table hash-matches the closed-form oracle
    * only if every batch appended exactly once: a replayed batch
    * (which the restart invites) would double its slice's rows and
    * break the row count, let alone the hash. */
  def streamSink(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamSinkImpl(s, d))

  private def streamSinkImpl(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val waveDir = scratch("graft_q_gsink_src")
    val t = MergeTable(s, scratch("graft_q_gsink_t"))
    graft.sql.GraftSql.register("q_gsink_t", t)
    val ckpt = scratch("graft_q_gsink_ckpt")
    def drain(): Unit = {
      val q = s.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(waveDir + "/*")
        .writeStream.format("graft")
        .option("table", "q_gsink_t")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    base.filter(col("o_orderkey") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(waveDir + "/w1")
    drain()
    // two more waves, then a RESTARTED drain applies each exactly once
    base.filter(col("o_orderkey") % 4 === 1).coalesce(1)
      .write.mode("overwrite").parquet(waveDir + "/w2")
    base.filter(col("o_orderkey") % 4 === 3).coalesce(1)
      .write.mode("overwrite").parquet(waveDir + "/w3")
    drain()
    t.read().select(col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice"), 2).as("price"))
  }

  val streamSinkOracle: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
       FROM orders
       ORDER BY o_orderkey"""

  /** CONTINUOUS REPLICATION under the oracle gate (X147's batch sync
    * re-expressed as an X153 SUBSCRIPTION, r11): a source lake table
    * advances through merge (reprice + re-keyed inserts) and delete
    * commits while a replica follows it through
    * [[graft.lake.Replica.subscribeAvailableNow]] — two AvailableNow
    * drains of ONE `graft-cdf` subscription checkpoint, the second a
    * genuine RESTART (new stream instance, same offsets). The replica's
    * final contents hash-match the closed-form oracle only if the
    * bootstrap batch carried the exact initial snapshot, the restart
    * resumed at the committed version (a replayed bootstrap would
    * resurrect the deleted keys' pre-update prices), and each batch
    * applied atomically. */
  def streamReplica(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamReplicaImpl(s, d))

  private def streamReplicaImpl(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val src = MergeTable(s, scratch("graft_q_srep_src"))
    src.overwrite(base)
    graft.sql.GraftSql.register("q_srep_src", src)
    val rep = MergeTable(s, scratch("graft_q_srep_rep"))
    val ckpt = scratch("graft_q_srep_ckpt")
    def drain(): Unit = graft.lake.Replica.subscribeAvailableNow(
      s, "q_srep_src", rep, "o_orderkey", ckpt)

    drain() // bootstrap: initial snapshot as inserts
    src.merge(
      base.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 10.0)
        .unionByName(base.filter(col("o_orderkey") % 6 === 3)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_totalprice", col("o_totalprice") + 7.0)),
      "o_orderkey")
    src.delete(col("o_orderkey") % 9 === 0)
    drain() // restarted subscription: ONE net window
    rep.read().select(col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice"), 2).as("price"))
  }

  val streamReplicaOracle: String =
    """WITH base AS (
         SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
       merged AS (
         SELECT o_orderkey, o_custkey,
                CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 10.0
                     ELSE o_totalprice END AS p
         FROM base
         UNION ALL
         SELECT o_orderkey + 100000000, o_custkey, o_totalprice + 7.0
         FROM base WHERE o_orderkey % 6 = 3)
       SELECT o_orderkey, o_custkey, round(p, 2) AS price
       FROM merged WHERE o_orderkey % 9 <> 0
       ORDER BY o_orderkey"""

  val streamMvOracle: String =
    """WITH base AS (
         SELECT o_orderkey, o_custkey, o_orderkey % 997 AS v FROM orders),
       upd AS (
         SELECT o_orderkey, o_custkey,
                CASE WHEN o_orderkey % 4 = 0 THEN v + 1000 ELSE v END AS v
         FROM base),
       ins AS (
         SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey, v + 7 AS v
         FROM base WHERE o_orderkey % 6 = 3),
       fin AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
       SELECT o_custkey, CAST(sum(v) AS BIGINT) AS total_sum,
              CAST(count(*) AS BIGINT) AS n_rows
       FROM fin GROUP BY o_custkey ORDER BY o_custkey"""

  /** Streaming CDC `APPLY CHANGES INTO` under the oracle gate (X94
    * end-to-end): three CSV waves of tagged change events drained by
    * three AvailableNow runs sharing one checkpoint through
    * [[StreamIngest.runCdcAvailableNow]] —
    *
    *   1. inserts of the base corpus (seq 1);
    *   2. updates (key%4=0: price+10, seq 3) and deletes (key%9=0,
    *      seq 4 — for keys hit by both, SEQUENCE BY collapses the
    *      batch to the delete);
    *   3. the straggler wave: a LATE update for every key%4=0 (price
    *      +999, seq 2 — must be rejected: by the live (pk, seq) guard
    *      where the key survived wave 2 with seq 3, and by the
    *      tombstone guard where it was deleted), plus a re-insert for
    *      key%18=0 (seq 5, a fresh deterministic price — ABOVE the
    *      tombstone, must resurrect the key).
    *
    * The final state (price and stored sequence per key) hash-matches
    * the closed-form oracle only if every guard fired exactly right —
    * a late event leaking in, a tombstone miss resurrecting a deleted
    * key, or a replayed file would each shift prices or sequences. */
  def streamCdc(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamCdcImpl(s, d))

  private def streamCdcImpl(s: SparkSession, d: String): DataFrame = {
    val ct = MergeTable.ChangeType
    val schema = new StructType()
      .add("o_orderkey", LongType).add("o_custkey", LongType)
      .add("price", DoubleType).add(ct, StringType).add("seq", LongType)
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").as("price"))
    val rawDir = scratch("graft_q_scdc_raw")
    val ckpt = scratch("graft_q_scdc_ckpt")
    // pk stats + bloom feed the per-batch guard probe (the guards read
    // only files that may hold the batch's keys, not the whole table)
    val t = MergeTable(s, scratch("graft_q_scdc_tbl"), None,
      Seq("o_orderkey"), deletionVectors = false,
      bloomCols = Seq("o_orderkey"))

    val upd = base.filter(col("o_orderkey") % 4 === 0)
      .withColumn("price", col("price") + 10.0)
      .withColumn(ct, lit("update")).withColumn("seq", lit(3L))
    val del = base.filter(col("o_orderkey") % 9 === 0)
      .withColumn(ct, lit("delete")).withColumn("seq", lit(4L))
    val late = base.filter(col("o_orderkey") % 4 === 0)
      .withColumn("price", col("price") + 999.0)
      .withColumn(ct, lit("update")).withColumn("seq", lit(2L))
    val res = base.filter(col("o_orderkey") % 18 === 0)
      .withColumn("price",
        (col("o_orderkey") % 500).cast("double") + 0.25)
      .withColumn(ct, lit("insert")).withColumn("seq", lit(5L))

    // all three commit waves land up front, one stamped FILE each, and
    // a single AvailableNow start with maxFilesPerTrigger=1 applies
    // them as ORDERED micro-batches: each batch's cross-batch guards
    // (tombstones + stored (pk, seq)) read the table state the
    // PREVIOUS batch committed — exactly the semantics of the old
    // one-start-per-wave shape, without paying three query starts (the
    // per-start fixed cost dominated this query; r13 verdict #5 —
    // the same X191 single-start move that closed the window/session
    // family's regression).
    stampedWave(base.withColumn(ct, lit("insert"))
      .withColumn("seq", lit(1L)), rawDir, 1)
    stampedWave(upd.unionByName(del), rawDir, 2)
    stampedWave(late.unionByName(res), rawDir, 3)
    StreamIngest.runCdcAvailableNow(s, rawDir, schema, t,
      "o_orderkey", "seq", ckpt, maxFilesPerTrigger = Some(1))

    t.read().select(col("o_orderkey"), col("o_custkey"),
      round(col("price"), 2).as("price"), col("seq"))
  }

  /** Streaming SCD2 under the oracle gate (X89 end-to-end): customer
    * history maintained by [[StreamIngest.runScd2AvailableNow]] across
    * two drains sharing one checkpoint — the base dimension at
    * 2024-01-01, then ONE batch spanning TWO labels (key%5=0 rebalanced
    * +100 at 2024-02-01 and key%3=0 rebalanced +200 at 2024-03-01; the
    * drain must apply them in label order or %15=0 keys' middle version
    * never opens/closes correctly). The full history — every version
    * with its open/close labels — hash-matches the oracle's
    * lead()-closed replay. */
  def streamScd2(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamScd2Impl(s, d))

  private def streamScd2Impl(s: SparkSession, d: String): DataFrame = {
    import graft.lake.Scd2
    val schema = new StructType()
      .add("c_custkey", LongType).add("bal", DoubleType)
      .add("eff", StringType)
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal").as("bal"))
    val rawDir = scratch("graft_q_sscd_raw")
    val ckpt = scratch("graft_q_sscd_ckpt")
    val t = MergeTable(s, scratch("graft_q_sscd_tbl"), Some(Scd2.Slice))

    writeWave(cust.withColumn("eff", lit("2024-01-01")), rawDir)
    StreamIngest.runScd2AvailableNow(s, rawDir, schema, t,
      "c_custkey", "eff", ckpt)

    val w2 = cust.filter(col("c_custkey") % 5 === 0)
      .withColumn("bal", col("bal") + 100.0)
      .withColumn("eff", lit("2024-02-01"))
    val w3 = cust.filter(col("c_custkey") % 3 === 0)
      .withColumn("bal", col("bal") + 200.0)
      .withColumn("eff", lit("2024-03-01"))
    writeWave(w2.unionByName(w3), rawDir)
    StreamIngest.runScd2AvailableNow(s, rawDir, schema, t,
      "c_custkey", "eff", ckpt)

    t.read().select(col("c_custkey"), round(col("bal"), 2).as("bal"),
      col(Scd2.EffFrom).as("eff_from"),
      coalesce(col(Scd2.EffTo), lit("open")).as("eff_to"),
      col(Scd2.Current).as("cur"))
  }

  val streamScd2Oracle: String =
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
         FROM hist)
       SELECT c_custkey, round(bal, 2) AS bal, eff_from,
              coalesce(eff_to, 'open') AS eff_to,
              eff_to IS NULL AS cur
       FROM h2 ORDER BY c_custkey, eff_from"""

  /** Watermarked event-time windowing under the oracle gate (X26
    * end-to-end): the full events corpus drains through a REAL
    * append-mode streaming aggregation — file source → 1-day tumbling
    * windows on event time → 1-hour watermark → `foreachBatch` append
    * sink — and the emitted (finalized) windows hash-match a plain
    * GROUP BY replay.
    *
    * Append mode only emits a window once the watermark passes its
    * end, and whether a run's FINAL watermark flushes trailing state
    * is an engine detail (no-data micro-batches) no oracle should
    * depend on. Two sentinel waves make emission deterministic without
    * touching that detail — since r13 as a stamped-mtime backlog
    * drained by ONE AvailableNow start under maxFilesPerTrigger=1
    * (three ordered micro-batches; the watermark advances between
    * micro-batches exactly as it did between the three former query
    * starts): the corpus batch (slot 0) commits the max−1h watermark
    * closing nothing late; the sentinel-2d batch runs with it; the
    * sentinel-4d batch runs with max+2d−1h committed — past every real
    * window's end — so it provably emits every remaining real window
    * in a DATA batch. Sentinel rows are tagged and filtered from the
    * result; whether their own windows ever flush is irrelevant. The
    * corpus wave is ONE file (one micro-batch), so no intra-batch
    * ordering can drop late rows nondeterministically. */
  def streamWindow(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamWindowImpl(s, d))

  private def streamWindowImpl(s: SparkSession, d: String): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val schema = new StructType()
      .add("event_id", LongType).add("ts_s", StringType)
      .add("event_type", StringType)
    val ev = Tables.events(s, d).select(col("event_id"),
      date_format(col("ts"), fmt).as("ts_s"), col("event_type"))
    val rawDir = scratch("graft_q_swin_raw")
    val ckpt = scratch("graft_q_swin_ckpt")
    val outDir = scratch("graft_q_swin_out") + "/emitted"
    // ONE query start over the stamped backlog (r13, the same layout
    // q_stream_ojoin validated): corpus at slot 0, sentinels at 2/4 —
    // three ordered micro-batches, the watermark advancing between
    // them exactly as it did between the three former drains
    def drain(): Unit = {
      val q = s.readStream.format("csv").option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .schema(schema).load(rawDir)
        .withColumn("ts", to_timestamp(col("ts_s"), fmt))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id") % 1000).as("v_sum"))
        .select(col("window.start").as("day"), col("event_type"),
          col("n_events"), col("v_sum"))
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(outDir)
        }
        .start()
      q.awaitTermination()
    }
    val maxS = Tables.events(s, d)
      .agg(date_format(max(col("ts")), fmt)).head().getString(0)
    def sentinel(days: Int): DataFrame = {
      import s.implicits._
      Seq((0L, "__s")).toDF("event_id", "event_type")
        .withColumn("ts_s", date_format(
          to_timestamp(lit(maxS), fmt) + expr(s"INTERVAL $days DAYS"), fmt))
        .select(col("event_id"), col("ts_s"), col("event_type"))
    }
    stampedWave(ev, rawDir, 0)
    stampedWave(sentinel(2), rawDir, 2)
    stampedWave(sentinel(4), rawDir, 4)
    drain()
    s.read.parquet(outDir).filter(col("event_type") =!= "__s")
      .select(col("day").cast("date").as("day"), col("event_type"),
        col("n_events"), col("v_sum"))
  }

  /** Watermarked GAP-SESSION windowing under the oracle gate (X62's
    * declarative tier end-to-end): user-keyed 30-minute-gap sessions
    * through a real append-mode `session_window` stream — the same
    * sentinel-wave determinism design as [[streamWindow]] (sentinels
    * carry user_id −1, so they can never extend a real session, and
    * every real session's end ≤ max+30min is provably behind drain 3's
    * committed watermark). Emitted sessions are re-ranked per user
    * into ordinal session ids (emitted-session-sized window) and
    * hash-match the oracle's lag/cumulative-flag sessionization. */
  def streamSessions(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamSessionsImpl(s, d))

  private def streamSessionsImpl(s: SparkSession, d: String): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val schema = new StructType()
      .add("event_id", LongType).add("ts_s", StringType)
      .add("user_id", LongType)
    val ev = Tables.events(s, d).select(col("event_id"),
      date_format(col("ts"), fmt).as("ts_s"), col("user_id"))
    val rawDir = scratch("graft_q_sses_raw")
    val ckpt = scratch("graft_q_sses_ckpt")
    val outDir = scratch("graft_q_sses_out") + "/emitted"
    // ONE query start over the stamped backlog (r13, see streamWindow)
    def drain(): Unit = {
      val q = s.readStream.format("csv").option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .schema(schema).load(rawDir)
        .withColumn("ts", to_timestamp(col("ts_s"), fmt))
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id") % 1000).as("v_sum"))
        .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
          col("n_events"), col("v_sum"))
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(outDir)
        }
        .start()
      q.awaitTermination()
    }
    val maxS = Tables.events(s, d)
      .agg(date_format(max(col("ts")), fmt)).head().getString(0)
    def sentinel(days: Int): DataFrame = {
      import s.implicits._
      Seq((0L, -1L)).toDF("event_id", "user_id")
        .withColumn("ts_s", date_format(
          to_timestamp(lit(maxS), fmt) + expr(s"INTERVAL $days DAYS"), fmt))
        .select(col("event_id"), col("ts_s"), col("user_id"))
    }
    stampedWave(ev, rawDir, 0)
    stampedWave(sentinel(2), rawDir, 2)
    stampedWave(sentinel(4), rawDir, 4)
    drain()
    val w = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    s.read.parquet(outDir).filter(col("user_id") >= 0)
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("start_us"),
        col("n_events"), col("v_sum"))
  }

  /** Stream-stream INTERVAL JOIN under the oracle gate (X40
    * end-to-end, through the [[EventStreams.clickAttribution]] library
    * operator): clicks and impressions drain as two file-source
    * streams into one append-mode join — each click attributed to the
    * same user's impressions within the preceding 30 minutes.
    *
    * Determinism needs no sentinels here: an INNER stream-stream join
    * emits a match as soon as both rows have been processed
    * (watermarks only bound state retention), and each side's corpus
    * is ONE file, so the single AvailableNow batch holds both sides in
    * full — every match provably emits, none can be dropped by state
    * eviction mid-drain. The hash therefore pins the interval-join
    * semantics themselves (bounds, user equi-key, duplicate matches)
    * against a plain SQL self-join replay. */
  def streamIntervalJoin(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamIntervalJoinImpl(s, d))

  private def streamIntervalJoinImpl(s: SparkSession, d: String): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val schema = new StructType()
      .add("ts_s", StringType).add("user_id", LongType)
      .add("value", DoubleType)
    val ev = Tables.events(s, d)
    def side(tpe: String, dir: String): DataFrame = {
      writeWave(ev.filter(col("event_type") === tpe)
        .select(date_format(col("ts"), fmt).as("ts_s"),
          col("user_id"), col("value")).coalesce(1), dir)
      s.readStream.format("csv").option("header", "true")
        .schema(schema).load(dir)
        .withColumn("ts", to_timestamp(col("ts_s"), fmt))
        .select(col("user_id"), col("ts"), col("value"))
    }
    val impDir = scratch("graft_q_sij_imp")
    val clkDir = scratch("graft_q_sij_clk")
    val ckpt = scratch("graft_q_sij_ckpt")
    val outDir = scratch("graft_q_sij_out") + "/emitted"
    val joined = EventStreams.clickAttribution(
      side("view", impDir), side("click", clkDir), windowMinutes = 30)
    val q = joined.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir).select(col("user_id"),
      unix_micros(col("imp_ts")).as("imp_us"),
      unix_micros(col("click_ts")).as("click_us"),
      round(col("imp_value"), 2).as("imp_value"),
      round(col("click_value"), 2).as("click_value"))
  }

  /** Stream-stream LEFT OUTER interval join under the oracle gate
    * (r13, through [[EventStreams.clickAttributionOuter]]): every
    * click attributed to in-window impressions, and every UNMATCHED
    * click emitted once with null impression columns — the
    * attribution-with-misses shape the inner join (`q_stream_ijoin`)
    * cannot express.
    *
    * Determinism argument, and why this runs as ONE query start where
    * the window/session queries use three: null rows emit at state
    * EVICTION, which happens when a micro-batch STARTS with a
    * watermark past the click's join window — so the drain needs
    * watermark-advancing batches AFTER the corpus batch. Instead of
    * separate sentinel drains (3 query starts × fixed micro-batch
    * machinery), the raw zones are laid out up front — corpus wave,
    * then two sentinel waves (+2d, +4d, user −1) on BOTH sides — with
    * explicitly stamped, strictly increasing mtimes, and ONE
    * AvailableNow run under `maxFilesPerTrigger = 1` processes them as
    * three ordered micro-batches (the file source orders its backlog
    * by mtime; stamping removes the same-millisecond tie-break
    * nondeterminism). Batch 1 holds both corpora in full, so every
    * MATCH emits there (co-presence, exactly the inner join's
    * argument); batch 2 starts at watermark max−1h, batch 3 at
    * max+2d−1h > max, so every real unmatched click is provably
    * evicted-and-emitted by batch 3. Sentinel order between the +2d
    * and +4d waves is immaterial (watermarks fold by max; a sentinel
    * arriving behind the watermark is dropped late, and sentinels are
    * filtered from the result either way). The +4d sentinel click
    * itself is never evicted — it parks in state and the query ends —
    * which is fine: sentinels carry user −1 and are filtered. */
  def streamIntervalJoinOuter(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamIntervalJoinOuterImpl(s, d))

  private def streamIntervalJoinOuterImpl(s: SparkSession, d: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val schema = new StructType()
      .add("ts_s", StringType).add("user_id", LongType)
      .add("value", DoubleType)
    val ev = Tables.events(s, d)
    val impDir = scratch("graft_q_soj_imp")
    val clkDir = scratch("graft_q_soj_clk")
    val ckpt = scratch("graft_q_soj_ckpt")
    val outDir = scratch("graft_q_soj_out") + "/emitted"
    def side(tpe: String): DataFrame = ev
      .filter(col("event_type") === tpe)
      .select(date_format(col("ts"), fmt).as("ts_s"),
        col("user_id"), col("value"))
    val maxS = ev.agg(date_format(max(col("ts")), fmt)).head().getString(0)
    def sentinel(days: Int): DataFrame = {
      import s.implicits._
      Seq((-1L, 0.0)).toDF("user_id", "value")
        .withColumn("ts_s", date_format(
          to_timestamp(lit(maxS), fmt) + expr(s"INTERVAL $days DAYS"), fmt))
        .select(col("ts_s"), col("user_id"), col("value"))
    }
    stampedWave(side("view"), impDir, 0)
    stampedWave(side("click"), clkDir, 0)
    stampedWave(sentinel(2), impDir, 2)
    stampedWave(sentinel(2), clkDir, 2)
    stampedWave(sentinel(4), impDir, 4)
    stampedWave(sentinel(4), clkDir, 4)
    def src(dir: String): DataFrame = s.readStream.format("csv")
      .option("header", "true").option("maxFilesPerTrigger", 1)
      .schema(schema).load(dir)
      .withColumn("ts", to_timestamp(col("ts_s"), fmt))
      .select(col("user_id"), col("ts"), col("value"))
    val joined = EventStreams.clickAttributionOuter(
      src(impDir), src(clkDir), windowMinutes = 30)
    val q = joined.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir).filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_micros(col("imp_ts")).as("imp_us"),
        unix_micros(col("click_ts")).as("click_us"),
        round(col("imp_value"), 2).as("imp_value"),
        round(col("click_value"), 2).as("click_value"))
  }

  /** CUSTOM-STATE sessionization under the oracle gate (X62's
    * `flatMapGroupsWithState` tier end-to-end): the same user-keyed
    * 30-minute-gap sessions as [[streamSessions]], but through the
    * hand-written keyed-state operator ([[EventStreams.sessionize]] —
    * event-time timeouts close parked sessions when the watermark
    * passes their gap horizon; in-batch gaps close eagerly). The
    * sentinel-wave design makes every real session's emission a DATA
    * batch certainty: drain 2's batch fires timers up to wave 1's
    * committed watermark, drain 3's fires everything left (its
    * watermark sits 2 days past the last real event).
    *
    * One deliberate difference from the declarative form: the state
    * fold tracks MILLISECOND event times (`Timestamp.getTime`), so the
    * oracle's gap arithmetic and session bounds use `epoch_ms` — the
    * hash match pins that precision contract too. */
  def streamSessionsCustom(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamSessionsCustomImpl(s, d))

  private def streamSessionsCustomImpl(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val schema = new StructType()
      .add("ts_s", StringType).add("user_id", LongType)
      .add("value", DoubleType)
    val ev = Tables.events(s, d).select(
      date_format(col("ts"), fmt).as("ts_s"), col("user_id"),
      col("value"))
    val rawDir = scratch("graft_q_scs_raw")
    val ckpt = scratch("graft_q_scs_ckpt")
    val outDir = scratch("graft_q_scs_out") + "/emitted"
    // ONE query start over the stamped backlog (r13, see streamWindow):
    // timers fire per MICRO-BATCH with the watermark committed by the
    // previous one — the same horizon sequence the three former drains
    // produced
    def drain(): Unit = {
      val src = s.readStream.format("csv").option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .schema(schema).load(rawDir)
        .withColumn("ts", to_timestamp(col("ts_s"), fmt))
        .select(col("user_id"), col("ts"), col("value"))
        .as[EventStreams.Ev]
      val q = EventStreams.sessionize(src)
        .toDF()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(outDir)
        }
        .start()
      q.awaitTermination()
    }
    val maxS = Tables.events(s, d)
      .agg(date_format(max(col("ts")), fmt)).head().getString(0)
    def sentinel(days: Int): DataFrame = {
      Seq((-1L, 0.0)).toDF("user_id", "value")
        .withColumn("ts_s", date_format(
          to_timestamp(lit(maxS), fmt) + expr(s"INTERVAL $days DAYS"), fmt))
        .select(col("ts_s"), col("user_id"), col("value"))
    }
    stampedWave(ev, rawDir, 0)
    stampedWave(sentinel(2), rawDir, 2)
    stampedWave(sentinel(4), rawDir, 4)
    drain()
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("session_start"))
    s.read.parquet(outDir).filter(col("user_id") >= 0)
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"),
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"),
        col("n_events"), round(col("sum_value"), 2).as("sum_value"))
  }

  val streamSessionsCustomOracle: String =
    """WITH g AS (
         SELECT user_id, event_id, value, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w)
                          >= 1800000
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (
         SELECT user_id, value, ts,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
         FROM g)
       SELECT user_id, session_id,
              CAST(epoch_ms(min(ts)) AS BIGINT) AS start_ms,
              CAST(epoch_ms(max(ts)) AS BIGINT) AS end_ms,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS sum_value
       FROM s GROUP BY user_id, session_id
       ORDER BY user_id, session_id"""

  val streamIntervalJoinOracle: String =
    """SELECT c.user_id,
              CAST(epoch_us(i.ts) AS BIGINT) AS imp_us,
              CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
              round(i.value, 2) AS imp_value,
              round(c.value, 2) AS click_value
       FROM events c JOIN events i ON c.user_id = i.user_id
        AND c.event_type = 'click' AND i.event_type = 'view'
        AND i.ts <= c.ts AND i.ts >= c.ts - INTERVAL 30 MINUTE
       ORDER BY c.user_id, imp_us, click_us"""

  val streamIntervalJoinOuterOracle: String =
    """SELECT c.user_id,
              CAST(epoch_us(i.ts) AS BIGINT) AS imp_us,
              CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
              round(i.value, 2) AS imp_value,
              round(c.value, 2) AS click_value
       FROM (SELECT * FROM events WHERE event_type = 'click') c
       LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') i
         ON c.user_id = i.user_id
        AND i.ts <= c.ts AND i.ts >= c.ts - INTERVAL 30 MINUTE
       ORDER BY c.user_id, click_us, imp_us"""

  val streamSessionsOracle: String =
    """WITH g AS (
         SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          >= 1800000000
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (
         SELECT user_id, event_id, ts,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
         FROM g)
       SELECT user_id, session_id,
              CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(event_id % 1000) AS BIGINT) AS v_sum
       FROM s GROUP BY user_id, session_id
       ORDER BY user_id, session_id"""

  val streamWindowOracle: String =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(event_id % 1000) AS BIGINT) AS v_sum
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Watermarked STREAMING DEDUPLICATION under the oracle gate
    * (Spark's `dropDuplicatesWithinWatermark`, the at-least-once →
    * exactly-once ingest repair every training-data feed needs: an
    * upstream bus re-delivers, the corpus must not double-count).
    * Four stamped waves, ONE AvailableNow start (see [[stampedWave]]):
    *
    *   slot 0 — the full events corpus (30 days of event time);
    *   slot 2 — byte-identical RE-DELIVERY of every `event_id % 5 = 0`
    *            row: the dedup state (watermark delay 40 d ≥ twice the
    *            corpus span / 2) is still holding every key, so all
    *            are suppressed;
    *   slot 4 — a sentinel 90 d past the corpus max: the NEXT batch's
    *            watermark jumps to max+50 d, past every key's
    *            `ts + 40 d` expiry;
    *   slot 6 — a second sentinel: ITS batch runs under the jumped
    *            watermark, so its end-of-batch maintenance evicts the
    *            ENTIRE corpus state (watermarks — and therefore
    *            eviction — trail the data that moved them by one
    *            batch; the bounded-state contract: at 100 TB/day the
    *            operator holds a watermark window of keys, never the
    *            corpus);
    *   slot 8 — re-delivery of every `event_id % 7 = 3` key with a
    *            FRESH event time above the watermark (a retry beyond
    *            the dedup horizon): state is gone, so these emit
    *            AGAIN — exactly the documented within-watermark
    *            contract (the guarantee is one-sided: dups are dropped
    *            AT LEAST within the delay), made visible as `n = 2`.
    *
    * The final count per key is therefore closed-form: 2 for
    * `% 7 = 3` keys, 1 otherwise — a hash mismatch catches a dedup
    * that failed (wave-2 key at 2), state that never evicted (wave-4
    * key at 1), or a checkpoint that replayed a batch. */
  def streamDedup(s: SparkSession, d: String): DataFrame =
    withStatePartitions(s)(streamDedupImpl(s, d))

  private def streamDedupImpl(s: SparkSession, d: String): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val schema = new StructType()
      .add("event_id", LongType).add("ts_s", StringType)
    val ev = Tables.events(s, d).select(col("event_id"),
      date_format(col("ts"), fmt).as("ts_s"))
    val rawDir = scratch("graft_q_sdup_raw")
    val ckpt = scratch("graft_q_sdup_ckpt")
    val outDir = scratch("graft_q_sdup_out") + "/emitted"
    def drain(): Unit = {
      val q = s.readStream.format("csv").option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .schema(schema).load(rawDir)
        .withColumn("ts", to_timestamp(col("ts_s"), fmt))
        .withWatermark("ts", "40 days")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"))
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(outDir)
        }
        .start()
      q.awaitTermination()
    }
    val maxS = Tables.events(s, d)
      .agg(date_format(max(col("ts")), fmt)).head().getString(0)
    def shifted(df: DataFrame, days: Int): DataFrame =
      df.withColumn("ts_s", date_format(
        to_timestamp(lit(maxS), fmt) + expr(s"INTERVAL $days DAYS"), fmt))
        .select(col("event_id"), col("ts_s"))
    stampedWave(ev, rawDir, 0)
    stampedWave(ev.filter(col("event_id") % 5 === 0), rawDir, 2)
    stampedWave(shifted(
      s.range(-1, 0).toDF("event_id"), 90), rawDir, 4)
    stampedWave(shifted(
      s.range(-2, -1).toDF("event_id"), 90), rawDir, 6)
    stampedWave(shifted(
      ev.filter(col("event_id") % 7 === 3), 91), rawDir, 8)
    drain()
    s.read.parquet(outDir).filter(col("event_id") >= 0)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
  }

  val streamDedupOracle: String =
    """SELECT event_id,
              CAST(CASE WHEN event_id % 7 = 3 THEN 2 ELSE 1 END
                AS BIGINT) AS n
       FROM events ORDER BY event_id"""

  val streamCdcOracle: String =
    """SELECT o_orderkey, o_custkey,
              round(CASE WHEN o_orderkey % 18 = 0
                         THEN CAST(o_orderkey % 500 AS DOUBLE) + 0.25
                         WHEN o_orderkey % 4 = 0 THEN o_totalprice + 10.0
                         ELSE o_totalprice END, 2) AS price,
              CAST(CASE WHEN o_orderkey % 18 = 0 THEN 5
                        WHEN o_orderkey % 4 = 0 THEN 3
                        ELSE 1 END AS BIGINT) AS seq
       FROM orders
       WHERE o_orderkey % 9 <> 0 OR o_orderkey % 18 = 0
       ORDER BY o_orderkey"""
}
