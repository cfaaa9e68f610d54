package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkSpec
import graft.lake.MergeTable

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("order_id", StringType),
    StructField("date", StringType),
    StructField("amount", StringType)))

  private def writeCsv(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name),
      ("order_id,date,amount" +: rows).mkString("\n"))

  private def ids(t: MergeTable): Set[String] =
    t.read().select("order_id").as[String].collect().toSet

  test("AvailableNow drains the raw zone and checkpoint skips processed files") {
    val raw = tmpDir("raw")
    val ckpt = tmpDir("ckpt").toString
    val t = MergeTable(spark, tmpDir("tbl").toString, Some("date"))
    writeCsv(raw, "f1.csv", "o1,2024-01-01,10.0", "o2,2024-01-02,20.0")

    val b1 = StreamIngest.runAvailableNow(spark, raw.toString, schema, t,
      "order_id", ckpt)
    assert(b1 >= 1)
    assert(ids(t) === Set("o1", "o2"))

    // Second drain with no new files: checkpoint = processed markers,
    // nothing replays, table version does not advance.
    val vBefore = t.latestVersion()
    StreamIngest.runAvailableNow(spark, raw.toString, schema, t,
      "order_id", ckpt)
    assert(t.latestVersion() === vBefore)

    // New file arrives → only it is ingested; existing key upserts.
    writeCsv(raw, "f2.csv", "o2,2024-01-02,99.0", "o3,2024-01-03,30.0")
    StreamIngest.runAvailableNow(spark, raw.toString, schema, t,
      "order_id", ckpt)
    assert(ids(t) === Set("o1", "o2", "o3"))
    val o2 = t.read().filter(col("order_id") === "o2")
      .select("amount").as[String].head()
    assert(o2 === "99.0", "late duplicate key must upsert, not duplicate")
  }

  test("transform hook conforms batches before the merge") {
    val raw = tmpDir("raw")
    val t = MergeTable(spark, tmpDir("tbl").toString, Some("date"))
    writeCsv(raw, "f1.csv", "o1,2024-01-01,10.0")
    StreamIngest.runAvailableNow(spark, raw.toString, schema, t, "order_id",
      tmpDir("ckpt").toString,
      transform = _.withColumn("amount", col("amount").cast("double")))
    assert(t.read().schema("amount").dataType.typeName === "double")
  }

  test("a materialized view follows streaming ingest via the change feed") {
    val raw = tmpDir("raw")
    val ckpt = tmpDir("ckpt").toString
    val t = MergeTable(spark, tmpDir("tbl").toString, Some("date"))
    val typed: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.withColumn("amount", col("amount").cast("double"))
    writeCsv(raw, "f1.csv", "o1,2024-01-01,10.0", "o2,2024-01-02,20.0")
    StreamIngest.runAvailableNow(spark, raw.toString, schema, t,
      "order_id", ckpt, transform = typed)
    val vInit = t.latestVersion()
    // materialize the view ONCE at the current version...
    var agg = graft.lake.IncrementalAgg
      .fullAggregate(t.readVersion(vInit), "date", "amount")
    // ...then a second ingest wave (upsert + insert) arrives
    writeCsv(raw, "f2.csv", "o2,2024-01-02,99.0", "o3,2024-01-03,30.0")
    StreamIngest.runAvailableNow(spark, raw.toString, schema, t,
      "order_id", ckpt, transform = typed)
    val vNow = t.latestVersion()
    assert(vNow > vInit)
    // the view catches up from the log-pruned feed alone — the base
    // table is never rescanned
    agg = graft.lake.IncrementalAgg.applyDelta(agg,
      graft.lake.IncrementalAgg.sumCountDelta(
        t.changes(vInit, vNow, "order_id", updateImages = true),
        "date", "amount"),
      "date")
    val view = agg.as[(String, Double, Long)].collect().toSet
    val recomputed = graft.lake.IncrementalAgg
      .fullAggregate(t.read(), "date", "amount")
      .as[(String, Double, Long)].collect().toSet
    assert(view === recomputed)
    assert(view === Set(
      ("2024-01-01", 10.0, 1L), ("2024-01-02", 99.0, 1L),
      ("2024-01-03", 30.0, 1L)))
  }

  test("a JOIN view follows streaming ingest + dim changes via both feeds") {
    // the X125 composition: streamed facts ⋈ mutating dims, the view
    // caught up per drain from the two change feeds alone
    val raw = tmpDir("raw")
    val ckpt = tmpDir("ckpt").toString
    val f = MergeTable(spark, tmpDir("jf").toString, Some("date"))
    val d = MergeTable(spark, tmpDir("jd").toString, None)
    val v = MergeTable(spark, tmpDir("jv").toString, None)
    val typed: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.withColumn("amount", col("amount").cast("double"))
    d.overwrite(Seq(("2024-01-01", "mon"), ("2024-01-02", "tue"))
      .toDF("date", "dow"))
    writeCsv(raw, "f1.csv", "o1,2024-01-01,10.0", "o2,2024-01-02,20.0")
    StreamIngest.runAvailableNow(spark, raw.toString, schema, f,
      "order_id", ckpt, transform = typed)
    val (vf1, vd1) = (f.latestVersion(), d.latestVersion())
    v.overwrite(graft.lake.IncrementalJoin.fullJoin(f.read(), d.read(), "date"))
    // wave 2: streamed upsert+insert AND a dim update+insert land
    writeCsv(raw, "f2.csv", "o2,2024-01-02,99.0", "o3,2024-01-03,30.0")
    StreamIngest.runAvailableNow(spark, raw.toString, schema, f,
      "order_id", ckpt, transform = typed)
    d.merge(Seq(("2024-01-02", "TUE"), ("2024-01-03", "wed"))
      .toDF("date", "dow"), "date")
    graft.lake.IncrementalJoin.refresh(v, f, d, "order_id", "date",
      vf1, f.latestVersion(), vd1, d.latestVersion())
    val view = v.read().select("order_id", "date", "amount", "dow")
      .as[(String, String, Double, String)].collect().toSet
    val recomputed = graft.lake.IncrementalJoin
      .fullJoin(f.read(), d.read(), "date")
      .select("order_id", "date", "amount", "dow")
      .as[(String, String, Double, String)].collect().toSet
    assert(view === recomputed)
    assert(view === Set(
      ("o1", "2024-01-01", 10.0, "mon"),
      ("o2", "2024-01-02", 99.0, "TUE"),
      ("o3", "2024-01-03", 30.0, "wed")))
  }

  test("streaming SCD2 maintains dimension history across drains") {
    import graft.lake.Scd2
    val dimSchema = StructType(Seq(
      StructField("prod_id", StringType),
      StructField("price", StringType),
      StructField("as_of", StringType)))
    val raw = tmpDir("raw")
    val ckpt = tmpDir("ckpt").toString
    val t = MergeTable(spark, tmpDir("dim").toString, Some(Scd2.Slice))
    def writeDim(name: String, rows: String*): Unit =
      Files.writeString(raw.resolve(name),
        ("prod_id,price,as_of" +: rows).mkString("\n"))

    // one file spanning TWO labels: both waves apply, in label order
    writeDim("d1.csv",
      "p1,10,2024-01-01", "p2,5,2024-01-01", "p1,20,2024-02-01")
    val w1 = StreamIngest.runScd2AvailableNow(spark, raw.toString, dimSchema,
      t, "prod_id", "as_of", ckpt)
    assert(w1 === 2, "two labels = two SCD2 waves")
    def hist(): Set[(String, String, String, String, Boolean)] =
      t.read().select(col("prod_id"), col("price"), col(Scd2.EffFrom),
          col(Scd2.EffTo), col(Scd2.Current))
        .as[(String, String, String, Option[String], Boolean)]
        .collect().map(r => (r._1, r._2, r._3, r._4.orNull, r._5)).toSet
    assert(hist() === Set(
      ("p1", "10", "2024-01-01", "2024-02-01", false),
      ("p1", "20", "2024-02-01", null, true),
      ("p2", "5", "2024-01-01", null, true)))

    // re-drain with no new files: checkpoint skips everything
    val vBefore = t.latestVersion()
    StreamIngest.runScd2AvailableNow(spark, raw.toString, dimSchema,
      t, "prod_id", "as_of", ckpt)
    assert(t.latestVersion() === vBefore)

    // a late file with one real change and one no-op row
    writeDim("d2.csv", "p1,20,2024-03-01", "p2,6,2024-03-01")
    StreamIngest.runScd2AvailableNow(spark, raw.toString, dimSchema,
      t, "prod_id", "as_of", ckpt)
    assert(hist() === Set(
      ("p1", "10", "2024-01-01", "2024-02-01", false),
      ("p1", "20", "2024-02-01", null, true), // unchanged: not re-opened
      ("p2", "5", "2024-01-01", "2024-03-01", false),
      ("p2", "6", "2024-03-01", null, true)))
    // point-in-time question answered from the streamed history
    val janPrices = Scd2.asOfView(t, "2024-01-15")
      .select("prod_id", "price").as[(String, String)].collect().toSet
    assert(janPrices === Set(("p1", "10"), ("p2", "5")))
  }

  test("streaming CDC apply guards late events across drains") {
    import org.apache.spark.sql.types.LongType
    val cdcSchema = StructType(Seq(
      StructField("order_id", StringType),
      StructField("date", StringType),
      StructField("amount", StringType),
      StructField(MergeTable.ChangeType, StringType),
      StructField("seq", LongType)))
    val raw = tmpDir("raw")
    val ckpt = tmpDir("ckpt").toString
    val t = MergeTable(spark, tmpDir("tbl").toString, Some("date"))
    def writeCdc(name: String, rows: String*): Unit =
      Files.writeString(raw.resolve(name),
        (s"order_id,date,amount,${MergeTable.ChangeType},seq" +: rows)
          .mkString("\n"))
    def state(): Set[(String, String, Long)] =
      t.read().select("order_id", "amount", "seq")
        .as[(String, String, Long)].collect().toSet

    // drain 1: bootstrap inserts; o1 has TWO in-batch events → collapses
    // to its newest (seq 2)
    writeCdc("c1.csv",
      "o1,2024-01-01,10.0,insert,1",
      "o1,2024-01-01,12.0,update,2",
      "o2,2024-01-02,20.0,insert,1")
    assert(StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt) === 1)
    assert(state() === Set(("o1", "12.0", 2L), ("o2", "20.0", 1L)))

    // drain 2: update o1, delete o2, insert o3
    writeCdc("c2.csv",
      "o1,2024-01-01,50.0,update,5",
      "o2,2024-01-02,20.0,delete,2",
      "o3,2024-01-03,30.0,insert,1")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    assert(state() === Set(("o1", "50.0", 5L), ("o3", "30.0", 1L)))

    // drain 3: a LATE o1 event (seq 3 < stored 5) must be ignored while
    // the in-order o3 event applies — cross-batch sequence discipline
    writeCdc("c3.csv",
      "o1,2024-01-01,30.0,update,3",
      "o3,2024-01-03,33.0,update,2")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    assert(state() === Set(("o1", "50.0", 5L), ("o3", "33.0", 2L)))

    // drain 4: ONLY late events → guard empties the batch, no commit
    val vBefore = t.latestVersion()
    writeCdc("c4.csv", "o1,2024-01-01,1.0,update,4")
    assert(StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt) === 0)
    assert(t.latestVersion() === vBefore)

    // re-drain with no new files: checkpoint skips everything
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    assert(t.latestVersion() === vBefore)
    assert(state() === Set(("o1", "50.0", 5L), ("o3", "33.0", 2L)))
  }

  test("streaming CDC apply: tombstones reject post-delete stragglers") {
    import org.apache.spark.sql.types.LongType
    val cdcSchema = StructType(Seq(
      StructField("order_id", StringType),
      StructField("amount", StringType),
      StructField(MergeTable.ChangeType, StringType),
      StructField("seq", LongType)))
    val raw = tmpDir("raw")
    val ckpt = tmpDir("ckpt").toString
    val t = MergeTable(spark, tmpDir("tbl").toString)
    def writeCdc(name: String, rows: String*): Unit =
      Files.writeString(raw.resolve(name),
        (s"order_id,amount,${MergeTable.ChangeType},seq" +: rows)
          .mkString("\n"))
    def state(): Set[(String, String, Long)] =
      t.read().select("order_id", "amount", "seq")
        .as[(String, String, Long)].collect().toSet

    writeCdc("c1.csv", "o1,10.0,insert,1", "o2,20.0,insert,1")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    writeCdc("c2.csv", "o1,10.0,delete,3")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    assert(state() === Set(("o2", "20.0", 1L)))

    // the straggler: an update sequenced BEFORE the delete arrives in a
    // LATER drain. The live (pk, seq) guard lost its row with the
    // delete — only the tombstone can reject this. The key must stay
    // deleted (and the in-order o2 event must still land).
    writeCdc("c3.csv", "o1,99.0,update,2", "o2,22.0,update,2")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    assert(state() === Set(("o2", "22.0", 2L)))

    // a delete straggler below the tombstone (o1 deleted at 3; this one
    // sequenced 1, key still absent so only the tombstone can see it)
    // is rejected too — an all-stale drain commits no new target version
    val vBefore = t.latestVersion()
    writeCdc("c4.csv", "o1,0.0,delete,1")
    assert(StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt) === 0)
    assert(t.latestVersion() === vBefore)

    // a legitimate re-insert sequenced AFTER the delete resurrects the
    // key; its stale tombstone must not block subsequent updates
    writeCdc("c5.csv", "o1,50.0,insert,4")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    writeCdc("c6.csv", "o1,60.0,update,5")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    assert(state() === Set(("o1", "60.0", 5L), ("o2", "22.0", 2L)))

    // retention window: o1's tombstone (deleted-at 3) ages out below 4;
    // expiry is idempotent and leaves nothing else behind
    assert(StreamIngest.expireTombstones(spark, t, "seq", below = 4L) === 1L)
    assert(StreamIngest.expireTombstones(spark, t, "seq", below = 4L) === 0L)
  }

  test("streaming CDC apply matches a reference applier on random feeds") {
    // Adversarial evidence for the guard semantics: random multi-drain
    // event sequences (out-of-order, interleaved deletes/re-inserts,
    // cross-drain stragglers) vs a driver-side reference state machine
    // implementing the DOCUMENTED rules — per drain, an event is
    // admitted iff its sequence exceeds BOTH its key's tombstone and the
    // live row's stored sequence; admitted events collapse to each key's
    // newest; a delete removes the row and records the tombstone.
    import org.apache.spark.sql.types.LongType
    val cdcSchema = StructType(Seq(
      StructField("order_id", StringType),
      StructField("amount", StringType),
      StructField(MergeTable.ChangeType, StringType),
      StructField("seq", LongType)))
    val rnd = new scala.util.Random(20260813L) // deterministic
    for (trial <- 1 to 3) {
      val raw = tmpDir(s"raw$trial")
      val ckpt = tmpDir(s"ckpt$trial").toString
      val t = MergeTable(spark, tmpDir(s"tbl$trial").toString)
      // one event per (key, seq); amount derives from both so any
      // mis-admitted event shows up in the value, not just the keyset
      val keys = Seq("k1", "k2", "k3", "k4")
      val events = rnd.shuffle(for {
        k <- keys; seq <- 1L to 6L
      } yield {
        val kind = rnd.nextInt(10) match {
          case 0 | 1 => "delete"
          case 2     => "insert"
          case _     => "update"
        }
        (k, s"$k-$seq", kind, seq)
      })
      val drains = events.grouped((events.size + 3) / 4).toSeq
      var live = Map.empty[String, (String, Long)] // key -> (amount, seq)
      var tomb = Map.empty[String, Long]
      drains.zipWithIndex.foreach { case (batch, i) =>
        Files.writeString(raw.resolve(s"c$i.csv"),
          (s"order_id,amount,${MergeTable.ChangeType},seq" +:
            batch.map { case (k, a, c, q) => s"$k,$a,$c,$q" }).mkString("\n"))
        StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
          t, "order_id", "seq", ckpt)
        // reference applier, documented semantics
        batch.groupBy(_._1).foreach { case (k, evs) =>
          val admitted = evs.filter { case (_, _, _, q) =>
            q > tomb.getOrElse(k, Long.MinValue) &&
              q > live.get(k).map(_._2).getOrElse(Long.MinValue)
          }
          if (admitted.nonEmpty) {
            val (_, a, c, q) = admitted.maxBy(_._4)
            if (c == "delete") { live -= k; tomb += (k -> q) }
            else live += (k -> (a, q))
          }
        }
        val got = t.read().select("order_id", "amount", "seq")
          .as[(String, String, Long)].collect()
          .map { case (k, a, q) => k -> (a, q) }.toMap
        assert(got === live,
          s"trial $trial drain $i diverged from the reference applier " +
            s"(events: ${batch.mkString(", ")})")
      }
    }
  }

  test("CDC guards stay correct when the probe path actually prunes " +
      "(long pks + stats/bloom target)") {
    // Same reference state machine as the random-feed test, but the
    // target records pk stats + bloom sidecars, so the per-batch guard
    // reads go through MergeTable.probeKeys (file skipping) instead of
    // the full-read fallback — any file the probe wrongly skips would
    // lose a stored (pk, seq) guard row and admit a late event.
    import org.apache.spark.sql.types.LongType
    val cdcSchema = StructType(Seq(
      StructField("order_id", LongType),
      StructField("amount", StringType),
      StructField(MergeTable.ChangeType, StringType),
      StructField("seq", LongType)))
    val rnd = new scala.util.Random(20260814L)
    val raw = tmpDir("rawprobe")
    val ckpt = tmpDir("ckptprobe").toString
    val t = MergeTable(spark, tmpDir("tblprobe").toString, None,
      Seq("order_id"), deletionVectors = false,
      bloomCols = Seq("order_id"))
    val keys = Seq(100L, 5000L, 123456L, 9999999L)
    val events = rnd.shuffle(for {
      k <- keys; seq <- 1L to 6L
    } yield {
      val kind = rnd.nextInt(10) match {
        case 0 | 1 => "delete"
        case 2     => "insert"
        case _     => "update"
      }
      (k, s"$k-$seq", kind, seq)
    })
    val drains = events.grouped((events.size + 3) / 4).toSeq
    var live = Map.empty[Long, (String, Long)]
    var tomb = Map.empty[Long, Long]
    drains.zipWithIndex.foreach { case (batch, i) =>
      Files.writeString(raw.resolve(s"c$i.csv"),
        (s"order_id,amount,${MergeTable.ChangeType},seq" +:
          batch.map { case (k, a, c, q) => s"$k,$a,$c,$q" }).mkString("\n"))
      StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
        t, "order_id", "seq", ckpt)
      batch.groupBy(_._1).foreach { case (k, evs) =>
        val admitted = evs.filter { case (_, _, _, q) =>
          q > tomb.getOrElse(k, Long.MinValue) &&
            q > live.get(k).map(_._2).getOrElse(Long.MinValue)
        }
        if (admitted.nonEmpty) {
          val (_, a, c, q) = admitted.maxBy(_._4)
          if (c == "delete") { live -= k; tomb += (k -> q) }
          else live += (k -> (a, q))
        }
      }
      val got = t.read().select("order_id", "amount", "seq")
        .as[(Long, String, Long)].collect()
        .map { case (k, a, q) => k -> (a, q) }.toMap
      assert(got === live, s"drain $i diverged with the probe path on")
    }
  }

  test("CDC guards stay correct on OVER-WIDE batches through the " +
      "relation-valued probe (no full-read fallback, no key collect)") {
    // Same state machine, cap forced to 2 so every 4-key batch exceeds
    // the literal probe's bound: the guards must route through the r14
    // relation-valued probeKeys — wrong admission there loses a stored
    // (pk, seq) guard row and admits a late event.
    import org.apache.spark.sql.types.LongType
    val cdcSchema = StructType(Seq(
      StructField("order_id", LongType),
      StructField("amount", StringType),
      StructField(MergeTable.ChangeType, StringType),
      StructField("seq", LongType)))
    sys.props("graft.guard.probe.maxKeys") = "2"
    try {
      val rnd = new scala.util.Random(20260816L)
      val raw = tmpDir("rawwide")
      val ckpt = tmpDir("ckptwide").toString
      val t = MergeTable(spark, tmpDir("tblwide").toString, None,
        Seq("order_id"), deletionVectors = false,
        bloomCols = Seq("order_id"))
      val keys = Seq(100L, 5000L, 123456L, 9999999L)
      val events = rnd.shuffle(for {
        k <- keys; seq <- 1L to 6L
      } yield {
        val kind = rnd.nextInt(10) match {
          case 0 | 1 => "delete"
          case 2     => "insert"
          case _     => "update"
        }
        (k, s"$k-$seq", kind, seq)
      })
      val drains = events.grouped((events.size + 3) / 4).toSeq
      var live = Map.empty[Long, (String, Long)]
      var tomb = Map.empty[Long, Long]
      drains.zipWithIndex.foreach { case (batch, i) =>
        Files.writeString(raw.resolve(s"c$i.csv"),
          (s"order_id,amount,${MergeTable.ChangeType},seq" +:
            batch.map { case (k, a, c, q) => s"$k,$a,$c,$q" })
            .mkString("\n"))
        StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
          t, "order_id", "seq", ckpt)
        batch.groupBy(_._1).foreach { case (k, evs) =>
          val admitted = evs.filter { case (_, _, _, q) =>
            q > tomb.getOrElse(k, Long.MinValue) &&
              q > live.get(k).map(_._2).getOrElse(Long.MinValue)
          }
          if (admitted.nonEmpty) {
            val (_, a, c, q) = admitted.maxBy(_._4)
            if (c == "delete") { live -= k; tomb += (k -> q) }
            else live += (k -> (a, q))
          }
        }
        val got = t.read().select("order_id", "amount", "seq")
          .as[(Long, String, Long)].collect()
          .map { case (k, a, q) => k -> (a, q) }.toMap
        assert(got === live,
          s"drain $i diverged through the relation-probe guard path")
      }
    } finally sys.props.remove("graft.guard.probe.maxKeys")
  }

  test("maxFilesPerTrigger drains a backfill as bounded micro-batches " +
      "with identical final state") {
    // A 4-file backlog with cap=1 must arrive as 4 micro-batch MERGEs
    // (peak shuffle ∝ cap, not ∝ backlog) — and converge to exactly the
    // state an uncapped one-giant-batch drain produces.
    val rows = Seq(
      Seq("o1,2024-01-01,10.0", "o2,2024-01-02,20.0"),
      Seq("o2,2024-01-02,99.0", "o3,2024-01-03,30.0"),
      Seq("o4,2024-01-04,40.0"),
      Seq("o1,2024-01-01,11.0", "o5,2024-01-05,50.0"))
    val (rawA, rawB) = (tmpDir("rawcapA"), tmpDir("rawcapB"))
    // The file source orders a backlog by modification time; same-ms
    // writes tie and the tie-break is unspecified. A real backfill's
    // files carry their arrival mtimes — model that explicitly so the
    // capped drain's file order (and thus the upsert outcome) is
    // deterministic.
    val t0 = System.currentTimeMillis() - 60000
    rows.zipWithIndex.foreach { case (r, i) =>
      writeCsv(rawA, s"f$i.csv", r: _*)
      Files.setLastModifiedTime(rawA.resolve(s"f$i.csv"),
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000))
    }
    val capped = MergeTable(spark, tmpDir("tblcapA").toString, Some("date"))
    val seq = MergeTable(spark, tmpDir("tblcapB").toString, Some("date"))
    val vBase = capped.latestVersion()
    val batches = StreamIngest.runAvailableNow(spark, rawA.toString, schema,
      capped, "order_id", tmpDir("ckptcapA").toString,
      maxFilesPerTrigger = Some(1))
    assert(batches === 4L, "cap=1 over 4 files must yield 4 micro-batches")
    assert(capped.latestVersion() === vBase + 4,
      "each bounded micro-batch must land as its own MERGE commit")
    // Ground truth: the same files ARRIVING one uncapped drain at a
    // time (the steady-state cadence the capped backfill must
    // reproduce — file-order last-writer-wins on the upserted keys).
    // NOTE one giant uncapped batch over the full backlog is NOT that
    // ground truth: it would carry duplicate pks (o1, o2 recur across
    // files) into a single MERGE, which has no ordering column to
    // arbitrate them — exactly why a backfill drain over a keyed
    // upsert feed should be capped in the first place.
    val ckptB = tmpDir("ckptcapB").toString
    rows.zipWithIndex.foreach { case (r, i) =>
      writeCsv(rawB, s"f$i.csv", r: _*)
      StreamIngest.runAvailableNow(spark, rawB.toString, schema,
        seq, "order_id", ckptB)
    }
    def st(t: MergeTable): Set[(String, String)] =
      t.read().select("order_id", "amount").as[(String, String)]
        .collect().toSet
    assert(st(capped) === st(seq))
    assert(st(capped) === Set(("o1", "11.0"), ("o2", "99.0"),
      ("o3", "30.0"), ("o4", "40.0"), ("o5", "50.0")))
  }

  test("CDC guards hold per-batch under a capped multi-batch drain") {
    // cap=1 turns ONE drain call into per-file micro-batches, so the
    // cross-batch guards (live (pk,seq) + tombstones) are exercised at
    // realistic cadence WITHIN a single drain: a late event in a later
    // file must be rejected against state committed by an earlier file
    // of the same drain.
    import org.apache.spark.sql.types.LongType
    val cdcSchema = StructType(Seq(
      StructField("order_id", StringType),
      StructField("amount", StringType),
      StructField(MergeTable.ChangeType, StringType),
      StructField("seq", LongType)))
    val raw = tmpDir("rawcapcdc")
    val t = MergeTable(spark, tmpDir("tblcapcdc").toString)
    def writeCdc(name: String, rows: String*): Unit =
      Files.writeString(raw.resolve(name),
        (s"order_id,amount,${MergeTable.ChangeType},seq" +: rows)
          .mkString("\n"))
    writeCdc("c1.csv", "o1,10.0,insert,5", "o2,20.0,insert,1")
    writeCdc("c2.csv", "o1,99.0,update,3") // late vs c1's seq 5
    writeCdc("c3.csv", "o2,20.0,delete,2")
    writeCdc("c4.csv", "o2,77.0,update,1") // post-delete straggler
    // deterministic arrival order (see the backfill test above)
    val t0 = System.currentTimeMillis() - 60000
    (1 to 4).foreach { i =>
      Files.setLastModifiedTime(raw.resolve(s"c$i.csv"),
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000))
    }
    val applied = StreamIngest.runCdcAvailableNow(spark, raw.toString,
      cdcSchema, t, "order_id", "seq", tmpDir("ckptcapcdc").toString,
      maxFilesPerTrigger = Some(1))
    assert(applied === 2L,
      "only the two in-order batches may commit; the late batches must " +
        "be emptied by the per-batch guards")
    val st = t.read().select("order_id", "amount", "seq")
      .as[(String, String, Long)].collect().toSet
    assert(st === Set(("o1", "10.0", 5L)))
  }

  test("SCD2 under a capped drain applies label order across micro-batches") {
    // cap=1 splits one drain into per-file batches; the 2024-02 and
    // 2024-03 waves land in SEPARATE micro-batches and history must
    // still open/close monotonically (the per-batch label ordering
    // discipline, now exercised ACROSS batch boundaries too).
    import org.apache.spark.sql.types.StructType
    val dimSchema = StructType(Seq(
      StructField("cust_id", StringType),
      StructField("bal", StringType),
      StructField("eff", StringType)))
    val raw = tmpDir("rawcapscd")
    val t = MergeTable(spark, tmpDir("tblcapscd").toString,
      Some(graft.lake.Scd2.Slice))
    def writeDim(name: String, rows: String*): Unit =
      Files.writeString(raw.resolve(name), ("cust_id,bal,eff" +: rows)
        .mkString("\n"))
    writeDim("d1.csv", "c1,100,2024-01-01")
    writeDim("d2.csv", "c1,200,2024-02-01")
    writeDim("d3.csv", "c1,300,2024-03-01")
    val t0 = System.currentTimeMillis() - 60000
    (1 to 3).foreach { i =>
      Files.setLastModifiedTime(raw.resolve(s"d$i.csv"),
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000))
    }
    val waves = StreamIngest.runScd2AvailableNow(spark, raw.toString,
      dimSchema, t, "cust_id", "eff", tmpDir("ckptcapscd").toString,
      maxFilesPerTrigger = Some(1))
    assert(waves === 3L)
    val hist = t.read().select(col("bal"),
      col(graft.lake.Scd2.EffFrom), col(graft.lake.Scd2.EffTo))
      .as[(String, String, Option[String])].collect().toSet
    assert(hist === Set(
      ("100", "2024-01-01", Some("2024-02-01")),
      ("200", "2024-02-01", Some("2024-03-01")),
      ("300", "2024-03-01", None)))
  }

  test("tombstoneLateness keeps the sidecar bounded while in-bound " +
      "rejection still holds") {
    import org.apache.spark.sql.types.LongType
    val cdcSchema = StructType(Seq(
      StructField("order_id", StringType),
      StructField("amount", StringType),
      StructField(MergeTable.ChangeType, StringType),
      StructField("seq", LongType)))
    val raw = tmpDir("rawtl")
    val ckpt = tmpDir("ckpttl").toString
    val t = MergeTable(spark, tmpDir("tbltl").toString)
    val sidecar = MergeTable(spark, t.root.resolve("_tombstones").toString)
    def writeCdc(name: String, rows: String*): Unit =
      Files.writeString(raw.resolve(name),
        (s"order_id,amount,${MergeTable.ChangeType},seq" +: rows)
          .mkString("\n"))
    def drain(): Long = StreamIngest.runCdcAvailableNow(spark,
      raw.toString, cdcSchema, t, "order_id", "seq", ckpt,
      tombstoneLateness = Some(2L))
    def tombs(): Set[(String, Long)] =
      sidecar.read().select("order_id", "seq").as[(String, Long)]
        .collect().toSet

    writeCdc("c1.csv", "o1,10.0,insert,1", "o2,20.0,insert,2",
      "o3,30.0,insert,3")
    drain()
    writeCdc("c2.csv", "o1,10.0,delete,4")
    drain()
    // high-water 4, lateness 2 → expiry below 2; o1's tombstone (4) stays
    assert(tombs() === Set(("o1", 4L)))
    writeCdc("c3.csv", "o2,20.0,delete,8")
    drain()
    // high-water 8 → expiry below 6 ages out o1's tombstone; the
    // sidecar stays bounded instead of accumulating every delete ever
    assert(tombs() === Set(("o2", 8L)))
    // in-bound rejection is untouched: a straggler at seq 7 (inside the
    // lateness window, below o2's tombstone 8) must still be rejected…
    writeCdc("c4.csv", "o2,99.0,update,7", "o3,33.0,update,9")
    drain()
    val st = t.read().select("order_id", "amount", "seq")
      .as[(String, String, Long)].collect().toSet
    // …while the in-order o3 event lands
    assert(st === Set(("o3", "33.0", 9L)))
  }

  test("streaming CDC apply: full-image feeds never let the preimage win") {
    import org.apache.spark.sql.types.LongType
    val cdcSchema = StructType(Seq(
      StructField("order_id", StringType),
      StructField("amount", StringType),
      StructField(MergeTable.ChangeType, StringType),
      StructField("seq", LongType)))
    val raw = tmpDir("raw")
    val ckpt = tmpDir("ckpt").toString
    val t = MergeTable(spark, tmpDir("tbl").toString)
    def writeCdc(name: String, rows: String*): Unit =
      Files.writeString(raw.resolve(name),
        (s"order_id,amount,${MergeTable.ChangeType},seq" +: rows)
          .mkString("\n"))

    writeCdc("c1.csv", "o1,10.0,insert,1")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    // A full-image feed — the exact shape MergeTable.changes(
    // updateImages=true) emits — carries pre AND post rows sharing the
    // event's sequence. If the batch ranked before filtering preimages,
    // the preimage could win rank-1 and the update would be silently
    // lost (and the shared sequence would trip the duplicate-sequence
    // fail-fast). The postimage must land.
    writeCdc("c2.csv",
      "o1,10.0,update_preimage,2",
      "o1,77.0,update_postimage,2")
    StreamIngest.runCdcAvailableNow(spark, raw.toString, cdcSchema,
      t, "order_id", "seq", ckpt)
    val st = t.read().select("order_id", "amount", "seq")
      .as[(String, String, Long)].collect().toSet
    assert(st === Set(("o1", "77.0", 2L)))
  }
}
