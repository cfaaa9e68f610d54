package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

class AnalyticQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def nanos(s: String): Long = ts(s).getTime * 1000000L

  test("asofJoin picks the latest order at-or-before each event, else null") {
    val d = tmpDir("asof")
    // events.parquet ships ts as raw NANOS longs (Tables.events converts)
    Seq(
      (1L, nanos("2024-01-10 00:00:00"), 7L, "view", 1.0, ""),
      (2L, nanos("2024-03-01 12:00:00"), 7L, "view", 1.0, ""),
      (3L, nanos("2024-02-01 00:00:00"), 7L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    Seq(
      // user 7: two orders same day (tie → max orderkey), one later order
      (100L, 7L, "O", 10.0, ts("2024-02-01 00:00:00"), "P"),
      (101L, 7L, "O", 10.0, ts("2024-02-01 00:00:00"), "P"),
      (102L, 7L, "O", 10.0, ts("2024-03-01 12:00:00"), "P"), // == event 2 ts
      (200L, 9L, "O", 10.0, ts("2024-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")

    val out = AnalyticQueries.asofJoin(spark, d.toString)
      .select("event_id", "last_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === None, "event before any order -> null")
    assert(out(2L) === Some(102L), "inclusive bound: order AT event ts wins")
    assert(out(3L) === Some(101L), "date tie breaks to max orderkey")
  }

  test("windowLag serves every offset function from one window pass") {
    val d = tmpDir("wlag")
    Seq(
      (1L, 5L, "O", 10.0, ts("2024-01-01 00:00:00"), "P"),
      (2L, 5L, "O", 20.0, ts("2024-01-03 00:00:00"), "P"),
      (3L, 5L, "O", 30.0, ts("2024-01-10 00:00:00"), "P"),
      (4L, 6L, "O", 99.0, ts("2024-02-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val q = AnalyticQueries.windowLag(spark, d.toString)
    val rows = q
      .select("o_orderkey", "prev_price", "next_price", "first_price",
        "days_since_prev")
      .as[(Long, Option[Double], Option[Double], Double, Option[Int])]
      .collect().map(r => r._1 -> r).toMap
    assert(rows(1L) === ((1L, None, Some(20.0), 10.0, None)),
      "partition start: no prev, no gap")
    assert(rows(2L) === ((2L, Some(10.0), Some(30.0), 10.0, Some(2))))
    assert(rows(3L) === ((3L, Some(20.0), None, 10.0, Some(7))))
    assert(rows(4L) === ((4L, None, None, 99.0, None)),
      "other customer is its own partition")
    // all four functions share (partitionBy, orderBy) → ONE Window
    // operator, one shuffle, one sorted pass
    val plan = q.queryExecution.executedPlan.toString
    assert("\\bWindow \\[".r.findAllIn(plan).size === 1,
      s"expected a single Window operator:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected a single shuffle:\n$plan")
  }

  test("eventsGapfill densifies each user's day range with zero-fill") {
    val d = tmpDir("gapfill")
    Seq(
      (1L, nanos("2024-01-01 10:00:00"), 7L, "view", 1.0, ""),
      (2L, nanos("2024-01-01 11:00:00"), 7L, "view", 1.0, ""),
      (3L, nanos("2024-01-04 09:00:00"), 7L, "view", 1.0, ""), // 2-day gap
      (4L, nanos("2024-02-01 00:00:00"), 8L, "view", 1.0, ""), // single day
      (5L, nanos("2024-03-01 00:00:00"), 999L, "view", 1.0, "")) // filtered
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val rows = AnalyticQueries.eventsGapfill(spark, d.toString)
      .select("user_id", "day", "n_events", "filled")
      .as[(Long, java.sql.Date, Long, Boolean)].collect()
      .map(r => (r._1, r._2.toString, r._3, r._4)).toSet
    assert(rows === Set(
      (7L, "2024-01-01", 2L, false),
      (7L, "2024-01-02", 0L, true),
      (7L, "2024-01-03", 0L, true),
      (7L, "2024-01-04", 1L, false),
      (8L, "2024-02-01", 1L, false)),
      "continuous per-user grid; silent days zero-filled and flagged")
  }

  test("eventsFunnel only advances stages in event-time order") {
    val d = tmpDir("funnel")
    Seq(
      // user 7 completes the whole funnel in order
      (1L, nanos("2024-01-01 10:00:00"), 7L, "view", 1.0, ""),
      (2L, nanos("2024-01-01 11:00:00"), 7L, "click", 1.0, ""),
      (3L, nanos("2024-01-01 12:00:00"), 7L, "purchase", 1.0, ""),
      // user 8's click PRECEDES their first view -> funnel stops at view
      (4L, nanos("2024-01-01 09:00:00"), 8L, "click", 1.0, ""),
      (5L, nanos("2024-01-01 10:00:00"), 8L, "view", 1.0, ""),
      (6L, nanos("2024-01-01 11:00:00"), 8L, "purchase", 1.0, ""),
      // user 9 only views
      (7L, nanos("2024-01-01 10:00:00"), 9L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val rows = AnalyticQueries.eventsFunnel(spark, d.toString)
      .select("stage", "stage_name", "n_users")
      .as[(Int, String, Long)].collect().toSet
    assert(rows === Set(
      (1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)),
      "out-of-order events must not advance the funnel")
  }

  test("funnelOf: k stages, counts monotonically non-increasing") {
    // property over seeded-random event streams: whatever the event
    // order, stage counts can only shrink (stage k's relation is an
    // equi-join against stage k-1's)
    val stages = Seq("a", "b", "c", "d")
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val events = (0 until 400).map { i =>
        (rnd.nextInt(40).toLong, stages(rnd.nextInt(4)), rnd.nextInt(1000).toLong)
      }.toDF("uid", "etype", "t")
      val out = AnalyticQueries
        .funnelOf(events, "uid", "etype", "t", stages)
        .orderBy("stage")
        .select("stage", "stage_name", "n_users")
        .as[(Int, String, Long)].collect()
      assert(out.map(_._2).toSeq === out.map(r => stages(r._1 - 1)).toSeq,
        "stage_name follows the given stage order")
      val counts = out.map(_._3)
      assert(counts.zip(counts.drop(1)).forall { case (a, b) => a >= b },
        s"seed $seed: counts must be non-increasing, saw ${counts.toSeq}")
    }
    // a key completing stages strictly in order reaches the end
    val ordered = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (1L, "d", 4L)).toDF("uid", "etype", "t")
    val full = AnalyticQueries.funnelOf(ordered, "uid", "etype", "t", stages)
      .select("stage", "n_users").as[(Int, Long)].collect().toSet
    assert(full === Set((1, 1L), (2, 1L), (3, 1L), (4, 1L)))
  }

  test("histogram bins partition the value range and sum to the total") {
    val d = tmpDir("hist")
    val xs = (0 until 1000).map(i => ((i * 7919) % 1000).toDouble)
    xs.toDF("l_extendedprice").coalesce(1)
      .write.parquet(s"$d/lineitem.parquet")
    val rows = AnalyticQueries.histogram(spark, d.toString)
      .select("bin", "bin_lo", "bin_hi", "n", "frac")
      .as[(Long, Double, Double, Long, Double)].collect()
    assert(rows.map(_._4).sum === 1000L, "every value lands in one bin")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 19))
    assert(rows.forall(r => r._2 < r._3), "bins are non-degenerate")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 0.01)
    // uniform data -> every bin populated with ~n/20
    assert(rows.length === 20 && rows.forall(r => r._4 >= 30 && r._4 <= 70))
    // degenerate domain (all values equal) -> one bin, no NaN casts
    val d2 = tmpDir("hist1")
    Seq.fill(5)(42.0).toDF("l_extendedprice").coalesce(1)
      .write.parquet(s"$d2/lineitem.parquet")
    val flat = AnalyticQueries.histogram(spark, d2.toString)
      .select("bin", "n").as[(Long, Long)].collect()
    assert(flat.toSeq === Seq((0L, 5L)))
  }

  test("salted distinct count equals the direct count(DISTINCT)") {
    val d = tmpDir("salt")
    val rng = new scala.util.Random(11)
    // skewed: flag A holds ~95% of rows with many duplicate suppkeys
    val rows = Seq.tabulate(2000) { i =>
      if (i % 20 == 0) ("B", rng.nextInt(10).toLong)
      else ("A", rng.nextInt(300).toLong)
    }
    rows.toDF("l_returnflag", "l_suppkey")
      .coalesce(2).write.parquet(s"$d/lineitem.parquet")
    val salted = AnalyticQueries.distinctSalted(spark, d.toString)
      .as[(String, Long)].collect().toMap
    val direct = rows.toDF("l_returnflag", "l_suppkey")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_suppkey"))
      .as[(String, Long)].collect().toMap
    assert(salted === direct)
  }

  test("rangeJoin assigns each order to every overlapping band") {
    val d = tmpDir("range")
    Seq(
      (1L, 1L, "O", 10000.0, ts("2024-01-01 00:00:00"), "P"), // band 0 only
      (2L, 1L, "O", 50000.0, ts("2024-01-01 00:00:00"), "P")) // bands 1 and 2
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val out = AnalyticQueries.rangeJoin(spark, d.toString)
      .select("band_id", "n", "total")
      .as[(Int, Long, Double)].collect().toSet
    assert(out === Set((0, 1L, 10000.0), (1, 1L, 50000.0), (2, 1L, 50000.0)))
  }

  test("profileOf counts rows, nulls, exact NDV and renders min/max") {
    val df = Seq(
      (Some(1.5), Some("a")), (Some(2.5), None),
      (None, Some("a")), (Some(2.5), Some("b")))
      .toDF("x", "s")
    val p = AnalyticQueries.profileOf(df, Seq("x", "s"))
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(p("x") === (("x", 4L, 1L, 2L, "1.5", "2.5")),
      "NDV excludes nulls; null counted separately")
    assert(p("s") === (("s", 4L, 1L, 2L, "a", "b")))
  }

  test("profileOnePassOf matches profileOf from exactly one table scan") {
    val d = tmpDir("prof")
    Seq(
      (Some(1.5), Some("a"), 10L), (Some(2.5), None, 20L),
      (None, Some("a"), 20L), (Some(2.5), Some("b"), 30L))
      .toDF("x", "s", "k")
      .write.parquet(s"$d/t.parquet")
    val df = spark.read.parquet(s"$d/t.parquet")
    val cols = Seq("x", "s", "k")
    val one = AnalyticQueries.profileOnePassOf(df, cols)
    // bit-identical to the per-column form
    val expected = AnalyticQueries.profileOf(df, cols)
      .as[(String, Long, Long, Long, String, String)].collect().toSet
    assert(one.as[(String, Long, Long, Long, String, String)]
      .collect().toSet === expected)
    // ... and from ONE scan: the per-column form plans k of them
    def nScans(frame: org.apache.spark.sql.DataFrame): Int =
      "FileScan|Scan parquet".r
        .findAllIn(frame.queryExecution.executedPlan.toString).length
    assert(nScans(one) === 1, "one-pass profile must scan the table once")
    assert(nScans(AnalyticQueries.profileOf(df, cols)) === cols.size)
  }

  /** Independent driver-side PageRank with the same integer fixed-point
    * recurrence — adjacency maps, no Spark. */
  private def refPageRank(pairs: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = AnalyticQueries.PrScale *
      (100L - AnalyticQueries.PrDampNum) / 100L
    var r: Map[Long, Long] = deg.map { case (k, _) =>
      k -> AnalyticQueries.PrScale
    }
    (1 to iters).foreach { _ =>
      r = edges.groupBy(_._2).map { case (v, es) =>
        v -> (teleport +
          AnalyticQueries.PrDampNum *
            es.map { case (u, _) => r(u) / deg(u) }.sum / 100L)
      }
    }
    r
  }

  test("equiDepthOf splits a known distribution at exact count edges") {
    // values 1..10, value v appearing v times (55 rows); B=5 -> ~11/bucket
    val df = (1 to 10).flatMap(v => Seq.fill(v)(v)).toDF("x")
    val out = AnalyticQueries.equiDepthOf(df, "x", buckets = 5)
      .select("bucket", "lo", "hi", "n_rows")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1).toSeq
    // rows-before(v)*5 div 55: v=1..5 -> 0 (before: 0,1,3,6,10 -> *5 div 55 = 0)
    // v=6: before 15 -> 75 div 55 = 1 ... verified by hand:
    assert(out.map(_._4).sum === 55L)
    assert(out === Seq(
      (0L, 1, 5, 15L),   // before: 0..10 -> bucket 0
      (1L, 6, 7, 13L),   // before 15 (75/55=1), 21 (105/55=1)
      (2L, 8, 8, 8L),    // before 28 (140/55=2)
      (3L, 9, 9, 9L),    // before 36 (180/55=3)
      (4L, 10, 10, 10L)))// before 45 (225/55=4)
    // buckets are contiguous, ordered, non-overlapping
    out.sliding(2).foreach { case Seq(a, b) => assert(a._3 < b._2) }
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    val left = (Seq.fill(500)(("hot", 1)) ++
      (1 to 50).map(i => (s"k$i", i))).toDF("k", "lv")
    val right = Seq(("hot", "H"), ("k1", "A"), ("k1", "B"), ("k7", "C"))
      .toDF("k", "rv")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lv", "rv").as[(String, Int, Option[String])]
        .collect().sorted.toSeq
    assert(norm(AnalyticQueries.saltedJoin(left, right, "k", salts = 8)) ===
      norm(left.join(right, Seq("k"), "inner")),
      "inner: salted == plain (incl. k1's duplicate right rows)")
    assert(norm(AnalyticQueries.saltedJoin(left, right, "k", 8, "left")) ===
      norm(left.join(right, Seq("k"), "left")),
      "left: unmatched keys keep their null row")
  }

  test("markovOf counts hand-built transitions with exact probabilities") {
    val ev = Seq(
      (1L, "A", 1L, 10L), (1L, "B", 2L, 11L), (1L, "B", 3L, 12L),
      (2L, "A", 1L, 20L), (2L, "C", 2L, 21L),
      (3L, "Z", 9L, 30L)) // single event: no transition
      .toDF("user_id", "state", "t", "eid")
    val out = AnalyticQueries
      .markovOf(ev, "user_id", "state", Seq("t", "eid"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(out === Set(
      ("A", "B", 1L, 0.5), ("A", "C", 1L, 0.5), ("B", "B", 1L, 1.0)))
  }

  test("markovOf sequences ties deterministically via the order columns") {
    // same ts for both events: eid breaks the tie, so the transition is
    // always X->Y, never Y->X
    val ev = Seq((1L, "X", 5L, 1L), (1L, "Y", 5L, 2L))
      .toDF("user_id", "state", "t", "eid")
    val out = AnalyticQueries
      .markovOf(ev, "user_id", "state", Seq("t", "eid"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(out === Set(("X", "Y", 1L, 1.0)))
  }

  test("skewOf ranks hot keys with share and cumulative share") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("k")
    val out = AnalyticQueries.skewOf(df, "k", topK = 3)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("a", 5L, 0.5, 0.5), ("b", 3L, 0.3, 0.8), ("c", 1L, 0.1, 0.9)))
  }

  test("anomalyOf flags exactly the hand-planted spike via median/MAD") {
    // type A: counts 10,10,10,12,100 on five days -> med 10, adev
    // {0,0,0,2,90}, MAD 0... use counts with nonzero MAD:
    // 8,10,10,12,100 -> med 10, adev {2,0,0,2,90}, MAD 2 -> only the
    // 100-day exceeds 2*MAD=4. type B: flat 5s -> MAD 0, adev 0 -> no
    // flag (0 > 0 is false).
    val rows =
      Seq.fill(8)(("A", "2024-01-01")) ++ Seq.fill(10)(("A", "2024-01-02")) ++
      Seq.fill(10)(("A", "2024-01-03")) ++ Seq.fill(12)(("A", "2024-01-04")) ++
      Seq.fill(100)(("A", "2024-01-05")) ++
      (1 to 3).flatMap(d => Seq.fill(5)(("B", s"2024-02-0$d")))
    val df = rows.toDF("k", "day")
    val out = AnalyticQueries.anomalyOf(df, "k", "day", k = 2.0)
      .select("k", "day", "n", "med", "mad")
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(out === Set(("A", "2024-01-05", 100L, 10.0, 2.0)))
  }

  test("pageRankOf matches an independent adjacency-map implementation") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 1L), (6L, 7L))
    val got = AnalyticQueries
      .pageRankOf(pairs.toDF("a", "b"), "a", "b", iters = 3)
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap
    assert(got === refPageRank(pairs, 3))
  }

  test("pageRankOf: star center outranks its leaves; degrees correct") {
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val rows = AnalyticQueries
      .pageRankOf(star.toDF("a", "b"), "a", "b", iters = 3)
      .select("node", "degree", "rank_fp")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows(10L)._1 === 4L)
    assert(rows(1L)._1 === 1L)
    assert(rows(10L)._2 > rows(1L)._2, "hub must outrank leaves")
    assert(Seq(1L, 2L, 3L, 4L).map(rows(_)._2).distinct.size === 1,
      "symmetric leaves tie exactly (integer arithmetic, no float drift)")
  }

  test("pageRankOf is partitioning-invariant (exact integer sums)") {
    val pairs = (1L to 40L).map(i => (i, i % 7 + 100L))
    val one = AnalyticQueries
      .pageRankOf(pairs.toDF("a", "b").coalesce(1), "a", "b", 2)
      .select("node", "rank_fp").as[(Long, Long)].collect().toSet
    val many = AnalyticQueries
      .pageRankOf(pairs.toDF("a", "b").repartition(13), "a", "b", 2)
      .select("node", "rank_fp").as[(Long, Long)].collect().toSet
    assert(one === many)
  }

  test("globalIndexOf equals the single-partition row_number, without one") {
    val df = (1L to 5000L).map(i => (i * 7919 % 5000, i))
      .toDF("k", "payload").repartition(17)
    val got = AnalyticQueries.globalIndexOf(df, Seq("k", "payload"))
    // no global-ordering funnel in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition") &&
      !plan.contains("rangepartitioning(k"),
      s"globalIndexOf must not globally sort through one task:\n$plan")
    val rows = got.select("k", "payload", "idx")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // index is 0..n-1 dense and follows the (k, payload) total order
    assert(rows.map(_._3).toSeq === (0L until 5000L))
    assert(rows.map(r => (r._1, r._2)).toSeq ===
      rows.map(r => (r._1, r._2)).sortBy(identity).toSeq)
  }

  test("globalIndexOf is partitioning-invariant") {
    val data = (1L to 999L).map(i => (i % 31, i))
    val a = AnalyticQueries
      .globalIndexOf(data.toDF("k", "v").coalesce(1), Seq("k", "v"))
      .select("k", "v", "idx").as[(Long, Long, Long)].collect().toSet
    val b = AnalyticQueries
      .globalIndexOf(data.toDF("k", "v").repartition(13), Seq("k", "v"))
      .select("k", "v", "idx").as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  /** Independent brute-force triangle reference: enumerate all id-ordered
    * node triples over the undirected edge set. */
  private def refTriangles(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = adj.keys.toSeq.sorted
    val triCount = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      x <- nodes; y <- adj(x).toSeq.sorted if y > x
      z <- adj(y).toSeq.sorted if z > y && adj(x).contains(z)
    } Seq(x, y, z).foreach(n => triCount(n) += 1)
    triCount.map { case (n, c) => n -> (adj(n).size.toLong, c) }.toMap
  }

  test("trianglesOf matches a brute-force triple enumeration") {
    // K4 on {1..4} (4 triangles, 3 per node), a pendant (5), a separate
    // triangle {6,7,8}, and a path 8-9 (no triangle).
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (6L, 7L), (7L, 8L), (6L, 8L), (8L, 9L))
    val got = AnalyticQueries.trianglesOf(pairs.toDF("a", "b"), "a", "b")
      .select("node", "degree", "n_triangles")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = refTriangles(pairs).filter(_._2._2 > 0)
    assert(got === want)
    assert(got(1L) === (3L, 3L) && got(4L) === (4L, 3L) && got(8L) === (3L, 1L))
  }

  test("trianglesOf: hub wedges don't explode; duplicate/reversed edges collapse") {
    // A 30-leaf star has NO triangles regardless of hub degree (the
    // degree-ordered kernel orients every edge leaf->hub, so the hub
    // generates zero wedges); adding one leaf-leaf edge makes exactly one.
    val star = (1L to 30L).map(i => (100L, i))
    val noisy = (star ++ star.map(_.swap) ++ Seq((1L, 2L), (2L, 1L))).toDF("a", "b")
    val got = AnalyticQueries.trianglesOf(noisy, "a", "b")
      .select("node", "n_triangles").as[(Long, Long)].collect().toMap
    assert(got === Map(100L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("trianglesOf is partitioning-invariant") {
    val pairs = (1L to 60L).map(i => (i % 9, i % 13 + 20L)) ++
      Seq((0L, 21L), (1L, 22L), (2L, 23L))
    val one = AnalyticQueries
      .trianglesOf(pairs.toDF("a", "b").coalesce(1), "a", "b")
      .select("node", "n_triangles").as[(Long, Long)].collect().toSet
    val many = AnalyticQueries
      .trianglesOf(pairs.toDF("a", "b").repartition(13), "a", "b")
      .select("node", "n_triangles").as[(Long, Long)].collect().toSet
    assert(one === many)
  }
}
