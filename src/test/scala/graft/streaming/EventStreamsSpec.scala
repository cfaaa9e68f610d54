package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private case class Raw(ts: Timestamp, user_id: Long, event_type: String,
      value: Double)

  test("windowedCounts drops late rows behind the watermark (append)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Raw]
    val q = EventStreams.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()
    try {
      // Window [10:00, 11:00) gets 2 rows; 12:30 pushes watermark to 11:30
      // so that window finalizes and appends.
      in.addData(Raw(ts(10, 5), 1, "view", 1.0), Raw(ts(10, 20), 1, "view", 2.0),
        Raw(ts(12, 30), 2, "view", 4.0))
      q.processAllAvailable()
      val afterB1 = spark.table("wc")
        .select("window_start", "n", "sum_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(afterB1 === Set((ts(10, 0), 2L, 3.0)))

      // 10:40 is behind the 11:30 watermark → DROPPED (its window already
      // finalized); 15:0 closes [12:00,13:00).
      in.addData(Raw(ts(10, 40), 1, "view", 99.0), Raw(ts(15, 0), 2, "view", 8.0))
      q.processAllAvailable()
      val afterB2 = spark.table("wc")
        .select("window_start", "n", "sum_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(afterB2 === Set(
        (ts(10, 0), 2L, 3.0), // unchanged: the late 10:40 row never lands
        (ts(12, 0), 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionize emits sessions on event-time timeout and intra-batch gaps") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // User 1: two events 10 min apart (one session) plus a second
      // session starting 11:30 — the >30min gap closes the first WITHIN
      // the batch. User 99 at 14:00 drives the watermark to 13:00.
      in.addData(
        EventStreams.Ev(1, ts(10, 0), 1.0), EventStreams.Ev(1, ts(10, 10), 2.0),
        EventStreams.Ev(1, ts(11, 30), 5.0), EventStreams.Ev(99, ts(14, 0), 0.5))
      q.processAllAvailable()
      val b1 = spark.table("sess")
        .as[EventStreams.Session].collect().toSet
      assert(b1.contains(
        EventStreams.Session(1, ts(10, 0), ts(10, 10), 2, 3.0)),
        s"intra-batch gap must close the first session, got $b1")

      // Next batch: watermark (13:00) is already past user 1's open
      // session horizon (11:30 + 30min = 12:00) → timeout fires, session
      // (11:30, 1 event) emits.
      in.addData(EventStreams.Ev(99, ts(15, 0), 0.5))
      q.processAllAvailable()
      val b2 = spark.table("sess")
        .as[EventStreams.Session].collect().toSet
      assert(b2.contains(
        EventStreams.Session(1, ts(11, 30), ts(11, 30), 1, 5.0)),
        s"event-time timeout must flush the open session, got $b2")
    } finally q.stop()
  }

  test("clickAttribution joins clicks to in-window impressions only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Raw]
    val clicks = MemoryStream[Raw]
    val q = EventStreams.clickAttribution(
        imps.toDF().select("user_id", "ts", "value"),
        clicks.toDF().select("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        Raw(ts(10, 0), 1, "imp", 1.0),   // within 30min of the click
        Raw(ts(9, 20), 1, "imp", 2.0),   // too old for the 10:15 click
        Raw(ts(10, 5), 2, "imp", 3.0))   // other user
      clicks.addData(Raw(ts(10, 15), 1, "click", 9.0))
      q.processAllAvailable()
      val out = spark.table("attr")
        .select("user_id", "imp_value", "click_value")
        .as[(Long, Double, Double)].collect().toSet
      assert(out === Set((1L, 1.0, 9.0)),
        "only the in-window same-user impression attributes")
    } finally q.stop()
  }

  test("clickAttributionOuter: matches emit on co-presence; the null row " +
      "for an unmatched click emits ONLY once the watermark passes its " +
      "window (the sentinel-discipline argument)") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Raw]
    val clicks = MemoryStream[Raw]
    val q = EventStreams.clickAttributionOuter(
        imps.toDF().select("user_id", "ts", "value"),
        clicks.toDF().select("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("oattr")
      .outputMode(OutputMode.Append()).start()
    try {
      def rows(): Set[(Long, Option[Double], Double)] = spark.table("oattr")
        .select("user_id", "imp_value", "click_value")
        .as[(Long, Option[Double], Double)].collect().toSet
      // user 1's click has an in-window impression; user 2's has none
      imps.addData(Raw(ts(10, 0), 1, "imp", 1.0))
      clicks.addData(Raw(ts(10, 15), 1, "click", 9.0),
        Raw(ts(10, 20), 2, "click", 7.0))
      q.processAllAvailable()
      assert(rows() === Set((1L, Some(1.0), 9.0)),
        "batch 1: the MATCH emits on co-presence, the miss must NOT — " +
          "its window is still open (a late impression could arrive)")
      // watermark fuel on BOTH sides: 13:00 − 1h delay = 12:00 > 10:20,
      // but emission happens at the NEXT batch's eviction pass — one
      // more batch is required (why bounded drains need sentinel waves)
      imps.addData(Raw(ts(13, 0), 99, "imp", 0.0))
      clicks.addData(Raw(ts(13, 0), 99, "click", 0.0))
      q.processAllAvailable()
      imps.addData(Raw(ts(16, 0), 99, "imp", 0.0))
      clicks.addData(Raw(ts(16, 0), 99, "click", 0.0))
      q.processAllAvailable()
      assert(rows().contains((2L, None, 7.0)),
        "the unmatched click must emit with null impression columns " +
          "once the watermark provably closes its join window")
      assert(rows().count(_._1 == 2L) === 1,
        "and exactly once")
    } finally q.stop()
  }

  test("dedupEvents drops replayed event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    final case class E(event_id: Long, ts: Timestamp, value: Double)
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.dedupEvents(
        in.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, ts(10, 0), 1.0), (2L, ts(10, 5), 2.0))
      q.processAllAvailable()
      // replayed event 1 (the reference's duplicate-file case) + new 3
      in.addData((1L, ts(10, 0), 1.0), (3L, ts(10, 10), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids === Seq(1L, 2L, 3L), "replayed id must appear exactly once")
    } finally q.stop()
  }

  test("sessionizeTws (transformWithState) matches the fMGWS semantics") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[EventStreams.Ev]
      val q = EventStreams.sessionizeTws(in.toDS())
        .writeStream.format("memory").queryName("sesstws")
        .outputMode(OutputMode.Append()).start()
      try {
        // Same scenario as the fMGWS test: intra-batch gap closes the
        // first session; the later watermark times out the open one.
        in.addData(
          EventStreams.Ev(1, ts(10, 0), 1.0), EventStreams.Ev(1, ts(10, 10), 2.0),
          EventStreams.Ev(1, ts(11, 30), 5.0), EventStreams.Ev(99, ts(14, 0), 0.5))
        q.processAllAvailable()
        val b1 = spark.table("sesstws")
          .as[EventStreams.Session].collect().toSet
        assert(b1.contains(
          EventStreams.Session(1, ts(10, 0), ts(10, 10), 2, 3.0)),
          s"intra-batch gap must close the first session, got $b1")
        in.addData(EventStreams.Ev(99, ts(15, 0), 0.5))
        q.processAllAvailable()
        val b2 = spark.table("sesstws")
          .as[EventStreams.Session].collect().toSet
        assert(b2.contains(
          EventStreams.Session(1, ts(11, 30), ts(11, 30), 1, 5.0)),
          s"event-time timer must flush the open session, got $b2")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("enrichEvents joins a live stream against a static dim per batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Raw]
    val q = EventStreams.enrichEvents(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Raw(ts(10, 0), 1, "view", 1.0),
        Raw(ts(10, 1), 3, "view", 2.0)) // user 3 has no dim row → null tier
      q.processAllAvailable()
      val out = spark.table("enrich").select("user_id", "tier")
        .as[(Long, Option[String])].collect().toSet
      assert(out === Set((1L, Some("gold")), (3L, None)),
        "left join keeps dim-less events with a null attribute")
    } finally q.stop()
  }

  test("sessionWindows (declarative) splits on the gap in batch mode") {
    val df = Seq(
      (1L, ts(10, 0), 1.0), (1L, ts(10, 10), 2.0), // session A
      (1L, ts(11, 30), 5.0),                       // session B (>30min gap)
      (2L, ts(10, 0), 7.0))                        // other user
      .toDF("user_id", "ts", "value")
    val out = EventStreams.sessionWindows(df)
      .select("user_id", "session_start", "n_events", "sum_value")
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    assert(out === Set(
      (1L, ts(10, 0), 2L, 3.0),
      (1L, ts(11, 30), 1L, 5.0),
      (2L, ts(10, 0), 1L, 7.0)))
  }
}
