package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X137 — the mergeable relative-error quantile sketch: bucket ids are
  * monotone, merge is bucket-wise addition (partial sketches re-sum to
  * the global sketch), and any quantile read off the sketch is within
  * the designed 2^-QSubBits relative error of the true percentile. */
class SketchQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val k = SketchQueries.QSubBits

  test("bucket id is monotone in v and exact below 2^k") {
    val vs = (1L to 300L) ++ Seq(1000L, 5000L, 123456L, 1L << 40,
      (1L << 40) + 12345L, Long.MaxValue / 2)
    val rows = vs.toDF("v")
      .select(col("v"), expr(SketchQueries.quantileBucket("v")).as("bid"))
      .orderBy("v").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1),
        s"bid must be monotone: v=${a.getLong(0)}→${a.getLong(1)}, " +
          s"v=${b.getLong(0)}→${b.getLong(1)}")
      case _ => ()
    }
    rows.filter(_.getLong(0) < SketchQueries.QExact)
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("bucket estimate stays within the 2^-k relative error of v") {
    val vs = Seq(1L, 127L, 128L, 129L, 255L, 256L, 1000L, 99999L,
      1234567L, 987654321L, 1L << 45)
    vs.toDF("v")
      .select(col("v"), expr(SketchQueries.quantileEstimate(
        SketchQueries.quantileBucket("v"))).as("est"))
      .collect().foreach { r =>
        val (v, est) = (r.getLong(0), r.getLong(1))
        val rel = math.abs(est - v).toDouble / v
        assert(rel <= math.pow(2.0, -k),
          s"v=$v est=$est rel=$rel exceeds 2^-$k")
      }
  }

  test("merging partial sketches equals the global sketch") {
    val data = (1 to 5000).map(i =>
      (if (i % 2 == 0) "a" else "b",
        // deterministic heavy-tailed positives spanning ~20 octaves
        ((i.toLong * 2654435761L) % (1L << (i % 20 + 1))) + 1L))
      .toDF("grp", "v")
    val whole = SketchQueries.quantileSketchOf(data, "grp", "v")
      .orderBy("grp", "bid").collect().toSeq
    val parts = Seq(data.filter(col("v") % 3 === 0),
      data.filter(col("v") % 3 === 1), data.filter(col("v") % 3 === 2))
    val merged = parts.map(SketchQueries.quantileSketchOf(_, "grp", "v"))
      .reduce(_ unionByName _)
      .groupBy("grp", "bid").agg(sum("c").as("c"))
      .orderBy("grp", "bid").collect().toSeq
    assert(merged === whole)
  }

  test("signed deltas maintain the sketch; emptied buckets drop out") {
    val base = Seq(("a", 10L), ("a", 10L), ("a", 5000L), ("b", 77L))
      .toDF("grp", "v")
    val sk0 = SketchQueries.quantileSketchOf(base, "grp", "v")
    // feed: delete one (a,10), delete THE ONLY (a,5000) — its bucket
    // must vanish — update (b,77) -> (b,100000), insert (b,12)
    val feed = Seq(
      ("a", 10L, "delete"), ("a", 5000L, "delete"),
      ("b", 77L, "update_preimage"), ("b", 100000L, "update_postimage"),
      ("b", 12L, "insert")).toDF("grp", "v", "_change_type")
    val got = SketchQueries.applySketchDelta(sk0,
      SketchQueries.quantileSketchDelta(feed, "grp", "v"))
      .orderBy("grp", "bid").collect().toSeq
    val want = SketchQueries.quantileSketchOf(
      Seq(("a", 10L), ("b", 100000L), ("b", 12L)).toDF("grp", "v"),
      "grp", "v").orderBy("grp", "bid").collect().toSeq
    assert(got === want)
  }

  test("sketch quantiles track exact percentiles within the bound") {
    val got = SketchQueries.sketchQuantile(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val exact = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag").as("grp"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("v"))
      .groupBy("grp")
      .agg(expr("percentile(v, 0.5)").as("e50"),
        expr("percentile(v, 0.9)").as("e90"),
        expr("percentile(v, 0.99)").as("e99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // the sketch's target is ceil(q*n) (a discrete rank); allow the
    // designed bucket error plus one discrete-rank step of slack
    val tol = 2 * math.pow(2.0, -k) + 0.01
    got.foreach { case (g, (p50, p90, p99)) =>
      val (e50, e90, e99) = exact(g)
      assert(math.abs(p50 - e50) / e50 <= tol, s"$g p50 $p50 vs $e50")
      assert(math.abs(p90 - e90) / e90 <= tol, s"$g p90 $p90 vs $e90")
      assert(math.abs(p99 - e99) / e99 <= tol, s"$g p99 $p99 vs $e99")
    }
    assert(got.size === 3)
  }
}
