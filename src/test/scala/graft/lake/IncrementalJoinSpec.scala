package graft.lake

import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions.{col, expr}

import graft.SparkSpec

/** Incremental equi-join view maintenance (IncrementalJoin): the view
  * must equal a full recompute after every refresh, for fact-side,
  * dim-side, and mixed change windows. */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts(rows: (String, String, Double)*): DataFrame =
    rows.toDF("fact_id", "cust", "amount")
  private def dims(rows: (String, String)*): DataFrame =
    rows.toDF("cust", "segment")

  private def contents(df: DataFrame): Set[(String, String, Double, String)] =
    df.select("fact_id", "cust", "amount", "segment")
      .as[(String, String, Double, String)].collect().toSet

  private def recompute(f: MergeTable, d: MergeTable) =
    contents(IncrementalJoin.fullJoin(f.read(), d.read(), "cust"))

  /** facts + dims + bootstrapped view. */
  private def setup(tag: String): (MergeTable, MergeTable, MergeTable) = {
    val f = MergeTable(spark, tmpDir(s"ij-f$tag").toString, None)
    val d = MergeTable(spark, tmpDir(s"ij-d$tag").toString, None)
    val v = MergeTable(spark, tmpDir(s"ij-v$tag").toString, None)
    f.overwrite(facts(("f1", "c1", 10.0), ("f2", "c1", 20.0),
      ("f3", "c2", 30.0), ("f4", "c9", 99.0))) // c9 dangles (not in dims)
    d.overwrite(dims(("c1", "gold"), ("c2", "silver"), ("c3", "bronze")))
    v.overwrite(IncrementalJoin.fullJoin(f.read(), d.read(), "cust"))
    (f, d, v)
  }

  test("fact insert/update/delete refresh incrementally == recompute") {
    val (f, d, v) = setup("1")
    val (fv0, dv0) = (f.latestVersion(), d.latestVersion())
    f.merge(facts(("f5", "c2", 50.0), ("f2", "c2", 21.0)), "fact_id")
    f.delete(expr("fact_id = 'f3'"))
    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      fv0, f.latestVersion(), dv0, d.latestVersion())
    assert(contents(v.read()) === recompute(f, d))
    assert(contents(v.read()).exists(r => r._1 == "f2" && r._4 == "silver"),
      "updated fact must re-join its NEW dim row")
  }

  test("dim update refreshes exactly the facts carrying the key") {
    val (f, d, v) = setup("2")
    val (fv0, dv0) = (f.latestVersion(), d.latestVersion())
    d.merge(dims(("c1", "platinum")), "cust")
    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      fv0, f.latestVersion(), dv0, d.latestVersion())
    assert(contents(v.read()) === recompute(f, d))
    assert(contents(v.read())
      .filter(_._2 == "c1").forall(_._4 == "platinum"))
  }

  test("dim delete drops rows; dim insert matches formerly-unmatched facts") {
    val (f, d, v) = setup("3")
    val (fv0, dv0) = (f.latestVersion(), d.latestVersion())
    d.delete(expr("cust = 'c2'"))              // f3's rows leave the view
    d.merge(dims(("c9", "new")), "cust") // f4 (dangling at bootstrap) joins in
    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      fv0, f.latestVersion(), dv0, d.latestVersion())
    assert(contents(v.read()) === recompute(f, d))
    assert(!contents(v.read()).exists(_._2 == "c2"))
    assert(contents(v.read()).exists(r => r._1 == "f4" && r._4 == "new"))
  }

  test("fact update onto a dangling key leaves the view") {
    val (f, d, v) = setup("4")
    val (fv0, dv0) = (f.latestVersion(), d.latestVersion())
    f.merge(facts(("f1", "zz", 10.0)), "fact_id")
    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      fv0, f.latestVersion(), dv0, d.latestVersion())
    assert(contents(v.read()) === recompute(f, d))
    assert(!contents(v.read()).exists(_._1 == "f1"))
  }

  test("both sides change in one window; re-applying is idempotent") {
    val (f, d, v) = setup("5")
    val (fv0, dv0) = (f.latestVersion(), d.latestVersion())
    f.merge(facts(("f6", "c3", 60.0), ("f1", "c1", 11.0)), "fact_id")
    f.delete(expr("fact_id = 'f2'"))
    d.merge(dims(("c1", "platinum"), ("c4", "iron")), "cust")
    d.delete(expr("cust = 'c2'"))
    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      fv0, f.latestVersion(), dv0, d.latestVersion())
    val after = contents(v.read())
    assert(after === recompute(f, d))
    // crash-replay: the same window applied again converges to the same
    // state (same candidates, same merge)
    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      fv0, f.latestVersion(), dv0, d.latestVersion())
    assert(contents(v.read()) === after)
  }

  test("empty window commits nothing") {
    val (f, d, v) = setup("6")
    val vv = v.latestVersion()
    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      f.latestVersion(), f.latestVersion(),
      d.latestVersion(), d.latestVersion())
    assert(v.latestVersion() === vv)
  }

  test("dim-side probe is key-pruned: a 1-key change reads only " +
      "admitting fact files") {
    // Long join keys + jk stats/bloom on the fact table, three
    // single-file commits with DISJOINT key ranges — the probe's
    // scan predicate must skip the two files that cannot hold the
    // changed key.
    def lfacts(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map(i => (s"f$i", i, i * 1.0)).toDF("fact_id", "cust", "amount")
        .coalesce(1)
    def ldims(ks: Seq[Long]): org.apache.spark.sql.DataFrame =
      ks.map(k => (k, s"seg$k")).toDF("cust", "segment").coalesce(1)
    val f = MergeTable(spark, tmpDir("ij-prune-f").toString, None,
      Seq("cust"), deletionVectors = false, bloomCols = Seq("cust"))
    val d = MergeTable(spark, tmpDir("ij-prune-d").toString, None)
    val v = MergeTable(spark, tmpDir("ij-prune-v").toString, None)
    f.overwrite(lfacts(0L until 100L))
    f.merge(lfacts(100L until 200L), "fact_id")
    f.merge(lfacts(200L until 300L), "fact_id")
    d.overwrite(ldims(0L until 300L))
    v.overwrite(IncrementalJoin.fullJoin(f.read(), d.read(), "cust"))
    val (fv, dv0) = (f.latestVersion(), d.latestVersion())

    d.merge(ldims(Seq(150L)).withColumn("segment",
      org.apache.spark.sql.functions.lit("changed")), "cust")

    // the probe's exact predicate prunes to ONE fact file
    assert(f.liveEntries().size === 3)
    assert(f.scanEntries(col("cust").isin(150L)).size === 1,
      "stats+bloom must admit only the file holding cust=150")

    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      fv, fv, dv0, d.latestVersion())
    def lcontents(df: org.apache.spark.sql.DataFrame) =
      df.select("fact_id", "cust", "amount", "segment")
        .as[(String, Long, Double, String)].collect().toSet
    assert(lcontents(v.read()) ===
      lcontents(IncrementalJoin.fullJoin(f.read(), d.read(), "cust")))
    assert(lcontents(v.read()).count(_._4 == "changed") === 1)
  }

  test("refresh is window-consistent: dim reads the snapshot at dimToV") {
    val (f, d, v) = setup("7")
    val (fv0, dv0) = (f.latestVersion(), d.latestVersion())
    d.merge(dims(("c1", "platinum")), "cust")
    val dv1 = d.latestVersion()
    // a LATER dim commit lands before the refresh runs
    d.merge(dims(("c1", "diamond"), ("c2", "steel")), "cust")
    // refreshing the (dv0, dv1] window must materialize dv1's state —
    // "platinum" — not the head's "diamond"
    IncrementalJoin.refresh(v, f, d, "fact_id", "cust",
      fv0, fv0, dv0, dv1)
    assert(contents(v.read()).filter(_._2 == "c1")
      .forall(_._4 == "platinum"))
    assert(contents(v.read()).filter(_._2 == "c2")
      .forall(_._4 == "silver"), "c2 untouched inside the window")
  }
}
