package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `convertInPlace` (Delta's CONVERT TO DELTA): adopt a plain parquet
  * directory as a graft table's first commit — zero bytes copied, the
  * manifest references the files where they lie, and the declared
  * schema (X176) makes every read take the layout-agnostic path. */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  private def contents(df: DataFrame): Set[(String, String, Double)] =
    df.select("order_id", "date", "amount")
      .as[(String, String, Double)].collect().toSet

  test("a hive-partitioned plain dir converts in place and round-trips") {
    val root = tmpDir("conv").resolve("lake").toString
    val data = orders(("o1", "d1", 1.0), ("o2", "d2", 2.0), ("o3", "d1", 3.0))
    data.write.partitionBy("date").parquet(root)
    // adopt it: no byte of data moves
    val before = Files.walk(Paths.get(root)).filter(p =>
      p.toString.endsWith(".parquet")).count()
    val t = MergeTable(spark, root, Some("date"))
    assert(t.convertInPlace() === 1L)
    assert(contents(t.read()) === contents(data))
    assert(t.declaredSchema.isDefined)
    val after = Files.walk(Paths.get(root)).filter(p =>
      p.toString.endsWith(".parquet")).count()
    assert(before === after, "convert copies nothing")
    // the whole lake surface works immediately on adopted files
    t.merge(orders(("o2", "d2", 99.0), ("o4", "d3", 4.0)), "order_id")
    assert(contents(t.read()) === Set(
      ("o1", "d1", 1.0), ("o2", "d2", 99.0),
      ("o3", "d1", 3.0), ("o4", "d3", 4.0)))
    assert(contents(t.readVersion(1L)) === contents(data),
      "time travel to the adopted snapshot")
    // vacuum never reaps adopted originals (they are not commit-* dirs)
    t.vacuum(0L)
    assert(contents(t.read()).size === 4)
    // metadata-only evolution works on a converted table too
    t.addColumn("note", org.apache.spark.sql.types.StringType)
    assert(t.read().filter(col("note").isNull).count() === 4)
  }

  test("flat (unpartitioned) dirs convert; guards fail fast") {
    val root = tmpDir("conv").resolve("lake").toString
    val data = orders(("o1", "d1", 1.0), ("o2", "d2", 2.0))
    data.write.parquet(root)
    val t = MergeTable(spark, root, None)
    t.convertInPlace()
    assert(contents(t.read()) === contents(data))
    // converting twice refused
    intercept[IllegalArgumentException](t.convertInPlace())
    // empty dir refused
    intercept[IllegalArgumentException](
      MergeTable(spark, tmpDir("conv").toString, None).convertInPlace())
    // partition column not in the layout refused
    val root2 = tmpDir("conv").resolve("lake").toString
    data.write.parquet(root2)
    intercept[IllegalArgumentException](
      MergeTable(spark, root2, Some("date")).convertInPlace())
  }

  test("flat conversion: DML actually touches adopted root-level files " +
      "(file-key parity between single-component relPaths and scan tags)") {
    val root = tmpDir("conv_flat").resolve("lake").toString
    val data = orders(("o1", "d1", 1.0), ("o2", "d2", 2.0), ("o3", "d3", 3.0))
    data.repartition(3).write.parquet(root)
    val t = MergeTable(spark, root, None, statsCols = Seq("amount"))
    t.convertInPlace()
    // DELETE must discover the adopted file (a key mismatch would make
    // this a silent no-op — the adopted-file identity bug class)
    t.delete(col("order_id") === "o2")
    assert(contents(t.read()) ===
      Set(("o1", "d1", 1.0), ("o3", "d3", 3.0)))
    // UPDATE rewrites through the same touched-file discovery
    t.update(col("order_id") === "o1", Map("amount" -> lit(10.0)))
    assert(contents(t.read()) ===
      Set(("o1", "d1", 10.0), ("o3", "d3", 3.0)))
    // stats retrofit keys per-file stats by the same identity
    t.collectStats()
    assert(t.liveEntries().forall(_.stats.contains("amount")))
  }

  test("flat conversion: compactSmall merges adopted files without " +
      "dropping rows") {
    val root = tmpDir("conv_pack").resolve("lake").toString
    (1 to 60).map(i => (s"o$i", s"d${i % 3}", i.toDouble))
      .toDF("order_id", "date", "amount")
      .repartition(6).write.parquet(root)
    val t = MergeTable(spark, root, None)
    t.convertInPlace()
    assert(t.liveEntries().size === 6)
    // the bin map inner-joins on the file identity: a key mismatch on
    // adopted files would DROP their rows while removing the files —
    // silent data loss, so count preservation is the assertion
    t.compactSmall(1L << 20)
    assert(t.liveEntries().size === 1)
    assert(t.read().count() === 60L)
    assert(t.read().agg(sum("amount")).as[Double].head() === 1830.0)
  }

  test("collectStats retrofits manifest stats onto adopted files — " +
      "file skipping turns on without rewriting a row") {
    val root = tmpDir("conv").resolve("lake").toString
    (1 to 64).map(i => (i.toLong, s"d${i % 4}", i.toDouble))
      .toDF("k", "date", "amount")
      .repartition(4, col("k") % 4) // k ranges interleave per file
      .sortWithinPartitions("k")
      .write.partitionBy("date").parquet(root)
    val t = MergeTable(spark, root, Some("date"), Seq("k"))
    t.convertInPlace()
    assert(t.liveEntries().forall(_.stats.isEmpty), "adopted = stat-less")
    val vPre = t.latestVersion()
    val filesPre = t.liveEntries().map(_.relPath).toSet
    t.collectStats()
    // same files, zero rows rewritten, stats now recorded on each
    assert(t.liveEntries().map(_.relPath).toSet === filesPre)
    assert(t.liveEntries().forall(_.stats.contains("k")))
    assert(t.read().count() === 64)
    // the change feed across the stats commit is empty
    assert(t.changes(vPre, t.latestVersion(), "k").count() === 0)
    // idempotent: everything covered -> no new commit
    val v = t.latestVersion()
    assert(t.collectStats() === v)
    // stats columns must be data columns
    val u = MergeTable(spark, root, Some("date"), Seq("date"))
    intercept[IllegalArgumentException](u.collectStats())
  }

  test("SQL: ANALYZE TABLE COMPUTE STATISTICS routes to collectStats " +
      "for registered names only") {
    val root = tmpDir("conv_an").resolve("lake").toString
    orders(("o1", "d1", 1.0), ("o2", "d2", 2.0))
      .write.partitionBy("date").parquet(root)
    val t = MergeTable(spark, root, Some("date"), Seq("amount"))
    t.convertInPlace()
    graft.sql.GraftSql.register("t_an", t)
    spark.sql("ANALYZE TABLE t_an COMPUTE STATISTICS")
    assert(t.liveEntries().forall(_.stats.contains("amount")))
    // unregistered names delegate to Spark's own ANALYZE (which then
    // rejects the unknown table itself — we did not swallow it)
    val e = intercept[Exception](
      spark.sql("ANALYZE TABLE not_a_graft_table COMPUTE STATISTICS"))
    assert(!e.isInstanceOf[scala.MatchError])
  }

  test("SQL: CONVERT TO GRAFT TABLE adopts and registers in one statement") {
    val root = tmpDir("conv_sql").resolve("lake").toString
    orders(("o1", "d1", 1.0), ("o2", "d2", 2.0))
      .write.partitionBy("date").parquet(root)
    spark.sql(
      s"CONVERT TO GRAFT TABLE t_conv AT '$root' PARTITIONED BY (date)")
    assert(spark.sql("SELECT count(*) c FROM t_conv").as[Long].head() === 2L)
    spark.sql("UPDATE t_conv SET amount = amount + 1 WHERE order_id = 'o1'")
    assert(spark.sql(
      "SELECT amount FROM t_conv WHERE order_id = 'o1'")
      .as[Double].head() === 2.0)
  }
}
