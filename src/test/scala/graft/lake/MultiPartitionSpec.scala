package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sql.GraftSql

/** Multi-column partitioning (Delta's `partitionBy(a, b, ...)`): the
  * layout nests one hive level per column, the manifest records the
  * full value tuple per file, and every partition-aware path — both
  * optimizer-rule prune patterns, OPTIMIZE WHERE, MERGE's
  * touched-partition probe, DML touched-file discovery — operates per
  * column. */
class MultiPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def sales(rows: (String, String, String, Double)*): DataFrame =
    rows.toDF("id", "d", "r", "amt")

  private def contents(df: DataFrame): Set[(String, String, String, Double)] =
    df.select("id", "d", "r", "amt")
      .as[(String, String, String, Double)].collect().toSet

  private def plannedFiles(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
        // inputFiles, not rootPaths: the manifest-backed FileIndex
        // (r15) roots at the TABLE while serving per-file statuses
        h.location.inputFiles.map(f =>
          java.net.URI.create(f).getPath).toSet
    }.flatten.toSet

  test("two-column layout: hive dirs nest in order, tuples round-trip, " +
      "NULL slots use the hive default") {
    val t = MergeTable(spark, tmpDir("mp").toString, Seq("d", "r"), Nil,
      deletionVectors = false, bloomCols = Nil)
    val data = sales(
      ("s1", "d1", "eu", 1.0), ("s2", "d1", "us", 2.0),
      ("s3", "d2", "eu", 3.0), ("s4", "d2", null, 4.0))
    t.overwrite(data)
    assert(contents(t.read()) === contents(data))
    // one file per (d, r) tuple under optimized layout assumptions is
    // not guaranteed; the DIRS are: every file sits under d=<v>/r=<v>
    t.liveEntries().foreach { e =>
      val segs = e.relPath.split('/')
      assert(segs.length === 4) // commit-dir / d=… / r=… / part-file
      assert(segs(1).startsWith("d=") && segs(2).startsWith("r="))
    }
    // the null slot decodes back as null (hive default dir)
    assert(t.read().filter(col("r").isNull).count() === 1L)
    assert(t.read().filter(col("r").isNull)
      .select("id").as[String].head() === "s4")
  }

  test("same-named leaf dirs under different parents do not collide " +
      "(file-key depth scales with partition depth)") {
    val t = MergeTable(spark, tmpDir("mp").toString, Seq("d", "r"), Nil,
      deletionVectors = false, bloomCols = Nil)
    // ONE task writes both (d1, eu) and (d2, eu): the two part files
    // share basename AND leaf dir name `r=eu` — a two-component key
    // would attach both partitions' values to both files (row dup)
    t.overwrite(sales(
      ("s1", "d1", "eu", 1.0), ("s2", "d2", "eu", 2.0)).coalesce(1))
    assert(t.read().count() === 2L)
    assert(contents(t.read()) ===
      Set(("s1", "d1", "eu", 1.0), ("s2", "d2", "eu", 2.0)))
    // DML touched-file discovery keys the same way
    t.delete(col("id") === "s1")
    assert(contents(t.read()) === Set(("s2", "d2", "eu", 2.0)))
  }

  test("MERGE rewrites only the touched partition tuples") {
    val t = MergeTable(spark, tmpDir("mp").toString, Seq("d", "r"), Nil,
      deletionVectors = false, bloomCols = Nil)
    t.overwrite(sales(
      ("s1", "d1", "eu", 1.0), ("s2", "d1", "us", 2.0),
      ("s3", "d2", "eu", 3.0)))
    val before = t.liveEntries()
      .map(e => e.relPath -> e.partitionValue).toMap
    t.merge(sales(("s1", "d1", "eu", 10.0), ("s5", "d3", "ap", 5.0)), "id")
    val after = t.liveEntries().map(e => e.relPath -> e.partitionValue).toMap
    // untouched tuples (d1,us) and (d2,eu) carried over byte-identical
    val untouched = before.filter { case (_, pv) =>
      pv.exists(v => v.contains("us") || v.contains("d2")) }
    untouched.foreach { case (rel, pv) =>
      assert(after.get(rel) === Some(pv), s"untouched $rel must survive") }
    assert(contents(t.read()) === Set(
      ("s1", "d1", "eu", 10.0), ("s2", "d1", "us", 2.0),
      ("s3", "d2", "eu", 3.0), ("s5", "d3", "ap", 5.0)))
  }

  test("partition pruning fires per column through both rule patterns") {
    val t = MergeTable(spark, tmpDir("mp").toString, Seq("d", "r"), Nil,
      deletionVectors = false, bloomCols = Nil)
    // three commits -> multi-dir layout (pattern B territory)
    t.overwrite(sales(("s1", "d1", "eu", 1.0), ("s2", "d1", "us", 2.0)))
    t.append(sales(("s3", "d2", "eu", 3.0), ("s4", "d2", "us", 4.0)))
    t.append(sales(("s5", "d3", "eu", 5.0)))
    val all = plannedFiles(t.read())
    assert(all.size === 5)
    // single-column predicate
    val p1 = t.read().filter(col("d") === "d2")
    assert(plannedFiles(p1).size === 2,
      s"d=d2 must admit 2 files:\n${p1.queryExecution.optimizedPlan.treeString}")
    assert(p1.count() === 2L)
    // conjunction over both columns
    val p2 = t.read().filter(col("d") === "d2" && col("r") === "us")
    assert(plannedFiles(p2).size === 1)
    assert(contents(p2) === Set(("s4", "d2", "us", 4.0)))
    // scan() agrees
    assert(t.scan(col("d") === "d2" && col("r") === "us").collect().toSet
      === p2.collect().toSet)
    // compacted single-dir hive layout prunes natively too
    t.compact()
    GraftSql.register("mp_prune", t)
    val pc = t.read().filter(col("r") === "eu" && col("d") =!= "d1")
    assert(pc.count() === 2L)
  }

  test("OPTIMIZE WHERE selects by any partition column subset") {
    val t = MergeTable(spark, tmpDir("mp").toString, Seq("d", "r"), Nil,
      deletionVectors = false, bloomCols = Nil)
    t.overwrite(sales(("s1", "d1", "eu", 1.0), ("s2", "d1", "us", 2.0)))
    t.append(sales(("s3", "d1", "eu", 3.0), ("s4", "d2", "eu", 4.0)))
    val want = contents(t.read())
    val before = t.liveEntries().map(_.relPath).toSet
    t.compactWhere(col("d") === "d1" && col("r") === "eu")
    val after = t.liveEntries().map(_.relPath).toSet
    assert(contents(t.read()) === want)
    // out-of-scope files untouched
    val outside = before.filter(p => p.contains("r=us") || p.contains("d=d2"))
    assert(outside.subsetOf(after))
    // in-scope (d1, eu) coalesced to one file
    assert(after.count(p => p.contains("d=d1") && p.contains("r=eu")) === 1)
    // a predicate on a non-partition column is refused
    intercept[IllegalArgumentException](t.compactWhere(col("amt") > 0))
  }

  test("SQL lifecycle: REGISTER/CREATE PARTITIONED BY (a, b), INSERT, " +
      "UPDATE, OPTIMIZE WHERE, DESCRIBE DETAIL") {
    val p = tmpDir("mp_sql").toString
    spark.sql("CREATE GRAFT TABLE mp_t (id STRING, d STRING, r STRING, " +
      s"amt DOUBLE) AT '$p' PARTITIONED BY (d, r)")
    spark.sql("INSERT INTO mp_t VALUES ('s1', 'd1', 'eu', 1.0), " +
      "('s2', 'd1', 'us', 2.0), ('s3', 'd2', 'eu', 3.0)")
    assert(spark.sql("SELECT count(*) c FROM mp_t").as[Long].head() === 3L)
    spark.sql("UPDATE mp_t SET amt = amt + 10 WHERE r = 'us'")
    assert(spark.sql("SELECT amt FROM mp_t WHERE id = 's2'")
      .as[Double].head() === 12.0)
    spark.sql("OPTIMIZE mp_t WHERE d = 'd1' AND r = 'eu'")
    assert(spark.sql("SELECT count(*) c FROM mp_t").as[Long].head() === 3L)
    val detail = spark.sql("DESCRIBE DETAIL mp_t").collect().head
    assert(detail.getAs[String]("partition_column") === "d,r")
    // SHOW PARTITIONS: one manifest row per live tuple, deterministic
    val parts = spark.sql("SHOW PARTITIONS mp_t")
    assert(parts.columns.toSeq === Seq("d", "r", "num_files"))
    assert(parts.select("d", "r").as[(String, String)].collect().toSeq ===
      Seq(("d1", "eu"), ("d1", "us"), ("d2", "eu")))
    assert(parts.select("num_files").as[Long].collect().forall(_ >= 1L))
  }

  test("SHOW PARTITIONS API: null slots surface as NULL; unpartitioned " +
      "tables are refused") {
    val t = MergeTable(spark, tmpDir("mp_show").toString, Seq("d", "r"), Nil,
      deletionVectors = false, bloomCols = Nil)
    t.overwrite(sales(("s1", "d1", null, 1.0), ("s2", "d1", "eu", 2.0)))
    val rows = t.partitions().collect()
    assert(rows.length === 2)
    assert(rows.exists(r => r.getString(0) == "d1" && r.isNullAt(1)))
    val u = MergeTable(spark, tmpDir("mp_show").toString, None)
    u.overwrite(sales(("s1", "d1", "eu", 1.0)))
    intercept[IllegalArgumentException](u.partitions())
  }

  test("convertInPlace adopts a two-level hive layout; guards check " +
      "the full chain in order") {
    val root = tmpDir("mp_conv").resolve("lake").toString
    sales(("s1", "d1", "eu", 1.0), ("s2", "d2", "us", 2.0))
      .write.partitionBy("d", "r").parquet(root)
    val t = MergeTable(spark, root, Seq("d", "r"), Nil,
      deletionVectors = false, bloomCols = Nil)
    t.convertInPlace()
    assert(contents(t.read()) ===
      Set(("s1", "d1", "eu", 1.0), ("s2", "d2", "us", 2.0)))
    // DML works on the adopted layout
    t.update(col("id") === "s1", Map("amt" -> lit(9.0)))
    assert(t.read().filter(col("id") === "s1")
      .select("amt").as[Double].head() === 9.0)
    // wrong nesting order refused
    val root2 = tmpDir("mp_conv").resolve("lake2").toString
    sales(("s1", "d1", "eu", 1.0))
      .write.partitionBy("r", "d").parquet(root2)
    intercept[IllegalArgumentException](
      MergeTable(spark, root2, Seq("d", "r"), Nil,
        deletionVectors = false, bloomCols = Nil).convertInPlace())
  }
}
