package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Declared schema in the LOG (the M action — the engine-side half of
  * Delta's metaData action): a never-written table is readable and
  * typed, appends are conformance-checked before any data exists, and
  * ALTER TABLE ADD COLUMN is a metadata-only commit. */
class DeclaredSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  private val schema = StructType(Seq(
    StructField("order_id", StringType),
    StructField("date", StringType),
    StructField("amount", DoubleType)))

  test("a never-written declared table reads as a typed empty frame " +
      "and binds appends") {
    val t = MergeTable(spark, tmpDir("dsch").toString, Some("date"))
    t.declareSchema(schema)
    assert(t.read().count() === 0L)
    assert(t.read().schema.fields.map(f => (f.name, f.dataType)).toSet ===
      schema.fields.map(f => (f.name, f.dataType)).toSet)
    // conforming append lands; drifted type / names fail BEFORE any data
    intercept[IllegalArgumentException](
      t.append(Seq(("o1", "d1", 1)).toDF("order_id", "date", "amount")))
    intercept[IllegalArgumentException](
      t.append(Seq(("o1", "d1", 1.0)).toDF("order_id", "date", "amt")))
    t.append(orders(("o1", "d1", 1.0)))
    assert(t.read().count() === 1L)
    // partition column must be part of a declared schema
    val u = MergeTable(spark, tmpDir("dsch").toString, Some("nope"))
    intercept[IllegalArgumentException](u.declareSchema(schema))
  }

  test("addColumn is metadata-only: zero files rewritten, old rows " +
      "read NULL, new writes carry it") {
    val t = MergeTable(spark, tmpDir("dsch").toString, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0), ("o2", "d2", 2.0)))
    val vPre = t.latestVersion()
    val filesPre = t.liveEntries().map(_.relPath).toSet
    // bootstraps the declared schema from the live physical schema
    t.addColumn("note", StringType)
    assert(t.liveEntries().map(_.relPath).toSet === filesPre,
      "metadata-only: the file set is untouched")
    assert(t.read().columns.toSeq ===
      Seq("order_id", "amount", "note", "date"))
    assert(t.read().filter(col("note").isNull).count() === 2L)
    // new writes carry the column; old and new rows coexist in one scan
    t.append(Seq(("o3", 3.0, "hello", "d3"))
      .toDF("order_id", "amount", "note", "date"))
    assert(t.read().filter(col("note") === "hello").count() === 1L)
    assert(t.read().count() === 3L)
    // schema-as-of time travel: the pre-add version has no 'note'
    assert(!t.readVersion(vPre).columns.contains("note"))
    // collisions refused
    intercept[IllegalArgumentException](t.addColumn("note", StringType))
    intercept[IllegalArgumentException](t.addColumn("AMOUNT", LongType))
  }

  test("declared schema survives checkpoint folds, vacuum, and clones; " +
      "overwrite cannot drift it") {
    val t = MergeTable(spark, tmpDir("dsch").toString, None)
    t.declareSchema(schema)
    t.overwrite(orders(("o1", "d1", 1.0)))
    t.vacuum(0L) // forces a checkpoint; the fold must carry M
    assert(t.declaredSchema.map(_.fieldNames.toSeq) ===
      Some(Seq("order_id", "date", "amount")))
    val clone = t.cloneTo(tmpDir("dsch_clone").toString)
    assert(clone.declaredSchema.map(_.fieldNames.toSeq) ===
      Some(Seq("order_id", "date", "amount")))
    val e = intercept[IllegalArgumentException](t.overwrite(
      Seq(("o1", 1)).toDF("order_id", "n")))
    assert(e.getMessage.contains("declared"))
  }

  test("evolveSchema MERGE updates the declared schema in the same " +
      "commit (new column visible to reads)") {
    val t = MergeTable(spark, tmpDir("dsch").toString, None)
    t.declareSchema(schema)
    t.overwrite(orders(("o1", "d1", 1.0)))
    t.merge(Seq(("o2", "d2", 2.0, "x"))
      .toDF("order_id", "date", "amount", "extra"), "order_id",
      evolveSchema = true)
    assert(t.read().columns.contains("extra"))
    assert(t.read().filter(col("extra") === "x").count() === 1L)
    assert(t.declaredSchema.exists(_.fieldNames.contains("extra")))
  }

  test("SQL: CREATE GRAFT TABLE with a column list, CTAS, ADD COLUMN, " +
      "and DROP GRAFT TABLE") {
    val p1 = tmpDir("dsch_sql").toString
    spark.sql("CREATE GRAFT TABLE t_decl " +
      "(order_id STRING, date STRING, amount DOUBLE) " +
      s"AT '$p1' PARTITIONED BY (date)")
    assert(spark.sql("SELECT * FROM graft_table('t_decl')").count() === 0L)
    spark.sql("INSERT INTO t_decl VALUES ('o1', 'd1', 1.5)")
    assert(spark.sql("SELECT amount FROM t_decl").as[Double].head() === 1.5)
    // CREATE on a non-fresh location refused; REGISTER attaches
    val e = intercept[Exception](spark.sql(
      s"CREATE GRAFT TABLE t_decl2 (a INT) AT '$p1'"))
    assert(e.getMessage.contains("REGISTER"))
    // CTAS: schema declared from the query; contents match
    val p2 = tmpDir("dsch_sql").toString
    spark.sql(s"CREATE GRAFT TABLE t_ctas AT '$p2' AS " +
      "SELECT * FROM graft_table('t_decl')")
    assert(spark.sql("SELECT * FROM t_ctas").count() === 1L)
    assert(graft.sql.GraftSql.table("t_ctas").get.declaredSchema.isDefined)
    // metadata-only ADD COLUMN via SQL
    spark.sql("ALTER TABLE t_ctas ADD COLUMN note STRING")
    assert(spark.sql("SELECT note FROM t_ctas").collect().head.isNullAt(0))
    // column list + AS: positional alignment with store-assignment casts
    val p3 = tmpDir("dsch_sql").toString
    spark.sql("CREATE GRAFT TABLE t_both (k BIGINT, v STRING) " +
      s"AT '$p3' AS SELECT 1, 'a'")
    assert(spark.sql("SELECT k FROM t_both").as[Long].head() === 1L)
    // DROP unregisters; the data stays on disk
    spark.sql("DROP GRAFT TABLE t_both")
    assert(graft.sql.GraftSql.table("t_both").isEmpty)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(p3))
      .findFirst().isPresent)
  }
}
