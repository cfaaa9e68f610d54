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
    // DECLARED order (r15): the bootstrap captured (order_id, amount,
    // date) from the physical read, addColumn appended note — and the
    // read presents that declared order, partition column included
    assert(t.read().columns.toSeq ===
      Seq("order_id", "amount", "date", "note"))
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

  test("CREATE ... GENERATED ... AS <query>: the declared schema absorbs " +
      "engine-populated columns, so the seed and later writes succeed") {
    // column list + generated PARTITION column the query does not produce
    val p = tmpDir("dsch_gen").toString
    spark.sql("CREATE GRAFT TABLE t_gen (order_id STRING, ts TIMESTAMP) " +
      s"AT '$p' PARTITIONED BY (day) GENERATED (day AS to_date(ts)) " +
      "AS SELECT 'o1', timestamp'2024-03-05 10:00:00'")
    assert(spark.sql("SELECT cast(day AS STRING) d FROM t_gen")
      .as[String].head() === "2024-03-05")
    val t = graft.sql.GraftSql.table("t_gen").get
    assert(t.declaredSchema.exists(_.fieldNames.contains("day")),
      "declared schema includes the generated column")
    // later engine-filled writes conform to the same declared schema
    spark.sql("INSERT INTO t_gen (order_id, ts) " +
      "VALUES ('o2', timestamp'2024-03-06 09:00:00')")
    assert(spark.sql("SELECT count(*) c FROM t_gen").as[Long].head() === 2L)
    // pure CTAS (no column list) + GENERATED: schema declared from the
    // query PLUS the rule's column
    val p2 = tmpDir("dsch_gen").toString
    spark.sql(s"CREATE GRAFT TABLE t_gen2 AT '$p2' " +
      "GENERATED (big AS amount > 1.5) " +
      "AS SELECT 'o1' AS order_id, 2.0 AS amount")
    assert(spark.sql("SELECT big FROM t_gen2").as[Boolean].head())
    assert(graft.sql.GraftSql.table("t_gen2").get
      .declaredSchema.exists(_.fieldNames.contains("big")))
  }

  test("ADD GENERATED/IDENTITY COLUMN on an empty declared-schema table " +
      "extends the schema atomically; non-empty tables refuse") {
    val t = MergeTable(spark, tmpDir("dsch_id").toString, None)
    t.declareSchema(StructType(Seq(StructField("v", StringType))))
    t.addIdentityColumn("id")
    assert(t.declaredSchema.map(_.fieldNames.toSeq) === Some(Seq("v", "id")))
    t.addGeneratedColumn("v_up", "upper(v)")
    assert(t.declaredSchema.exists(f =>
      f.fieldNames.contains("v_up") &&
        f("v_up").dataType === StringType))
    t.append(Seq("a", "b").toDF("v"))
    val rows = t.read().select("v", "v_up", "id")
      .as[(String, String, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).toSet === Set(("a", "A"), ("b", "B")))
    // which row gets which identity value is unspecified; the SET is not
    assert(rows.map(_._3).toSet === Set(1L, 2L))
    // a NON-empty declared-schema table lacking the column refuses the
    // rule (existing rows have no value to satisfy it)
    val u = MergeTable(spark, tmpDir("dsch_id").toString, None)
    u.declareSchema(StructType(Seq(StructField("v", StringType))))
    u.append(Seq("x").toDF("v"))
    intercept[IllegalArgumentException](u.addIdentityColumn("id"))
  }
}
