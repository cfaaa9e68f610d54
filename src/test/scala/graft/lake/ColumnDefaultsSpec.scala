package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Declared column DEFAULTs riding the log schema's StructField
  * metadata: CREATE-time and ALTER-time declaration, filled by SQL
  * INSERT column lists and COPY INTO when the writer omits the column;
  * existing rows stay NULL (metadata-only, zero rewrites). */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE ... DEFAULT: INSERT column lists fill the default; " +
      "explicit values win") {
    val p = tmpDir("dflt").toString
    spark.sql("CREATE GRAFT TABLE t_dflt (id STRING, qty INT, " +
      s"src STRING DEFAULT 'manual', score DOUBLE DEFAULT 0.5) AT '$p'")
    spark.sql("INSERT INTO t_dflt (id, qty) VALUES ('a', 1)")
    spark.sql("INSERT INTO t_dflt (id, qty, src) VALUES ('b', 2, 'feed')")
    val rows = spark.sql("SELECT id, src, score FROM t_dflt")
      .as[(String, String, Double)].collect().toSet
    assert(rows === Set(("a", "manual", 0.5), ("b", "feed", 0.5)))
    // the full-arity positional form still takes explicit values
    spark.sql("INSERT INTO t_dflt VALUES ('c', 3, 'x', 9.0)")
    assert(spark.sql("SELECT score FROM t_dflt WHERE id = 'c'")
      .as[Double].head() === 9.0)
  }

  test("a comparison operator inside a DEFAULT expression does not " +
      "corrupt the column split (angle brackets are type brackets only " +
      "after MAP/ARRAY/STRUCT)") {
    // r12 advice: the scanner once counted every '<'/'>' as bracket
    // nesting, so `(1>0)` threw the depth off and the NEXT column
    // declaration mis-split with a misleading 'malformed column' error
    val p = tmpDir("dflt").toString
    spark.sql("CREATE GRAFT TABLE t_dflt_cmp (a INT DEFAULT (1>0 ), " +
      "b STRING DEFAULT 'x<y', c MAP<STRING, INT>, " +
      s"d INT DEFAULT (2 < 10)) AT '$p'")
    spark.sql("INSERT INTO t_dflt_cmp (c) VALUES (map('k', 1))")
    val row = spark.sql("SELECT a, b, d FROM t_dflt_cmp")
      .as[(Int, String, Int)].head()
    // (1>0) casts true→1; 'x<y' is literal; (2<10) casts true→1
    assert(row === ((1, "x<y", 1)))
    // even an identifier literally named after a generic type compares
    // as an operator when what follows '<' is not a type token
    val p2 = tmpDir("dflt").toString
    spark.sql("CREATE GRAFT TABLE t_dflt_cmp2 (a INT DEFAULT (3 < 5), " +
      s"b INT DEFAULT (2 > 1), c STRING) AT '$p2'")
    spark.sql("INSERT INTO t_dflt_cmp2 (c) VALUES ('z')")
    assert(spark.sql("SELECT a, b FROM t_dflt_cmp2")
      .as[(Int, Int)].head() === ((1, 1)))
  }

  test("ALTER TABLE ADD COLUMN ... DEFAULT is metadata-only: old rows " +
      "read NULL, later inserts fill the default") {
    val p = tmpDir("dflt").toString
    spark.sql(s"CREATE GRAFT TABLE t_dflt2 (id STRING, qty INT) AT '$p'")
    spark.sql("INSERT INTO t_dflt2 VALUES ('old', 1)")
    val filesPre = graft.sql.GraftSql.table("t_dflt2").get
      .liveEntries().map(_.relPath).toSet
    spark.sql("ALTER TABLE t_dflt2 ADD COLUMN lang STRING DEFAULT 'en'")
    assert(graft.sql.GraftSql.table("t_dflt2").get
      .liveEntries().map(_.relPath).toSet === filesPre, "zero rewrites")
    assert(spark.sql("SELECT lang FROM t_dflt2 WHERE id = 'old'")
      .collect().head.isNullAt(0), "pre-default rows read NULL")
    spark.sql("INSERT INTO t_dflt2 (id, qty) VALUES ('new', 2)")
    assert(spark.sql("SELECT lang FROM t_dflt2 WHERE id = 'new'")
      .as[String].head() === "en")
  }

  test("default + generated + identity interplay: one INSERT omitting " +
      "all three fills each through its own channel") {
    val p = tmpDir("dflt").toString
    spark.sql("CREATE GRAFT TABLE t_mix (v STRING, " +
      s"tag STRING DEFAULT 'raw') AT '$p' GENERATED (v_up AS upper(v))")
    spark.sql("ALTER TABLE t_mix ADD IDENTITY COLUMN rid")
    spark.sql("INSERT INTO t_mix (v) VALUES ('a'), ('b')")
    val rows = spark.sql("SELECT v, v_up, tag, rid FROM t_mix")
      .as[(String, String, String, Long)].collect()
    assert(rows.map(r => (r._1, r._2, r._3)).toSet ===
      Set(("a", "A", "raw"), ("b", "B", "raw")))
    assert(rows.map(_._4).toSet === Set(1L, 2L))
  }

  test("COPY INTO fills declared defaults for source-absent columns") {
    val p = tmpDir("dflt").toString
    spark.sql("CREATE GRAFT TABLE t_cpy (id STRING, qty INT, " +
      s"src STRING DEFAULT 'copy') AT '$p'")
    val feed = tmpDir("dflt_feed").resolve("files").toString
    Seq(("a", 1), ("b", 2)).toDF("id", "qty").write.parquet(feed)
    graft.sql.GraftSql.table("t_cpy").get.copyInto(feed)
    assert(spark.sql("SELECT src FROM t_cpy").as[String].collect().toSeq
      === Seq("copy", "copy"))
  }

  test("a DEFAULT must be a constant, deterministic expression " +
      "castable to the column type") {
    val t = MergeTable(spark, tmpDir("dflt").toString, None)
    t.declareSchema(StructType(Seq(StructField("id", StringType))))
    intercept[IllegalArgumentException](
      t.addColumn("bad", IntegerType, Some("id")))
    intercept[IllegalArgumentException](
      t.addColumn("bad", IntegerType, Some("not_a_col + 1")))
    intercept[IllegalArgumentException](
      t.addColumn("bad", DoubleType, Some("rand()")))
    t.addColumn("ok", IntegerType, Some("2 + 3"))
    assert(t.columnDefaults === Map("ok" -> "2 + 3"))
  }

  test("CREATE column lists with parameterized complex types parse — " +
      "commas and the word DEFAULT inside <...> stay inside the type") {
    val p = tmpDir("dflt_cx").toString
    spark.sql("CREATE GRAFT TABLE t_cx (m MAP<STRING, INT>, " +
      "s STRUCT<default: INT, n: STRING>, " +
      s"tag STRING DEFAULT 'x') AT '$p'")
    val t = graft.sql.GraftSql.table("t_cx").get
    assert(t.declaredSchema.get.fieldNames.toSeq === Seq("m", "s", "tag"))
    assert(t.columnDefaults === Map("tag" -> "'x'"))
    spark.sql("INSERT INTO t_cx (m, s) VALUES " +
      "(map('a', 1), named_struct('default', 2, 'n', 'z'))")
    assert(spark.sql("SELECT tag, s.default FROM t_cx")
      .as[(String, Int)].head() === ("x", 2))
  }

  test("generic brackets open on identifier-start fields too — " +
      "STRUCT<_c0 INT> and backquoted struct field names") {
    val p = tmpDir("dflt_id").toString
    spark.sql("CREATE GRAFT TABLE t_idf (" +
      "s STRUCT<_c0: INT, b: INT>, " +
      "q STRUCT<`my f`: STRING>, " +
      s"tag STRING DEFAULT 'y') AT '$p'")
    val t = graft.sql.GraftSql.table("t_idf").get
    assert(t.declaredSchema.get.fieldNames.toSeq === Seq("s", "q", "tag"))
    val s = t.declaredSchema.get("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(s.fieldNames.toSeq === Seq("_c0", "b"))
    val q = t.declaredSchema.get("q").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(q.fieldNames.toSeq === Seq("my f"))
    assert(t.columnDefaults === Map("tag" -> "'y'"))
  }
}
