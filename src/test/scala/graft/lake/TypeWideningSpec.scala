package graft.lake

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Metadata-only TYPE WIDENING (Delta's type widening table feature):
  * the declared schema flips to the wider type, old files keep their
  * narrow physical type (the parquet reader widens at the scan), new
  * writes land wide, time travel shows the as-of type, and anything
  * that is not a lossless widening is refused. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  test("int -> long and float -> double widen in place; mixed old/new " +
      "files scan as one; time travel shows the as-of type") {
    val t = MergeTable(spark, tmpDir("widen").toString, None)
    t.declareSchema(StructType(Seq(
      StructField("id", StringType),
      StructField("n", IntegerType),
      StructField("x", FloatType))))
    t.append(Seq(("a", 1, 1.5f)).toDF("id", "n", "x"))
    val vNarrow = t.latestVersion()
    val filesPre = t.liveEntries().map(_.relPath).toSet
    t.alterColumnType("n", LongType)
    t.alterColumnType("x", DoubleType)
    assert(t.liveEntries().map(_.relPath).toSet === filesPre,
      "metadata-only: zero files rewritten")
    assert(t.read().schema("n").dataType === LongType)
    assert(t.read().schema("x").dataType === DoubleType)
    // a new write lands the WIDE type; both generations scan together
    t.append(Seq(("b", 5000000000L, 2.5d)).toDF("id", "n", "x"))
    assert(t.read().select("id", "n", "x")
      .as[(String, Long, Double)].collect().toSet ===
      Set(("a", 1L, 1.5d), ("b", 5000000000L, 2.5d)))
    // the narrow write no longer conforms
    intercept[IllegalArgumentException](
      t.append(Seq(("c", 2, 3.5f)).toDF("id", "n", "x")))
    // time travel shows the as-of (narrow) type
    assert(t.readVersion(vNarrow).schema("n").dataType === IntegerType)
    // DML works across the widened boundary
    t.update(org.apache.spark.sql.functions.col("id") ===
      org.apache.spark.sql.functions.lit("a"),
      Map("n" -> org.apache.spark.sql.functions.lit(7L)))
    assert(t.read().filter("id = 'a'").select("n").as[Long].head() === 7L)
  }

  test("narrowing and unrelated conversions are refused") {
    val t = MergeTable(spark, tmpDir("widen").toString, None)
    t.declareSchema(StructType(Seq(
      StructField("id", StringType), StructField("n", LongType))))
    intercept[IllegalArgumentException](
      t.alterColumnType("n", IntegerType))
    intercept[IllegalArgumentException](
      t.alterColumnType("n", DoubleType)) // long -> double loses bits
    intercept[IllegalArgumentException](
      t.alterColumnType("id", LongType))
    intercept[IllegalArgumentException](
      t.alterColumnType("nope", LongType))
  }

  test("SQL: ALTER TABLE ... ALTER COLUMN ... TYPE routes and refuses " +
      "narrowing with the engine's message") {
    val p = tmpDir("widen_sql").toString
    spark.sql(s"CREATE GRAFT TABLE t_wide (id STRING, n INT) AT '$p'")
    spark.sql("INSERT INTO t_wide VALUES ('a', 1)")
    spark.sql("ALTER TABLE t_wide ALTER COLUMN n TYPE BIGINT")
    spark.sql("INSERT INTO t_wide VALUES ('b', 6000000000)")
    assert(spark.sql("SELECT sum(n) s FROM t_wide").as[Long].head()
      === 6000000001L)
    val e = intercept[Exception](
      spark.sql("ALTER TABLE t_wide ALTER COLUMN n TYPE INT"))
    assert(e.getMessage.contains("widening"))
  }
}
