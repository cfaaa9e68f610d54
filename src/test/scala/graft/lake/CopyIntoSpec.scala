package graft.lake

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.sql.GraftSql

/** `COPY INTO` (X170): retryable, idempotent file ingestion — every
  * source file loads EXACTLY ONCE across any number of invocations
  * (the engine's seen-file checkpoint picks the not-yet-loaded set,
  * the X168 txn watermark absorbs batch replays). */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def rows(t: (Long, Long)*): DataFrame = t.toDF("k", "v")

  private def contents(t: MergeTable): Set[(Long, Long)] =
    t.read().select("k", "v").as[(Long, Long)].collect().toSet

  test("an incremental run over a DRAINED (unreadable) source is a " +
      "no-op for an established table, not an error") {
    val src = tmpDir("cpy_drain").toString
    rows((1L, 10L)).coalesce(1).write.parquet(s"$src/f1")
    val t = MergeTable(spark, tmpDir("cpy_t").toString, None)
    t.copyInto(src + "/*")
    assert(contents(t) === Set((1L, 10L)))
    // drain the source (the scheduled-ingestion pattern): the next
    // run must no-op — the source-schema probe failing is only fatal
    // for a FIRST load with nothing to infer from
    deleteRecursively(java.nio.file.Paths.get(src, "f1"))
    val v = t.latestVersion()
    t.copyInto(src + "/*")
    assert(t.latestVersion() === v)
    assert(contents(t) === Set((1L, 10L)))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(p))(
      _.iterator().asScala.toSeq).reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("each source file loads exactly once across re-invocations; new " +
      "files load incrementally; bounded batches compose") {
    val src = tmpDir("cpy_src").toString
    rows((1L, 10L), (2L, 20L)).coalesce(1)
      .write.parquet(s"$src/f1")
    val t = MergeTable(spark, tmpDir("cpy_t").toString, None)

    t.copyInto(src + "/*")
    assert(contents(t) === Set((1L, 10L), (2L, 20L)))
    // same call again: nothing new, nothing re-loaded, no commit
    val v1 = t.latestVersion()
    t.copyInto(src + "/*")
    assert(t.latestVersion() === v1)

    // two new files; capped trigger = several txn-gated batches
    rows((3L, 30L)).coalesce(1).write.parquet(s"$src/f2")
    rows((4L, 40L)).coalesce(1).write.parquet(s"$src/f3")
    t.copyInto(src + "/*", maxFilesPerTrigger = Some(1))
    assert(contents(t) ===
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    t.copyInto(src + "/*")
    assert(contents(t).size === 4) // still exactly once per file
  }

  test("first load into an EMPTY table infers the source schema; an " +
      "unreadable source fails loudly; drifted later files fail the load") {
    val t = MergeTable(spark, tmpDir("cpy_e").toString, None)
    val e = intercept[IllegalArgumentException](
      t.copyInto(tmpDir("cpy_nosrc").toString + "/*"))
    assert(e.getMessage.contains("cannot infer a schema"))

    val src = tmpDir("cpy_src2").toString
    rows((1L, 10L)).coalesce(1).write.parquet(s"$src/f1")
    t.copyInto(src + "/*")
    assert(contents(t) === Set((1L, 10L)))
    // a drifted file fails the batch instead of landing mixed schema
    Seq((2L, "oops")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$src/f2")
    intercept[Exception](t.copyInto(src + "/*"))
  }

  test("SQL COPY INTO routes to the API; FILEFORMAT = CSV reads headers") {
    val src = tmpDir("cpy_csv").toString
    val t = MergeTable(spark, tmpDir("cpy_sqlt").toString, None)
    t.overwrite(rows((1L, 10L))) // table schema fixes the CSV types
    GraftSql.register("cpy_sql", t)
    rows((2L, 20L), (3L, 30L)).coalesce(1)
      .write.option("header", "true").csv(s"$src/c1")
    val v = spark.sql(
      s"COPY INTO cpy_sql FROM '$src/*' FILEFORMAT = CSV")
      .as[Long].head()
    assert(v === t.latestVersion())
    assert(contents(t) === Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // idempotent through SQL too
    spark.sql(s"COPY INTO cpy_sql FROM '$src/*' FILEFORMAT = CSV")
    assert(contents(t).size === 3)
  }
}
