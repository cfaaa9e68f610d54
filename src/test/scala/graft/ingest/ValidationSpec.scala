package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    ("p1", "1", "produce", "apple"),
    ("p2", null, "produce", "banana"),
    ("p3", "2", null, "soap"),
    ("p1", "1", "produce", "apple-dup"),
    (null, "3", "misc", "ghost"),
  ).toDF("product_id", "department_id", "department", "product_name")

  test("requireNotNull: valid ∪ rejected = input, disjoint") {
    val s = Validation.requireNotNull(fixture, Seq("product_id",
      "department_id", "department", "product_name"))
    assert(s.valid.count() === 2)
    assert(s.rejected.count() === 3)
    assert(s.valid.columns.toSet === fixture.columns.toSet)
    assert(s.rejected.columns.toSet ===
      fixture.columns.toSet + "rejection_reason")
    val reasons = s.rejected.select("rejection_reason").distinct()
      .as[String].collect()
    assert(reasons === Array("Missing required fields"))
  }

  test("withRules: first violated rule wins, null predicate = violation") {
    val df = Seq(("a", 5.0), ("b", -1.0), (null, 2.0)).toDF("k", "amt")
    val s = Validation.withRules(df, Seq(
      col("k").isNotNull -> "missing key",
      (col("amt") > 0) -> "non-positive amount"))
    val rej = s.rejected.select("k", "rejection_reason")
      .as[(String, String)].collect().toSet
    assert(rej === Set(("b", "non-positive amount"), (null, "missing key")))
    assert(s.valid.as[(String, Double)].collect().toSet === Set(("a", 5.0)))
  }

  test("dedupByKey is deterministic and keeps one row per key") {
    val df = Seq(("k1", 3, "c"), ("k1", 1, "a"), ("k1", 2, "b"),
      ("k2", 9, "z")).toDF("pk", "ord", "v")
    val out = Validation.dedupByKey(df, "pk", Seq(col("ord")))
      .as[(String, Int, String)].collect().toSet
    assert(out === Set(("k1", 1, "a"), ("k2", 9, "z")))
    // re-run on shuffled input → identical result
    val out2 = Validation.dedupByKey(df.repartition(7), "pk", Seq(col("ord")))
      .as[(String, Int, String)].collect().toSet
    assert(out2 === out)
  }

  test("writeQuarantine writes CSV with header and reason") {
    val dir = tmpDir("quarantine").resolve("rejects").toString
    val s = Validation.requireNotNull(fixture, Seq("department_id"))
    Validation.writeQuarantine(s.rejected, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 1)
    assert(back.select("rejection_reason").as[String].head() ===
      "Missing required fields")
  }
}
