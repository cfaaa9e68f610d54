package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("prod_id", "name", "price")

  /** (prod_id, price, eff_from, eff_to, current) rows. */
  private def hist(t: MergeTable): Set[(Long, Double, String, String, Boolean)] =
    t.read()
      .select(col("prod_id"), col("price"), col(Scd2.EffFrom),
        col(Scd2.EffTo), col(Scd2.Current))
      .as[(Long, Double, String, Option[String], Boolean)]
      .collect().map(r => (r._1, r._2, r._3, r._4.orNull, r._5)).toSet

  test("SCD2 opens, closes, and never rewrites unchanged keys") {
    val t = MergeTable(spark, tmpDir("scd").toString, Some(Scd2.Slice))
    Scd2.merge(t, dim((1L, "ball", 10.0), (2L, "bat", 5.0)),
      "prod_id", "2024-01-01")
    // wave 2: price change on 1, no-op on 2, new key 3
    Scd2.merge(t, dim((1L, "ball", 20.0), (2L, "bat", 5.0), (3L, "cap", 7.0)),
      "prod_id", "2024-02-01")
    assert(hist(t) === Set(
      (1L, 10.0, "2024-01-01", "2024-02-01", false),
      (1L, 20.0, "2024-02-01", null, true),
      (2L, 5.0, "2024-01-01", null, true),
      (3L, 7.0, "2024-02-01", null, true)))
    // wave 3: everything unchanged -> table identical (idempotent batch)
    val before = hist(t)
    Scd2.merge(t, dim((1L, "ball", 20.0), (2L, "bat", 5.0), (3L, "cap", 7.0)),
      "prod_id", "2024-03-01")
    assert(hist(t) === before, "an unchanged batch must touch nothing")
  }

  test("a multi-column-partitioned backing table (slice × category) " +
      "stays correct — the slice prune fires only on the exact " +
      "single-column layout") {
    // the prune's read(partitionFilter) sees the ENCODED tuple; taking
    // it on a multi-column layout would match nothing, treat every key
    // as new, and silently duplicate open rows instead of closing them
    def dim2(rows: (Long, String, Double)*): DataFrame =
      rows.toDF("prod_id", "cat", "price")
    val t = MergeTable(spark, tmpDir("scd").toString,
      Seq(Scd2.Slice, "cat"), Nil, deletionVectors = false, bloomCols = Nil)
    Scd2.merge(t, dim2((1L, "toys", 10.0), (2L, "toys", 5.0)),
      "prod_id", "2024-01-01")
    Scd2.merge(t,
      dim2((1L, "toys", 20.0), (2L, "toys", 5.0), (3L, "home", 7.0)),
      "prod_id", "2024-02-01")
    assert(hist(t) === Set(
      (1L, 10.0, "2024-01-01", "2024-02-01", false),
      (1L, 20.0, "2024-02-01", null, true),
      (2L, 5.0, "2024-01-01", null, true),
      (3L, 7.0, "2024-02-01", null, true)))
  }

  test("asOfView answers point-in-time questions over the label axis") {
    val t = MergeTable(spark, tmpDir("scd").toString, Some(Scd2.Slice))
    Scd2.merge(t, dim((1L, "ball", 10.0), (2L, "bat", 5.0)),
      "prod_id", "2024-01-01")
    Scd2.merge(t, dim((1L, "ball", 20.0), (3L, "cap", 7.0)),
      "prod_id", "2024-02-01")
    def snap(label: String): Set[(Long, Double)] =
      Scd2.asOfView(t, label).select(col("prod_id"), col("price"))
        .as[(Long, Double)].collect().toSet
    assert(snap("2024-01-15") === Set((1L, 10.0), (2L, 5.0)))
    assert(snap("2024-02-15") === Set((1L, 20.0), (2L, 5.0), (3L, 7.0)))
    // a key absent from a batch is NOT closed (dims arrive as full or
    // partial snapshots; deletion is an explicit operation)
    assert(snap("2024-02-01") === Set((1L, 20.0), (2L, 5.0), (3L, 7.0)))
  }

  test("null-valued tracked columns compare null-safely") {
    val withNull = Seq((1L, Option.empty[String], 10.0), (2L, Some("bat"), 5.0))
      .toDF("prod_id", "name", "price")
    val t = MergeTable(spark, tmpDir("scd").toString, Some(Scd2.Slice))
    Scd2.merge(t, withNull, "prod_id", "2024-01-01")
    val before = hist(t)
    // identical nulls -> unchanged; null -> value -> a real change
    Scd2.merge(t, withNull, "prod_id", "2024-02-01")
    assert(hist(t) === before, "null <=> null is not a change")
    Scd2.merge(t,
      Seq((1L, Some("ball"), 10.0)).toDF("prod_id", "name", "price"),
      "prod_id", "2024-03-01")
    assert(hist(t).contains((1L, 10.0, "2024-01-01", "2024-03-01", false)))
    assert(hist(t).contains((1L, 10.0, "2024-03-01", null, true)))
  }

  test("pointInTimeJoin enriches each fact with its era's dimension row") {
    val t = MergeTable(spark, tmpDir("scd").toString, Some(Scd2.Slice))
    Scd2.merge(t, dim((1L, "ball", 10.0), (2L, "bat", 5.0)),
      "prod_id", "2024-01-01")
    Scd2.merge(t, dim((1L, "ball", 20.0), (2L, "bat", 5.0)),
      "prod_id", "2024-02-01")
    val facts = Seq(
      (100L, 1L, "2024-01-15"), // era 1: price 10
      (101L, 1L, "2024-02-01"), // era 2 opens AT its label: price 20
      (102L, 1L, "2024-03-20"), // current era: price 20
      (103L, 2L, "2024-03-01"), // never-changed key: price 5
      (104L, 1L, "2023-12-31"), // before history: null dim
      (105L, 9L, "2024-02-10")) // unknown key: null dim
      .toDF("sale_id", "prod_id", "sale_label")
    val out = Scd2.pointInTimeJoin(facts, t, "prod_id", "sale_label")
      .select(col("sale_id"), col("price"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      100L -> Some(10.0), 101L -> Some(20.0), 102L -> Some(20.0),
      103L -> Some(5.0), 104L -> None, 105L -> None))
    // exactly one row per fact — intervals never overlap
    assert(Scd2.pointInTimeJoin(facts, t, "prod_id", "sale_label")
      .count() === facts.count())
  }

  test("pointInTimeJoin suffixes clashing dimension columns") {
    val t = MergeTable(spark, tmpDir("scd").toString, Some(Scd2.Slice))
    Scd2.merge(t, dim((1L, "ball", 10.0)), "prod_id", "2024-01-01")
    val facts = Seq((100L, 1L, "2024-02-01", 99.0))
      .toDF("sale_id", "prod_id", "sale_label", "price") // clashes
    val out = Scd2.pointInTimeJoin(facts, t, "prod_id", "sale_label")
    assert(out.columns.contains("price") &&
      out.columns.contains("price_dim"))
    val row = out.select(col("price"), col("price_dim"))
      .as[(Double, Double)].collect().head
    assert(row === ((99.0, 10.0)))
  }
}
