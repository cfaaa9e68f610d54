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
}
