package graft.etl

import graft.SparkSpec
import graft.lake.MergeTable

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("register creates a persistent external table visible to new sessions") {
    val root = tmpDir("cat").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(Seq(
      ("o1", "2024-01-01", 10.0),
      ("o2", "2024-01-02", 20.0)).toDF("order_id", "date", "amount"))
    Ingestion.register(spark, t, "orders_cat")

    assert(spark.sql("SELECT count(*) AS n FROM graft.orders_cat")
      .head().getLong(0) === 2L)
    // A FRESH session (shared external catalog, own temp-view/state scope)
    // must still resolve it — temp views would not survive this.
    val fresh = spark.newSession()
    assert(fresh.sql("SELECT count(*) AS n FROM graft.orders_cat")
      .head().getLong(0) === 2L)
    // Partition column must be usable for pruning predicates.
    assert(fresh.sql(
      "SELECT order_id FROM graft.orders_cat WHERE date = '2024-01-02'")
      .head().getString(0) === "o2")
  }

  test("re-register refreshes the location after a merge (crawler analog)") {
    val root = tmpDir("cat").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(Seq(("o1", "2024-01-01", 10.0)).toDF("order_id", "date", "amount"))
    Ingestion.register(spark, t, "orders_cat2")
    t.merge(Seq(("o2", "2024-01-02", 20.0)).toDF("order_id", "date", "amount"),
      "order_id")
    Ingestion.register(spark, t, "orders_cat2")
    assert(spark.sql("SELECT count(*) FROM graft.orders_cat2")
      .head().getLong(0) === 2L)
  }
}
