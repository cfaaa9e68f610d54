package graft.etl

import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.lake.MergeTable
import graft.model.Schemas

/** End-to-end: dirty fixtures (per FIXTURES.md §A) through all three jobs —
  * validation/quarantine, dedup, FK semi-joins, MERGE, re-ingestion
  * idempotency. */
class IngestionSpec extends SparkSpec {
  import spark.implicits._

  private def write(p: Path, lines: String*): Unit =
    Files.writeString(p, lines.mkString("\n") + "\n")

  private def setup(): (Path, String, String, String) = {
    val dir = tmpDir("etl")
    Files.createDirectories(dir.resolve("raw/products"))
    Files.createDirectories(dir.resolve("raw/orders"))
    Files.createDirectories(dir.resolve("raw/order_items"))
    write(dir.resolve("raw/products/products.csv"),
      "product_id,department_id,department,product_name",
      "p1,1,produce,apple",
      "p2,2,dairy,milk",
      "p2,2,dairy,milk-dup",          // dup key → dedup
      "p3,,dairy,cheese",             // null required → quarantine
      ",4,misc,ghost")                // null PK → quarantine
    write(dir.resolve("raw/orders/sheet1.csv"),
      "order_num,order_id,user_id,order_timestamp,total_amount",
      "1,o1,u1,2024-01-01 10:00:00,50.0",
      "2,o2,u1,2024-01-02 11:00:00,75.5",
      "3,o3,u2,2024-01-02 12:00:00,-5.0",  // negative → quarantine
      "4,,u3,2024-01-03 09:00:00,10.0")    // null PK → quarantine
    write(dir.resolve("raw/order_items/sheet1.csv"),
      "id,order_id,user_id,days_since_prior_order,product_id,add_to_cart_order,reordered,order_timestamp",
      "i1,o1,u1,,p1,1,false,2024-01-01 10:00:00",
      "i2,o1,u1,3,p2,2,true,2024-01-01 10:00:00",
      "i3,oX,u1,3,p1,1,false,2024-01-01 10:00:00",  // orphan order FK
      "i4,o2,u1,3,pX,1,false,2024-01-02 11:00:00",  // orphan product FK
      "i5,o2,u1,,p1,,,")                            // null ts → quarantine
    (dir, s"$dir/tables/products", s"$dir/tables/orders",
      s"$dir/tables/order_items")
  }

  test("three-job pipeline end-to-end with dirty fixtures") {
    val (dir, productsT, ordersT, itemsT) = setup()

    val pr = Ingestion.productsJob(spark, s"$dir/raw/products",
      productsT, s"$dir/quarantine/products")
    assert(pr.validRows === 2 && pr.rejectedRows === 2)

    val or = Ingestion.ordersJob(spark, s"$dir/raw/orders",
      ordersT, s"$dir/quarantine/orders")
    assert(or.validRows === 2 && or.rejectedRows === 2)

    val ir = Ingestion.orderItemsJob(spark, s"$dir/raw/order_items",
      ordersT, productsT, itemsT, s"$dir/quarantine/order_items")
    // i1, i2 survive; i3/i4 dropped by FK semi-joins; i5 quarantined
    assert(ir.validRows === 2 && ir.rejectedRows === 1)

    val items = MergeTable(spark, itemsT, Some("date")).read()
    assert(items.select("id").as[String].collect().toSet === Set("i1", "i2"))
    // conformed: date derived from order_timestamp
    assert(items.select("date").distinct().as[java.sql.Date].head().toString
      === "2024-01-01")

    // quarantine files carry reasons
    val q = spark.read.option("header", "true")
      .csv(s"$dir/quarantine/orders")
    assert(q.select("rejection_reason").as[String].collect().toSet ===
      Set("Missing required fields", "total_amount must be positive"))
  }

  test("ordersJobXlsx ingests a real multi-sheet workbook end-to-end") {
    val dir = tmpDir("etlx")
    val header =
      Seq("order_num", "order_id", "user_id", "order_timestamp", "total_amount")
    val xlsx = graft.ingest.XlsxTestData.write(dir.resolve("orders.xlsx"), Seq(
      "Jan" -> Seq(header,
        Seq("1", "ox1", "u1", "2024-01-01 10:00:00", "25.5"),
        Seq("2", "ox2", "u2", "2024-01-01 11:00:00", "10.0")),
      "Feb" -> Seq(header,
        Seq("3", "ox3", "u3", "2024-02-01 10:00:00", null), // null amt OK
        Seq("4", "ox4", null, "2024-02-01 11:00:00", "5.0")), // → quarantine
      "Scratch" -> Seq(Seq("junk"), Seq("zzz")))) // bad header → skipped
    val r = Ingestion.ordersJobXlsx(spark, xlsx,
      s"$dir/tables/orders", s"$dir/quarantine/orders")
    assert(r.validRows === 3 && r.rejectedRows === 1)
    val t = MergeTable(spark, s"$dir/tables/orders", Some("date")).read()
    assert(t.select("order_id").as[String].collect().toSet ===
      Set("ox1", "ox2", "ox3"))
    assert(t.select("total_amount").where($"order_id" === "ox1")
      .as[Double].head() === 25.5)
    assert(t.select("date").distinct().as[java.sql.Date].collect()
      .map(_.toString).toSet === Set("2024-01-01", "2024-02-01"))
  }

  test("re-ingesting an overlapping batch MERGE-updates, doesn't duplicate") {
    val (dir, productsT, _, _) = setup()
    Ingestion.productsJob(spark, s"$dir/raw/products", productsT,
      s"$dir/quarantine/products")
    // second batch: p2 updated, p9 new
    write(dir.resolve("raw/products/products2.csv"),
      "product_id,department_id,department,product_name",
      "p2,2,dairy,milk-renamed",
      "p9,9,bakery,bread")
    Files.delete(dir.resolve("raw/products/products.csv"))
    Ingestion.productsJob(spark, s"$dir/raw/products", productsT,
      s"$dir/quarantine/products2")
    val t = MergeTable(spark, productsT, Some("department")).read()
    val byId = t.select("product_id", "product_name").as[(String, String)]
      .collect().toMap
    assert(byId === Map("p1" -> "apple", "p2" -> "milk-renamed",
      "p9" -> "bread"))
  }
}
