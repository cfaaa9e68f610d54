package graft.model

import org.apache.spark.sql.types._

/** Typed model + explicit read schemas for the reference's three datasets
  * (ref: README.md:69-92; product_etl.py:42-47 declares products all-string
  * on read, then conforms; orders/order_items conform post-read,
  * orders_etl.py:76-80, order_items_etl.py:106-107).
  *
  * Declared intent wins over the reference's accidental pandas inference
  * (SURVEY §1.2): ints are IntegerType, `reordered` is BooleanType,
  * `total_amount` is DoubleType to match fixture/bench parity (README
  * declares Decimal; see SURVEY §7.6).
  */
object Schemas {

  /** CSV read schema for products — all-string, conformed later
    * (ref: product_etl.py:42-47). */
  val productsRaw: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = true),
    StructField("department_id", StringType, nullable = true),
    StructField("department", StringType, nullable = true),
    StructField("product_name", StringType, nullable = true),
  ))

  val ordersRaw: StructType = StructType(Seq(
    StructField("order_num", StringType, nullable = true),
    StructField("order_id", StringType, nullable = true),
    StructField("user_id", StringType, nullable = true),
    StructField("order_timestamp", StringType, nullable = true),
    StructField("total_amount", DoubleType, nullable = true),
  ))

  val orderItemsRaw: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("order_id", StringType, nullable = true),
    StructField("user_id", StringType, nullable = true),
    StructField("days_since_prior_order", IntegerType, nullable = true),
    StructField("product_id", StringType, nullable = true),
    StructField("add_to_cart_order", IntegerType, nullable = true),
    StructField("reordered", BooleanType, nullable = true),
    StructField("order_timestamp", StringType, nullable = true),
  ))

  /** Required (NOT NULL) column subsets driving the validation split
    * (ref: product_etl.py:54-57; orders_etl.py:57-59;
    * order_items_etl.py:80-85). */
  val productsRequired: Seq[String] =
    Seq("product_id", "department_id", "department", "product_name")
  val ordersRequired: Seq[String] =
    Seq("order_id", "user_id", "order_timestamp")
  val orderItemsRequired: Seq[String] =
    Seq("id", "order_id", "product_id", "user_id", "order_timestamp")

  /** Primary keys used for dedup + MERGE matching
    * (ref: product_etl.py:60,75; orders_etl.py:74,85;
    * order_items_etl.py:104,112). */
  val productsPk = "product_id"
  val ordersPk = "order_id"
  val orderItemsPk = "id"

  /** Partition columns (ref: product_etl.py:84, orders_etl.py:94,
    * order_items_etl.py:121). */
  val productsPartition = "department"
  val ordersPartition = "date"
  val orderItemsPartition = "date"
}

/** Typed rows for the API boundary (compile-time schema where it helps). */
case class Product(product_id: String, department_id: Int,
    department: String, product_name: String)

case class Order(order_id: String, user_id: String,
    order_timestamp: java.sql.Timestamp, total_amount: Double,
    date: java.sql.Date)

case class OrderItem(id: String, order_id: String, user_id: String,
    days_since_prior_order: Option[Int], product_id: String,
    add_to_cart_order: Option[Int], reordered: Option[Boolean],
    order_timestamp: java.sql.Timestamp, date: java.sql.Date)
