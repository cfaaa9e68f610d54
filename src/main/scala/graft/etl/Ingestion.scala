package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Sources, Validation}
import graft.lake.MergeTable
import graft.model.Schemas

/** The reference's three Glue jobs re-expressed as one distributed library.
  *
  * Each job is: scan → validate (quarantine complement) → dedup (PK) →
  * conform (casts + derived partition date + audit timestamp) →
  * [FK semi-joins for order_items] → MERGE upsert into the lake table
  * (refs: product_etl.py, orders_etl.py, order_items_etl.py end-to-end).
  *
  * Unlike the reference, validation/quarantine is written for ALL three
  * datasets (the reference silently discards invalid orders/order_items
  * rows — orders_etl.py:60-62; README.md:108 claims otherwise; SURVEY §1.1).
  */
object Ingestion {

  final case class JobResult(tableVersion: Long, validRows: Long,
      rejectedRows: Long)

  /** products: CSV → validate all-4-required → quarantine → dedup →
    * audit column → MERGE on product_id, partitioned by department
    * (ref: product_etl.py:42-93). */
  def productsJob(spark: SparkSession, rawPath: String, tableRoot: String,
      quarantinePath: String): JobResult = {
    val raw = Sources.csv(spark, rawPath, Schemas.productsRaw)
    val split = Validation.requireNotNull(raw, Schemas.productsRequired)
    try {
      Validation.writeQuarantine(split.rejected, quarantinePath)
      val conformed = split.valid
        .withColumn("department_id", col("department_id").cast("int"))
        .withColumn("ingestion_timestamp", current_timestamp())
      val deduped = Validation.dedupByKey(conformed, Schemas.productsPk,
        Seq(col("department_id"), col("product_name")))
      val table = MergeTable(spark, tableRoot, Some(Schemas.productsPartition))
      val v = table.merge(deduped, Schemas.productsPk)
      JobResult(v, deduped.count(), split.rejected.count())
    } finally split.unpersist()
  }

  /** orders: multi-file permissive CSV (≙ the reference's Excel sheets) →
    * required-field + value rules → conform/derive date → dedup → MERGE on
    * order_id, partitioned by date (ref: orders_etl.py:41-103). Includes the
    * DOC-ONLY `total_amount > 0` and timestamp-range rules for real
    * (docs/full_implementation_guide.md:142-143). */
  def ordersJob(spark: SparkSession, rawDir: String, tableRoot: String,
      quarantinePath: String): JobResult = {
    val scan = Sources.csvPermissive(spark, rawDir, Schemas.ordersRaw)
    try runOrders(spark, scan.good, tableRoot, quarantinePath)
    finally scan.unpersist()
  }

  /** orders from a REAL `.xlsx` workbook — the reference's actual input
    * format (`orders_etl.py:41-64`): [[graft.ingest.Excel.readXlsx]]
    * unions header-matched sheets (skipping bad ones, like the per-sheet
    * try/except), the string cells conform to the typed raw schema, and
    * the SAME validate → dedup → MERGE chain as the CSV path runs. */
  def ordersJobXlsx(spark: SparkSession, xlsxPath: String, tableRoot: String,
      quarantinePath: String): JobResult = {
    val sheets = graft.ingest.Excel.readXlsx(spark, xlsxPath)
    // A skipped sheet is silently-dropped data unless surfaced: warn with
    // names (the reference prints its per-sheet failures the same way).
    if (sheets.skippedSheets.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ordersJobXlsx($xlsxPath): skipped header-mismatched sheets " +
          sheets.skippedSheets.mkString("[", ", ", "]") +
          " — their rows are in neither the table nor the quarantine")
    val raw = sheets.df.select(Schemas.ordersRaw.fields.toSeq
      .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    runOrders(spark, raw, tableRoot, quarantinePath)
  }

  /** Shared orders chain: conform → rules/quarantine → dedup → MERGE
    * (ref: orders_etl.py:57-96; `total_amount > 0` and timestamp-range
    * rules are the DOC-ONLY claims of
    * docs/full_implementation_guide.md:142-143, implemented for real). */
  private def runOrders(spark: SparkSession, raw: DataFrame,
      tableRoot: String, quarantinePath: String): JobResult = {
    val conformed = raw
      .withColumn("order_timestamp", col("order_timestamp").cast("timestamp"))
      .withColumn("date", to_date(col("order_timestamp")))
      .withColumn("ingestion_timestamp", current_timestamp())
    val split = Validation.withRules(conformed, Seq(
      Schemas.ordersRequired.map(col(_).isNotNull).reduce(_ && _) ->
        "Missing required fields",
      (col("order_timestamp") >= lit("1990-01-01").cast("timestamp") &&
        col("order_timestamp") < lit("2100-01-01").cast("timestamp")) ->
        "order_timestamp out of range",
      (col("total_amount").isNull || col("total_amount") > 0) ->
        "total_amount must be positive",
    ))
    try {
      Validation.writeQuarantine(split.rejected, quarantinePath)
      val deduped = Validation.dedupByKey(split.valid, Schemas.ordersPk,
        Seq(col("order_timestamp")))
      val table = MergeTable(spark, tableRoot, Some(Schemas.ordersPartition))
      val v = table.merge(deduped, Schemas.ordersPk)
      JobResult(v, deduped.count(), split.rejected.count())
    } finally split.unpersist()
  }

  /** order_items: permissive CSV scan → required fields → conform →
    * FK-integrity left-semi joins against orders + products → dedup →
    * derived order_item_total (DOC-ONLY, guide:153) → MERGE on id,
    * partitioned by date (ref: order_items_etl.py:44-130). */
  def orderItemsJob(spark: SparkSession, rawDir: String,
      ordersTableRoot: String, productsTableRoot: String, tableRoot: String,
      quarantinePath: String): JobResult = {
    val scan = Sources.csvPermissive(spark, rawDir, Schemas.orderItemsRaw)
    val conformed = scan.good
      .withColumn("order_timestamp", col("order_timestamp").cast("timestamp"))
      .withColumn("date", to_date(col("order_timestamp")))
      .withColumn("ingestion_timestamp", current_timestamp())
    val split = Validation.requireNotNull(conformed, Schemas.orderItemsRequired)
    try {
      Validation.writeQuarantine(split.rejected, quarantinePath)

      // FK key sets — column-pruned before the join; broadcast-size dimension
      // key sets never shuffle the fact side (ref: order_items_etl.py:45-56).
      val orderKeys = MergeTable(spark, ordersTableRoot,
        Some(Schemas.ordersPartition)).read()
        .select(col(Schemas.ordersPk).as("order_id")).distinct()
      val productKeys = MergeTable(spark, productsTableRoot,
        Some(Schemas.productsPartition)).read()
        .select(col(Schemas.productsPk).as("product_id")).distinct()

      val withFk = split.valid
        .join(orderKeys, Seq("order_id"), "left_semi")
        .join(broadcast(productKeys), Seq("product_id"), "left_semi")
      val deduped = Validation.dedupByKey(withFk, Schemas.orderItemsPk,
        Seq(col("order_timestamp")))
      val table = MergeTable(spark, tableRoot, Some(Schemas.orderItemsPartition))
      val v = table.merge(deduped, Schemas.orderItemsPk)
      JobResult(v, deduped.count(), split.rejected.count())
    } finally { split.unpersist(); scan.unpersist() }
  }

  /** S8 — persistent catalog registration mirroring the reference's
    * `CREATE DATABASE IF NOT EXISTS` + `CREATE TABLE ... USING DELTA
    * LOCATION` (product_etl.py:88-93, orders_etl.py:98-103): an EXTERNAL
    * parquet table over the table's single-dir snapshot, visible to any
    * session sharing the catalog (`spark.newSession`), surviving the
    * DataFrame that created it. Re-running refreshes the location — the
    * analog of the reference's crawler refresh
    * (lambda/start_glue_crawler_lakehouse/lambda_function.py:9-16). */
  def register(spark: SparkSession, table: MergeTable, name: String,
      database: String = "graft"): Unit = {
    val dir = table.snapshotDir().toUri.toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    spark.sql(s"DROP TABLE IF EXISTS `$database`.`$name`")
    spark.sql(
      s"CREATE TABLE `$database`.`$name` USING PARQUET LOCATION '$dir'")
    if (table.partitionCol.isDefined)
      spark.sql(s"MSCK REPAIR TABLE `$database`.`$name`")
  }

  /** Session-scoped registration (temp view over the manifest-exact read) —
    * the lightweight variant when no cross-session catalog is needed. */
  def registerView(spark: SparkSession, table: MergeTable, name: String): Unit =
    table.read().createOrReplaceTempView(name)
}
