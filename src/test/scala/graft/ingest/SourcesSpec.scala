package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("order_id", StringType),
    StructField("amount", DoubleType)))

  test("csvPermissive quarantines malformed rows, keeps good ones") {
    val dir = tmpDir("perm")
    // one clean file ≙ one clean Excel sheet; one with garbage rows
    Files.writeString(dir.resolve("sheet1.csv"),
      "order_id,amount\no1,10.5\no2,20.0")
    Files.writeString(dir.resolve("sheet2.csv"),
      "order_id,amount\no3,not-a-number\no4,40.0\no5,1.0,EXTRA,COLS")
    val scan = Sources.csvPermissive(spark, dir.toString, schema)
    try {
      val good = scan.good.as[(String, Double)].collect().toSet
      assert(good === Set(("o1", 10.5), ("o2", 20.0), ("o4", 40.0)))
      val bad = scan.corrupt.as[String].collect().toSet
      assert(bad === Set("o3,not-a-number", "o5,1.0,EXTRA,COLS"),
        "malformed rows must land in _corrupt_record verbatim")
    } finally scan.unpersist()
  }

  test("csvPermissive on a fully-clean directory yields no corrupt rows") {
    val dir = tmpDir("perm")
    Files.writeString(dir.resolve("a.csv"), "order_id,amount\no1,1.0")
    val scan = Sources.csvPermissive(spark, dir.toString, schema)
    try {
      assert(scan.good.count() === 1)
      assert(scan.corrupt.isEmpty)
    } finally scan.unpersist()
  }

  test("jsonLines quarantines malformed lines, keeps good ones") {
    val dir = tmpDir("json")
    Files.writeString(dir.resolve("a.jsonl"),
      """{"order_id": "o1", "amount": 10.5}
        |not json at all
        |{"order_id": "o2", "amount": 20.0}""".stripMargin)
    val scan = Sources.jsonLines(spark, dir.toString, schema)
    try {
      val good = scan.good.select("order_id", "amount")
        .as[(String, Double)].collect().toSet
      assert(good === Set(("o1", 10.5), ("o2", 20.0)))
      assert(scan.corrupt.count() === 1)
    } finally scan.unpersist()
  }

  test("orc round-trips with predicate pushdown at the scan") {
    val p = tmpDir("orc").toString + "/t"
    Seq(("o1", 10.0), ("o2", 20.0), ("o3", 30.0)).toDF("order_id", "amount")
      .write.orc(p)
    val scan = Sources.orc(spark, p).filter($"amount" > 15.0)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(amount)"),
      s"expected the filter pushed to the ORC reader:\n$plan")
    assert(scan.count() === 2)
  }

  test("detectRawFiles filters by prefix/suffix and derives dataset names") {
    val root = tmpDir("zone")
    val raw = root.resolve("raw")
    Files.createDirectories(raw.resolve("orders"))
    Files.createDirectories(raw.resolve("products/nested"))
    Files.createDirectories(root.resolve("archived/orders"))
    Files.writeString(raw.resolve("orders/f1.csv"), "x")
    Files.writeString(raw.resolve("orders/f2.xlsx"), "x")
    Files.writeString(raw.resolve("orders/skip.json"), "x") // wrong suffix
    Files.writeString(raw.resolve("toplevel.csv"), "x") // no dataset segment
    Files.writeString(raw.resolve("products/nested/f3.csv"), "x")
    Files.writeString(root.resolve("archived/orders/old.csv"), "x") // not raw/
    val found = Sources.detectRawFiles(root)
    assert(found.map(_._1) === Seq("orders", "orders", "products"))
    assert(found.map(_._2).forall(_.contains("/raw/")))
  }

  test("detectRawFiles on a missing raw zone is empty, not an error") {
    assert(Sources.detectRawFiles(tmpDir("empty")) === Seq.empty)
  }
}
