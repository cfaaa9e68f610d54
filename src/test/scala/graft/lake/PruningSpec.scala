package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning — the layout optimization the reference builds its
  * tables around (partitionBy department/date; SURVEY §4). Proves the
  * filter reaches the scan as a PartitionFilter (directory-level skip),
  * not a post-scan Filter. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("filter on the partition column prunes at the scan") {
    val d = tmpDir("prune").toString + "/orders"
    Seq(("o1", "O", 10.0), ("o2", "F", 20.0), ("o3", "O", 30.0),
      ("o4", "P", 40.0))
      .toDF("order_id", "status", "amount")
      .write.partitionBy("status").parquet(d)

    val scan = spark.read.parquet(d).filter(col("status") === "O")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"expected the status filter as a PartitionFilter:\n$plan")
    assert(scan.count() === 2)

    // non-partition predicates push to parquet instead
    val dataScan = spark.read.parquet(d).filter(col("amount") > 15.0)
    val dataPlan = dataScan.queryExecution.executedPlan.toString
    assert(dataPlan.contains("PushedFilters: [IsNotNull(amount)"),
      s"expected the amount filter pushed to parquet:\n$dataPlan")
    assert(dataScan.count() === 3)
  }
}
