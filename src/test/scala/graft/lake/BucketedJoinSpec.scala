package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables join with NO Exchange (co-located)") {
    val left = (0L until 1000L).map(i => (i, s"c$i")).toDF("k", "name")
    val right = (0L until 5000L).map(i => (i % 1000, i * 1.5)).toDF("k", "amt")
    Bucketing.writeBucketed(left, "bkt_left", "k", 8)
    Bucketing.writeBucketed(right, "bkt_right", "k", 8)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the big-big join path: broadcast would hide the co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // join AND aggregate on the bucket key: both reuse the bucketing,
      // so the whole plan runs shuffle-free
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), Seq("k"))
        .groupBy(col("k")).agg(sum(col("amt")).as("total"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
