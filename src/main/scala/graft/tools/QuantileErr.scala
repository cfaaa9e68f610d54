package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the quantile sketch's error/size trade by sub-bucket width
  * (SURVEY §6.7 evidence for X137) — for k ∈ {4, 7, 10}, the sketch
  * size (total buckets across groups) and the worst relative error of
  * p50/p90/p99 estimates vs exact percentiles of l_extendedprice cents
  * per returnflag. The designed bound is 2^-k on any quantile.
  * Usage: runMain graft.tools.QuantileErr [sfDir] */
object QuantileErr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("grp"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("v"))
      .cache()
    val n = base.count()
    val exact = base.groupBy("grp")
      .agg(expr("percentile(v, 0.5)").as("e50"),
        expr("percentile(v, 0.9)").as("e90"),
        expr("percentile(v, 0.99)").as("e99"))
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

    for (k <- Seq(4, 7, 10)) {
      val sk = base
        .withColumn("bid", expr(graft.ext.SketchQueries.quantileBucket("v", k)))
        .groupBy(col("grp"), col("bid")).agg(count(lit(1)).as("c"))
        .cache()
      val size = sk.count()
      val cum = sk.withColumn("cum", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("bid"))))
      val ng = sk.groupBy("grp").agg(sum("c").as("n"))
      val est = cum.join(ng, Seq("grp")).groupBy(col("grp"))
        .agg(
          min(when(col("cum") >= expr("(n + 1) div 2"), col("bid"))).as("b50"),
          min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("bid"))).as("b90"),
          min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("bid"))).as("b99"))
        .select(col("grp"),
          expr(graft.ext.SketchQueries.quantileEstimate("b50", k)).as("p50"),
          expr(graft.ext.SketchQueries.quantileEstimate("b90", k)).as("p90"),
          expr(graft.ext.SketchQueries.quantileEstimate("b99", k)).as("p99"))
        .collect().map(r => r.getString(0) ->
          Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val worst = est.flatMap { case (g, ps) =>
        ps.zip(exact(g)).map { case (p, e) => math.abs(p - e) / e }
      }.max
      sk.unpersist()
      println(f"QSKETCH k=$k buckets=$size rows=$n " +
        f"worst_rel_err=$worst%.5f bound=${math.pow(2.0, -k)}%.5f")
    }
    spark.stop()
  }
}
