package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimHashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val hofSimhash = {
    val votes = (0 until 16).map { j =>
      s"""aggregate(transform(hs, h -> 2 * cast(shiftright(h, $j) & 1 as int) - 1),
          0, (acc, x) -> acc + x)"""
    }
    (0 until 16).zip(votes)
      .map { case (j, v) => s"IF(($v) > 0, ${1L << j}, 0)" }
      .mkString(" + ")
  }

  test("simhash16 is bit-identical to the 16-lambda HOF form") {
    SimHashFunctions.register(spark)
    val rng = new scala.util.Random(3)
    val rows = Seq.fill(80)(Seq.fill(1 + rng.nextInt(60))(
      rng.nextLong().abs % 4294967296L))
    val df = rows.toDF("hs")
      .select(expr("simhash16(hs)").as("fast"), expr(hofSimhash).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).isEmpty)
    assert(df.filter(col("fast") === col("ref")).count() === 80)
  }

  test("simhash16 null/empty contract") {
    SimHashFunctions.register(spark)
    val df = Seq(Option.empty[Seq[Long]], Some(Seq.empty[Long]), Some(Seq(3L)))
      .toDF("hs").select(expr("simhash16(hs)").as("s"))
    val out = df.collect()
    assert(out(0).isNullAt(0), "null array -> null")
    assert(out(1).getLong(0) === 0L, "empty array -> no bits set")
    assert(out(2).getLong(0) === 3L, "hash 3 votes bits 0 and 1 positive")
  }

  test("simhash16 participates in whole-stage codegen") {
    SimHashFunctions.register(spark)
    val p = tmpDir("sh16").toString + "/v.parquet"
    spark.range(20)
      .selectExpr("transform(sequence(0, 9), i -> (i * 31 + id) % 65536) AS hs")
      .write.parquet(p)
    val df = spark.read.parquet(p).select(expr("simhash16(hs)").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("Project [simhash16") && l.trim.startsWith("*(")),
      s"expected simhash16's Project inside a codegen span:\n$plan")
    assert(df.count() === 20)
  }
}
