package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L
  private val AB: Seq[(Long, Long)] =
    (1 to 12).map { i =>
      ((2654435761L * i) % 1073741789L, (2246822519L * i) % P)
    }

  private val hofSig = {
    val mins = AB.map { case (a, b) =>
      s"array_min(transform(hs, h -> ($a * h + $b) % $P))"
    }
    s"array(${mins.mkString(", ")})"
  }

  test("minhash_sig is bit-identical to the array_min(transform) HOF form") {
    MinHashFunctions.register(spark, AB, P)
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(60)(Seq.fill(1 + rng.nextInt(50))(
      rng.nextLong().abs % P))
    val df = rows.toDF("hs")
      .select(expr("minhash_sig(hs)").as("fast"), expr(hofSig).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).isEmpty)
    assert(df.filter(col("fast") === col("ref")).count() === 60)
  }

  test("minhash_sig null contract: null array -> null signature") {
    MinHashFunctions.register(spark, AB, P)
    val df = Seq(Option.empty[Seq[Long]], Some(Seq(42L))).toDF("hs")
      .select(expr("minhash_sig(hs)").as("sig"))
    val out = df.collect()
    assert(out.exists(_.isNullAt(0)))
    assert(out.exists(!_.isNullAt(0)))
  }

  test("minhash_sig participates in whole-stage codegen") {
    MinHashFunctions.register(spark, AB, P)
    val p = tmpDir("mhs").toString + "/v.parquet"
    spark.range(20)
      .selectExpr(s"transform(sequence(0, 9), i -> (i * 7 + id) % $P) AS hs")
      .write.parquet(p)
    val df = spark.read.parquet(p).select(expr("minhash_sig(hs)").as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("Project [minhash_sig") && l.trim.startsWith("*(")),
      s"expected minhash_sig's Project inside a codegen span:\n$plan")
    assert(df.count() === 20)
  }
}
