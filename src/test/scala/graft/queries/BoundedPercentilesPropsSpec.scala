package graft.queries

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck property: [[AnalyticQueries.boundedPercentiles]] (O(domain)
  * count-by-value state) must equal Spark's exact `percentile`
  * (O(rows) per-group buffering) for ARBITRARY grouped integer data —
  * the equivalence that makes it a safe 100 TB substitute. */
class BoundedPercentilesPropsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen: Gen[List[(String, Int)]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.oneOf("A", "B", "C"),
      Gen.choose(1, 50))))

  test("boundedPercentiles ≡ exact percentile on arbitrary grouped data") {
    val qs = Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75")
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("g", "v")
      val bounded = AnalyticQueries.boundedPercentiles(df, "g", "v", qs)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val exact = df.groupBy($"g").agg(
        org.apache.spark.sql.functions.expr("round(percentile(v, 0.25), 4)"),
        org.apache.spark.sql.functions.expr("round(percentile(v, 0.5), 4)"),
        org.apache.spark.sql.functions.expr("round(percentile(v, 0.75), 4)"))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      bounded == exact
    })
  }
}
