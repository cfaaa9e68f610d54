package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val hofDot =
    """aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
       cast(0 as double), (acc, v) -> acc + v)"""

  test("dot_f is bit-identical to the aggregate(zip_with) fold") {
    VectorFunctions.register(spark)
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(50)(
      (Array.fill(64)(rng.nextFloat() * 2 - 1),
        Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(expr("dot_f(a, b)").as("fast"), expr(hofDot).as("ref"))
    // exact equality, not tolerance: same left-to-right double fold
    assert(df.filter(col("fast") =!= col("ref")).isEmpty)
    val one = df.head()
    assert(math.abs(one.getDouble(0)) > 0, "sanity: non-degenerate input")
  }

  test("dot_f nulls propagate and mismatched lengths fold the shorter side") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(Array(1f, 2f, 3f)), Some(Array(2f, 3f))),
      (None: Option[Array[Float]], Some(Array(1f)))).toDF("a", "b")
      .select(expr("dot_f(a, b)").as("d"))
    val out = df.collect()
    assert(out(0).getDouble(0) === 1.0 * 2 + 2.0 * 3)
    assert(out(1).isNullAt(0))
  }

  test("register is idempotent and GraftExtensions injects the same builder") {
    VectorFunctions.register(spark)
    VectorFunctions.register(spark) // second call: no replace, no warning
    assert(spark.sessionState.functionRegistry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f")))
    // The extensions hook (spark.sql.extensions=graft.functions.
    // GraftExtensions) must apply cleanly and its builder must produce
    // the native expression.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val built = VectorFunctions.DotFBuilder(Seq(Literal(1), Literal(2)))
    assert(built.isInstanceOf[DotProductF])
  }

  test("dot_f participates in whole-stage codegen") {
    VectorFunctions.register(spark)
    // Parquet round-trip: a local Seq constant-folds to LocalTableScan and
    // HOF-built arrays (transform) are themselves codegen-incompatible and
    // would break the span around dot_f.
    val p = tmpDir("dotf").toString + "/v.parquet"
    spark.range(10)
      .selectExpr(
        "transform(sequence(0, 7), i -> cast(i + id as float)) AS a",
        "transform(sequence(0, 7), i -> cast(i * 2 as float)) AS b")
      .write.parquet(p)
    val df = spark.read.parquet(p).select(expr("dot_f(a, b)").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l =>
        l.contains("Project [dot_f") && l.trim.startsWith("*(")),
      s"expected dot_f's Project inside a codegen span:\n$plan")
    assert(df.count() === 10)
  }
}
