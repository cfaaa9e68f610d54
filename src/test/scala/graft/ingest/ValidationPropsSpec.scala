package graft.ingest

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties (SURVEY §5.3): structural invariants that must
  * hold for ANY input, not just the fixtures — complement-exactness of
  * the validation split, dedup determinism under repartitioning, and
  * set-op complementarity. */
class ValidationPropsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen: Gen[List[(Option[String], Double)]] =
    Gen.listOfN(25, Gen.zip(
      Gen.choose(0, 8).map(i => if (i == 0) None else Some(s"k$i")),
      Gen.choose(-5.0, 100.0)))

  test("valid ∪ rejected = input and the branches are disjoint") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("key", "amount")
      val s = Validation.withRules(df, Seq(
        (col("key").isNotNull, "null key"),
        (col("amount") >= 0.0, "negative amount")))
      val total = df.count()
      val nValid = s.valid.count()
      val nRej = s.rejected.count()
      val union = s.valid.unionByName(s.rejected.drop("rejection_reason"))
      val sameMultiset =
        union.exceptAll(df).isEmpty && df.exceptAll(union).isEmpty
      s.unpersist()
      nValid + nRej == total && sameMultiset
    })
  }

  test("dedupByKey: one row per key, subset of input, repartition-stable") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.map { case (k, v) => (k.getOrElse("knull"), v) }
        .toDF("key", "amount")
      val d1 = Validation.dedupByKey(df, "key", Seq(col("amount")))
      val d2 = Validation.dedupByKey(df.repartition(7), "key",
        Seq(col("amount")))
      d1.count() == df.select("key").distinct().count() &&
        d1.exceptAll(df).isEmpty &&
        d1.exceptAll(d2).isEmpty && d2.exceptAll(d1).isEmpty
    })
  }

  test("except ∪ intersect = distinct left; branches disjoint") {
    val xs = Gen.listOfN(20, Gen.choose(0, 12))
    check(Prop.forAll(xs, xs) { (a, b) =>
      val da = a.toDF("x")
      val db = b.toDF("x")
      val ex = da.except(db)
      val in = da.intersect(db)
      val together = ex.unionByName(in)
      together.exceptAll(da.distinct()).isEmpty &&
        da.distinct().exceptAll(together).isEmpty &&
        ex.intersect(in).isEmpty
    })
  }
}
