package graft.ext

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[DedupQueries.localized]]'s driver budget (r15 verdict #3):
  * a relation under the row cap becomes a driver-local LocalRelation;
  * one OVER the cap must NOT land on the driver — it falls back to the
  * distributed eager-cache path with identical rows. */
class LocalizedCapSpec extends SparkSpec {

  private def isLocal(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect { case _: LocalRelation => () }.nonEmpty

  test("localized caps the driver collect and falls back to eager") {
    val df = spark.range(10).select(col("id"), (col("id") * 2).as("v"))
    val prev = sys.props.get("graft.localized.maxRows")
    try {
      sys.props("graft.localized.maxRows") = "5"
      val over = DedupQueries.localized(df)
      assert(!isLocal(over),
        "an over-cap relation must not become a LocalRelation")
      assert(over.collect().map(_.getLong(0)).sorted === (0L until 10L))
      over.unpersist()

      sys.props("graft.localized.maxRows") = "16"
      val under = DedupQueries.localized(df)
      assert(isLocal(under),
        "an under-cap relation must localize to a LocalRelation")
      assert(under.collect().map(_.getLong(0)).sorted === (0L until 10L))
    } finally prev match {
      case Some(v) => sys.props("graft.localized.maxRows") = v
      case None    => sys.props -= "graft.localized.maxRows"
    }
  }

  test("bloom columns may not be partition columns") {
    val ex = intercept[IllegalArgumentException] {
      graft.lake.MergeTable(spark, tmpDir("blm_part").toString,
        Some("k"), Nil, deletionVectors = false, bloomCols = Seq("k"))
    }
    assert(ex.getMessage.contains("partition column"))
  }
}
