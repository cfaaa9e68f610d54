package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "a b c"),
      (1L, "the quick brown fox"),
      (2L, "x" * 300)).toDF("doc_id", "text")
  }

  test("mediaTable carries an opaque binary payload column") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("media").dataType == BinaryType)
    val row = m.filter(col("doc_id") === 0L).head()
    assert(row.getAs[Array[Byte]]("media").sameElements("a b c".getBytes("UTF-8")))
  }

  test("stub decode is deterministic and partition-parallel") {
    val d1 = Multimodal.decoded(spark, Multimodal.mediaTable(docs))
      .orderBy("doc_id").collect()
    val d2 = Multimodal.decoded(spark,
        Multimodal.mediaTable(docs).repartition(3))
      .orderBy("doc_id").collect()
    assert(d1.sameElements(d2), "decode must not depend on partitioning")
    val r = d1.head
    assert(r.getAs[Int]("n_bytes") == 5)
    assert(r.getAs[Int]("width") == 32 + 5 % 608)
  }

  test("a custom decoder plugs in without touching the pipeline") {
    val doubler = new MediaDecoder {
      def decode(r: MediaRecord): DecodedMedia =
        StubDecoder.decode(r).copy(width = 2 * r.media.length)
    }
    val out = Multimodal.decoded(spark, Multimodal.mediaTable(docs), doubler)
    assert(out.filter(col("doc_id") === 0L).head().getAs[Int]("width") == 10)
  }
}
