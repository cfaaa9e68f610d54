package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.MergeTable

/** The incremental cross-run dedup's SCALE claim, pinned at plan level:
  * probing the persisted band index with a batch's key set must admit
  * only the files whose partition/stats/bloom metadata may hold those
  * keys — the historical side is FILE-PRUNED, never rescanned. (Result
  * correctness is the DuckDB oracle's job — q_dedup_incr is hash-green
  * at all three fixture scales.) */
class DedupIncrSpec extends SparkSpec {
  import spark.implicits._

  test("band-index probe admits a strict subset of index files; the " +
      "bucket equi-join residual is exact on the admitted superset") {
    // the index layout dedupIncremental persists: band-partitioned,
    // range-clustered + stats'd + bloom'd on the long probe hash
    val t = MergeTable(spark, tmpDir("incr-idx").toString, Some("band"),
      Seq("bhash"), deletionVectors = false, bloomCols = Seq("bhash"))
    val rows = (0 until 4).flatMap { b =>
      (0 until 400).map(i =>
        (b, s"k$b-$i", (b * 10000 + i).toLong, (b * 1000 + i).toLong))
    }.toDF("band", "bkey", "bhash", "doc_id")
    t.overwrite(rows.repartitionByRange(16, col("band"), col("bhash")))
    val allFiles = t.read().inputFiles.length
    assert(allFiles >= 8, s"need a multi-file index, got $allFiles")

    // a probe batch hitting ONE band's low range — driver metadata in,
    // admitted files out
    val keys: Seq[Any] = (0L to 30L).map(i => 10000L + i)
    val admitted = t.probeKeys("bhash", keys)
    val admittedFiles = admitted.inputFiles.length
    assert(admittedFiles < allFiles,
      s"probe must file-skip: admitted $admittedFiles of $allFiles")
    assert(admittedFiles >= 1, "and admit the files that DO hold the keys")

    // the admitted rows are a SUPERSET; the (band, bkey) equi-join is
    // the exact residual — every probed key's rows survive it
    val probe = Seq((1, "k1-5"), (1, "k1-17")).toDF("band", "bkey")
    val hits = admitted.join(probe, Seq("band", "bkey"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits === Set(1005L, 1017L))
  }

  test("relation-valued probeKeys admits EXACTLY the literal probe's " +
      "file set — partition, stats AND bloom surfaces agree") {
    val t = MergeTable(spark, tmpDir("incr-rel").toString, Some("band"),
      Seq("bhash"), deletionVectors = false, bloomCols = Seq("bhash"))
    val rows = (0 until 4).flatMap { b =>
      (0 until 400).map(i =>
        (b, s"k$b-$i", (b * 10000 + i).toLong, (b * 1000 + i).toLong))
    }.toDF("band", "bkey", "bhash", "doc_id")
    t.overwrite(rows.repartitionByRange(16, col("band"), col("bhash")))
    // several key shapes: a dense low-range run, sparse cross-band
    // points, and misses that only the bloom can reject
    val shapes: Seq[Seq[Long]] = Seq(
      (10000L to 10030L).toSeq,
      Seq(5L, 10399L, 20007L, 30123L),
      Seq(123456789L, 10500L, 777L)) // 777 misses band 0's 0..399 too
    shapes.foreach { ks =>
      val lit = t.probeKeys("bhash", ks.asInstanceOf[Seq[Any]])
        .inputFiles.toSet
      val rel = t.probeKeys("bhash", ks.toDF("bhash")).inputFiles.toSet
      assert(rel === lit, s"admission drift for keys=$ks")
    }
    // an EMPTY key relation matches no rows, so the relational probe
    // admits no files (the literal overload's empty IN-list admits
    // everything — a superset is always allowed, but the relation path
    // can afford the tight answer)
    assert(t.probeKeys("bhash", Seq.empty[Long].toDF("bhash"))
      .inputFiles.isEmpty)
    // non-integral key relation degrades to the full read, never a miss
    val full = t.probeKeys("bhash", Seq("x", "y").toDF("s")).inputFiles.toSet
    assert(full === t.read().inputFiles.toSet)
  }

  test("q_dedup_incr pairs history with the new batch only, under the " +
      "shared modulo split") {
    val out = DedupQueries.dedupIncremental(spark, "/root/testdata/sf0.001")
      .select("doc_hist", "doc_new").as[(Long, Long)].collect()
    assert(out.nonEmpty, "the fixture corpus must yield near-dup pairs")
    assert(out.forall { case (h, n) => h % 10 != 0 && n % 10 == 0 },
      "doc_hist must come from history, doc_new from the arriving batch")
  }
}
