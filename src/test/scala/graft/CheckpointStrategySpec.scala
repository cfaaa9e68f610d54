package graft

import org.apache.spark.sql.functions._

import graft.ext.{Bpe, DedupQueries}
import graft.queries.AnalyticQueries

/** The [[Checkpoints]] durability knob: every iterative loop must
  * produce BIT-IDENTICAL results whether its per-round state lives in
  * executor block storage (`localCheckpoint`, the default) or in the
  * context's reliable checkpoint dir (`checkpoint`, the
  * cluster-survivability variant — localCheckpointed partitions die
  * with their executor, so long iterative jobs on preemptible fleets
  * set `spark.graft.checkpoint.reliable=true`). */
class CheckpointStrategySpec extends SparkSpec {

  private def withReliable[A](body: => A): A = {
    spark.sparkContext.setCheckpointDir(
      tmpDir("graft_reliable_ckpt").toString)
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try body finally spark.conf.unset(Checkpoints.ReliableKey)
  }

  private def pairs(xs: Seq[(Long, Long)]) = {
    import spark.implicits._
    xs.toDF("doc_a", "doc_b")
  }

  // two chains (diameter > 1 forces multiple propagation rounds), one
  // star, one singleton pair
  private def edges = pairs(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L,
    10L -> 11L, 11L -> 12L, 20L -> 21L, 20L -> 22L, 20L -> 23L,
    30L -> 31L))

  test("reliable mode without a checkpoint dir fails fast") {
    // Runs BEFORE any withReliable test (ScalaTest executes a suite's
    // tests in declaration order): setCheckpointDir is sticky on the
    // shared context, so the unset-dir error path only exists while the
    // context is pristine. Assert that precondition LOUDLY — if some
    // future suite sets a checkpoint dir first, this test must fail
    // (demanding a reorder or a dedicated-JVM split), not silently
    // become a no-op that loses the require() coverage.
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "precondition lost: another test already called setCheckpointDir " +
        "on the shared context — the unset-dir fail-fast path is no " +
        "longer reachable in this JVM; reorder the suites or isolate " +
        "this test")
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try intercept[IllegalArgumentException] {
      Checkpoints.truncate(edges)
    } finally spark.conf.unset(Checkpoints.ReliableKey)
  }

  test("connected components: reliable checkpointing is bit-identical") {
    def run() = DedupQueries
      .connectedComponents(edges, "doc_a", "doc_b", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val local = run()
    val reliable = withReliable(run())
    assert(reliable === local)
    assert(local.nonEmpty)
  }

  test("pagerank / triangles / global index under reliable checkpointing") {
    // 21-22 closes a triangle at node 20
    val tri = pairs(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L,
      20L -> 21L, 20L -> 22L, 20L -> 23L, 21L -> 22L))
    def all() = (
      AnalyticQueries.pageRankOf(edges, "doc_a", "doc_b", 3)
        .orderBy("node").collect().toSeq,
      AnalyticQueries.trianglesOf(tri, "doc_a", "doc_b")
        .orderBy("node").collect().toSeq,
      AnalyticQueries.globalIndexOf(
        edges.select(col("doc_a").as("k"), col("doc_b").as("v")),
        Seq("k", "v")).orderBy("idx").collect().toSeq)
    val (pr1, tr1, gi1) = all()
    val (pr2, tr2, gi2) = withReliable(all())
    assert(pr2 === pr1); assert(tr2 === tr1); assert(gi2 === gi1)
    assert(tr1.nonEmpty, "the 21-22 edge must close a triangle at 20")
  }

  test("BPE training under reliable checkpointing learns the same merges") {
    import spark.implicits._
    val docs = Seq("low lower lowest", "new newer newest", "low low new")
      .toDF("body")
    val local = Bpe.train(docs, "body", 6)
    val reliable = withReliable(Bpe.train(docs, "body", 6))
    assert(reliable === local)
    assert(local.size === 6)
  }
}
