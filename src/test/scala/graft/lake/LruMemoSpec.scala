package graft.lake

import graft.SparkSpec

/** The commit-dir schema memo's eviction discipline (r13 verdict #4):
  * crossing the size bound must evict ONLY the least-recently-used
  * entry — the hot working set survives an overflow with its hit-rate
  * intact, where the old clear-all re-paid every hot dir's footer
  * listing right after the flush. */
class LruMemoSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("overflow evicts only the LRU entry; hot keys keep hitting") {
    val m = new LruMemo[String, Int](4)
    var computes = 0
    def load(k: String): Int = m.get(k) { computes += 1; k.length }
    Seq("a", "bb", "ccc", "dddd").foreach(load)
    assert(m.size === 4 && computes === 4 && m.hits === 0L)
    load("a") // touch: "a" becomes most-recent, "bb" is now eldest
    assert(m.hits === 1L)
    load("eeeee") // overflow — evicts exactly one entry ("bb")
    assert(m.size === 4, "overflow must keep the map at cap, not clear it")
    load("a"); load("ccc"); load("dddd") // the survivors still HIT
    assert(m.hits === 4L && computes === 5,
      "hot entries must survive the overflow without recomputing")
    load("bb") // the one evicted key recomputes
    assert(computes === 6)
  }

  test("racing misses of one key converge on a single cached value") {
    val m = new LruMemo[Long, Long](8)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val fs = (1 to 64).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = m.get(7L)(i.toLong)
        })
      }
      // first write wins; every caller observes that single value
      val got = fs.map(_.get()).toSet
      assert(got.size === 1)
      assert(m.get(7L)(999L) === got.head)
      assert(m.size === 1)
    } finally pool.shutdown()
  }

  test("MergeTable's multi-dir read hits the memo on the second read") {
    val t = MergeTable(spark, tmpDir("lru").toString, Some("p"))
    t.overwrite(Seq(("a", "p1", 1.0)).toDF("k", "p", "v"))
    t.append(Seq(("b", "p2", 2.0)).toDF("k", "p", "v"))
    val h0 = MergeTable.dirSchemaMemo.hits
    t.read().count()
    t.read().count()
    assert(MergeTable.dirSchemaMemo.hits > h0,
      "repeat reads of immutable commit dirs must hit the schema memo")
  }
}
