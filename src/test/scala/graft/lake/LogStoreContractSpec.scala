package graft.lake

import java.nio.file.{Files, Path}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Conformance suite for EVERY [[LogStore]] implementation — the commit
  * protocol's correctness is exactly as strong as these properties, so a
  * new deployment store (S3 conditional PUT, real HDFS rename) must pass
  * this suite before backing a table:
  *
  *   1. exactly-one-winner: N uncoordinated writers racing one name →
  *      precisely one `true`;
  *   2. winner-content: the surviving file holds the winner's body,
  *      byte-for-byte;
  *   3. no-partial-reads: a reader polling during the race only ever
  *      observes a COMPLETE candidate body, never a prefix;
  *   4. loser-cleanup: after the race the directory holds only the
  *      published name (no temp debris a log lister could trip on);
  *   5. monotone versions: writers running the optimistic claim loop
  *      produce a dense version sequence with one body per version.
  *
  * Both shipped impls run the same cases: [[LogStore.Posix]] (hard-link)
  * and [[LogStore.Rename]] (temp write + atomic rename-no-overwrite, the
  * HDFS/ABFS/GCS deployment shape with the local namespace-lock mock).
  */
class LogStoreContractSpec extends SparkSpec {

  private val impls: Seq[(String, LogStore)] =
    Seq("posix" -> LogStore.Posix, "rename" -> LogStore.Rename,
      "memory" -> LogStore.Memory)

  private def visible(dir: Path): Seq[String] =
    scala.util.Using.resource(Files.list(dir))(
      _.iterator().asScala.map(_.getFileName.toString).toList)

  for ((name, store) <- impls) {

    test(s"[$name] publish lands; second put loses and cannot clobber") {
      val dir = tmpDir(s"ls-$name")
      val target = dir.resolve("00000000000000000001.txt")
      assert(store.putIfAbsent(target, "first") === true)
      assert(Files.readString(target) === "first")
      assert(store.putIfAbsent(target, "second") === false,
        "an existing name must report the collision")
      assert(Files.readString(target) === "first",
        "the loser must not clobber the winner's body")
      assert(visible(dir) === Seq("00000000000000000001.txt"),
        "loser temp files must be cleaned up")
    }

    test(s"[$name] 16 threads × one name: exactly one winner, winner's " +
        "body survives, no debris") {
      val dir = tmpDir(s"ls-$name")
      val target = dir.resolve("00000000000000000001.txt")
      val n = 16
      val pool = Executors.newFixedThreadPool(n)
      try {
        val start = new CountDownLatch(1)
        val winners = new AtomicInteger(0)
        val winnerBody = new java.util.concurrent.atomic.AtomicReference[String]
        val futures = (0 until n).map { i =>
          pool.submit(new Runnable {
            def run(): Unit = {
              start.await()
              if (store.putIfAbsent(target, s"body-$i")) {
                winners.incrementAndGet()
                winnerBody.set(s"body-$i")
              }
            }
          })
        }
        start.countDown()
        futures.foreach(_.get(60, TimeUnit.SECONDS))
        assert(winners.get() === 1, "exactly one writer may win a name")
        assert(Files.readString(target) === winnerBody.get(),
          "the surviving body must be the winner's")
        assert(visible(dir) === Seq("00000000000000000001.txt"),
          "every loser's temp file must be gone after the race")
      } finally pool.shutdownNow()
    }

    test(s"[$name] a reader polling during the race never observes a " +
        "partial body") {
      // Bodies are large enough (~1 MiB) that a non-atomic publish
      // (direct streaming write) would expose a prefix to the reader
      // with overwhelming probability across 20 race rounds.
      val dir = tmpDir(s"ls-$name")
      val n = 8
      val body = (0 until n).map(i => i -> (s"B$i-" * 200000)).toMap
      val pool = Executors.newFixedThreadPool(n + 1)
      try {
        for (round <- 1 to 20) {
          val target = dir.resolve(f"$round%020d.txt")
          val start = new CountDownLatch(1)
          @volatile var torn: Option[Int] = None
          val reader = pool.submit(new Runnable {
            def run(): Unit = {
              start.await()
              var seen = false
              val deadline = System.nanoTime() + 5_000_000_000L
              while (!seen && System.nanoTime() < deadline) {
                if (Files.exists(target)) {
                  // an atomic publish means exists ⇒ complete
                  val s = try Some(Files.readString(target))
                  catch { case _: java.io.IOException => None }
                  s.foreach { c =>
                    seen = true
                    if (!body.values.exists(_ == c)) torn = Some(c.length)
                  }
                }
              }
            }
          })
          val writers = (0 until n).map { i =>
            pool.submit(new Runnable {
              def run(): Unit = { start.await(); store.putIfAbsent(target, body(i)); () }
            })
          }
          start.countDown()
          (writers :+ reader).foreach(_.get(60, TimeUnit.SECONDS))
          assert(torn.isEmpty,
            s"round $round: reader observed a partial body of " +
              s"${torn.getOrElse(-1)} chars")
        }
      } finally pool.shutdownNow()
    }

    test(s"[$name] optimistic claim loop from 8 threads: dense versions, " +
        "one body each") {
      // Each writer lands 5 commits by the protocol MergeTable runs:
      // resolve the next free version, try to claim it, on loss re-resolve.
      val dir = tmpDir(s"ls-$name")
      val n = 8
      val perWriter = 5
      def latest(): Long = visible(dir).filter(_.endsWith(".txt"))
        .map(_.stripSuffix(".txt").toLong).foldLeft(0L)(math.max)
      val pool = Executors.newFixedThreadPool(n)
      try {
        val start = new CountDownLatch(1)
        val futures = (0 until n).map { i =>
          pool.submit(new Runnable {
            def run(): Unit = {
              start.await()
              var landed = 0
              while (landed < perWriter) {
                val v = latest() + 1
                if (store.putIfAbsent(dir.resolve(f"$v%020d.txt"),
                    s"writer-$i commit-$landed")) landed += 1
              }
            }
          })
        }
        start.countDown()
        futures.foreach(_.get(120, TimeUnit.SECONDS))
        val names = visible(dir).sorted
        assert(names === (1 to n * perWriter).map(v => f"$v%020d.txt"),
          "the version sequence must be dense — no gaps, no extras")
        val bodies = names.map(f => Files.readString(dir.resolve(f)))
        assert(bodies.distinct.size === bodies.size,
          "no delta may be published twice (lost-update guard)")
      } finally pool.shutdownNow()
    }
  }

  test("rename: an unexpected primitive failure propagates AND leaves " +
      "no temp debris (cleanup is a finally, not an if-lost)") {
    val dir = tmpDir("ls-err")
    val boom = new LogStore.RenameNoOverwrite((_, _) =>
      throw new java.io.IOException("disk full"))
    val e = intercept[java.io.IOException] {
      boom.putIfAbsent(dir.resolve("00000000000000000001.txt"), "x")
    }
    assert(e.getMessage === "disk full")
    assert(visible(dir) === Nil,
      "a failed publish must not leak .tmp-* files into the log dir")
  }

  test("cross-impl: a rename put against a posix-published name loses " +
      "(and vice versa)") {
    val dir = tmpDir("ls-cross")
    val a = dir.resolve("00000000000000000001.txt")
    assert(LogStore.Posix.putIfAbsent(a, "posix") === true)
    assert(LogStore.Rename.putIfAbsent(a, "rename") === false)
    assert(Files.readString(a) === "posix")
    val b = dir.resolve("00000000000000000002.txt")
    assert(LogStore.Rename.putIfAbsent(b, "rename") === true)
    assert(LogStore.Posix.putIfAbsent(b, "posix") === false)
    assert(Files.readString(b) === "rename")
  }

  test("conf swap: spark.graft.logStore=rename drives MergeTable's race " +
      "cases through the rename store") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import spark.implicits._
    spark.conf.set("spark.graft.logStore", "rename")
    try {
      val root = tmpDir("mt-rename").toString
      val t = MergeTable(spark, root, Some("date"))
      assert(t.logStore eq LogStore.Rename,
        "the conf must select the rename store at open time")
      t.overwrite(Seq(("o1", "d", 1.0)).toDF("order_id", "date", "amount"))
      // two uncoordinated writers race for the next version — the loser
      // recomputes against the winner's snapshot, so both rows survive
      val f1 = Future(t.merge(
        Seq(("o2", "d", 2.0)).toDF("order_id", "date", "amount"), "order_id"))
      val f2 = Future(t.merge(
        Seq(("o3", "d", 3.0)).toDF("order_id", "date", "amount"), "order_id"))
      Await.result(f1, 120.seconds)
      Await.result(f2, 120.seconds)
      val rows = t.read().select("order_id", "amount")
        .as[(String, Double)].collect().toSet
      assert(rows === Set(("o1", 1.0), ("o2", 2.0), ("o3", 3.0)))
      assert(t.latestVersion() === 3L, "exactly two post-overwrite commits")
    } finally spark.conf.unset("spark.graft.logStore")
  }

  test("memory: read() serves the store's own view — a sidecar published " +
      "through the seam verifies even when the filesystem copy is gone") {
    val dir = tmpDir("ls-mem-read")
    val target = dir.resolve("00000000000000000001.crc")
    assert(LogStore.Memory.putIfAbsent(target, "K\t1\tx\ty\t0") === true)
    // simulate a store that materializes lazily (or an object lost from
    // the local cache): the SEAM read must still serve the content —
    // this is the r14 ADVICE asymmetry (publish via the store, verify
    // via Files.*) turned into a pinned contract
    Files.delete(target)
    assert(LogStore.Memory.read(target) === Some("K\t1\tx\ty\t0"))
    assert(LogStore.Posix.read(target) === None,
      "the default (filesystem) read sees the deletion — only the " +
        "owning store's view survives")
  }

  test("memory: 409-after-partial-write — a losing conditional PUT " +
      "discards its fully-streamed body atomically (no replace, no torn " +
      "object)") {
    val dir = tmpDir("ls-mem-409")
    val target = dir.resolve("00000000000000000001.txt")
    // first writer commits; the second writer's upload COMPLETES (the
    // method runs to its commit point) but the condition evaluates
    // false — S3's 409 — and neither the target nor the store's view
    // may carry any trace of the loser's bytes
    assert(LogStore.Memory.putIfAbsent(target, "winner") === true)
    assert(LogStore.Memory.putIfAbsent(target, "loser-bytes") === false)
    assert(Files.readString(target) === "winner")
    assert(LogStore.Memory.read(target) === Some("winner"))
  }

  test("memory: service restart — the materialized object still owns its " +
      "name (no lost update against pre-restart history)") {
    val dir = tmpDir("ls-mem-restart")
    val target = dir.resolve("00000000000000000001.txt")
    assert(LogStore.Memory.putIfAbsent(target, "pre-restart") === true)
    LogStore.Memory.reset() // the in-memory map dies with the process
    assert(LogStore.Memory.putIfAbsent(target, "usurper") === false,
      "a name published before the restart must still refuse new claims")
    assert(Files.readString(target) === "pre-restart")
    assert(LogStore.Memory.read(target) === Some("pre-restart"),
      "after a restart the read falls back to the materialized object")
  }

  test("conf swap: spark.graft.logStore=memory drives a full MergeTable " +
      "lifecycle (commits, checksum verification) through the fake") {
    import spark.implicits._
    spark.conf.set("spark.graft.logStore", "memory")
    try {
      val root = tmpDir("mt-memory").toString
      val t = MergeTable(spark, root, Some("date"), Some("amount"))
        .withChecksumVerification
      assert(t.logStore eq LogStore.Memory)
      t.overwrite(Seq(("o1", "d", 5L)).toDF("order_id", "date", "amount"))
      t.merge(Seq(("o2", "d", 7L)).toDF("order_id", "date", "amount"),
        "order_id")
      assert(t.read().count() === 2L)
      assert(t.verifyChecksum(), "sidecars published through the memory " +
        "store must verify through the same seam")
    } finally spark.conf.unset("spark.graft.logStore")
  }

  test("conf swap: an unknown store name fails loudly at open time") {
    spark.conf.set("spark.graft.logStore", "s3-lww")
    try {
      val e = intercept[IllegalArgumentException] {
        MergeTable(spark, tmpDir("mt-bad").toString, Some("date"))
      }
      assert(e.getMessage.contains("s3-lww"))
    } finally spark.conf.unset("spark.graft.logStore")
  }
}
