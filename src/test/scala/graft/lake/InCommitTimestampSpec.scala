package graft.lake

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** In-commit timestamps (Delta's `inCommitTimestamp` feature): every
  * commit's wall-clock instant is the FIRST line of its own delta, so
  * the history clock survives operations that destroy file mtimes —
  * a directory copy, an rsync restore, an object-store migration. */
class InCommitTimestampSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  test("commit stamps are strictly increasing, even for rapid commits") {
    val t = MergeTable(spark, tmpDir("ict").toString, None)
    t.overwrite(orders(("o1", "2024-01-01", 1.0)))
    (2 to 6).foreach(i =>
      t.append(orders((s"o$i", "2024-01-01", i.toDouble))))
    val stamps = t.history().orderBy("version")
      .select("committed_at").as[java.sql.Timestamp]
      .collect().map(_.getTime).toSeq
    assert(stamps.size === 6)
    assert(stamps === stamps.sorted)
    assert(stamps.distinct.size === stamps.size,
      s"stamps must be strictly monotone: $stamps")
  }

  test("timestamp travel survives mtime destruction (table copy shape)") {
    val root = tmpDir("ict").toString
    val t = MergeTable(spark, root, None)
    t.overwrite(orders(("o1", "2024-01-01", 1.0)))
    Thread.sleep(5)
    t.append(orders(("o2", "2024-01-02", 2.0)))
    Thread.sleep(5)
    t.append(orders(("o3", "2024-01-03", 3.0)))
    val betweenV2andV3 = java.time.Instant.ofEpochMilli(
      t.history().orderBy("version").select("committed_at")
        .as[java.sql.Timestamp].collect()(1).getTime)
    // simulate a copied/rsynced table: every log mtime scrambled
    Using_resource(Files.list(Paths.get(root, "_graft_log"))) { s =>
      s.iterator().asScala.zipWithIndex.foreach { case (p, i) =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(1000L * (99 - i)))
      }
    }
    assert(t.versionAsOf(betweenV2andV3) === 2L)
    assert(t.readAsOf(betweenV2andV3).count() === 2L)
    // vacuum retention keyed on the same clock: a huge window keeps all
    t.vacuum(365L * 24 * 3600 * 1000)
    assert(t.readVersion(1L).count() === 1L)
  }

  private def Using_resource[A <: AutoCloseable, B](r: A)(f: A => B): B =
    try f(r) finally r.close()

  test("pre-feature commits (no stamp line) fall back to the mtime clock") {
    val root = tmpDir("ict").toString
    val t = MergeTable(spark, root, None)
    t.overwrite(orders(("o1", "2024-01-01", 1.0)))
    t.append(orders(("o2", "2024-01-02", 2.0)))
    // strip the S lines, as if the log predated the feature
    val logDir = Paths.get(root, "_graft_log")
    Using_resource(Files.list(logDir)) { s =>
      s.iterator().asScala.filter(_.toString.endsWith(".txt")).foreach { p =>
        val kept = Files.readAllLines(p).asScala
          .filterNot(_.startsWith("S\t"))
        Files.write(p, kept.asJava)
        Files.setLastModifiedTime(p, FileTime.fromMillis(
          1700000000000L + p.getFileName.toString
            .stripSuffix(".txt").toLong * 1000L))
      }
    }
    // mtime clock: v1 at +1s, v2 at +2s
    assert(t.versionAsOf(java.time.Instant.ofEpochMilli(
      1700000000000L + 1500L)) === 1L)
    assert(t.read().count() === 2L) // snapshot fold unaffected
  }
}
