package graft.lake

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Delta's protocol action re-expressed for the graft log (r13 verdict
  * #3): a table stamped with a required feature an engine build does
  * not implement must refuse — loudly, at the metadata fold — instead
  * of silently mis-reading feature-bearing state. Reader features gate
  * reads AND writes; writer-only features still allow reads. */
class ProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (String, String, Double)*): DataFrame =
    rows.toDF("order_id", "date", "amount")

  test("baseline tables carry the implicit empty protocol; upgrading " +
      "to features this build supports changes nothing observable") {
    val t = MergeTable(spark, tmpDir("proto").toString, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0)))
    assert(t.protocol === (Set.empty[String], Set.empty[String]))
    t.upgradeProtocol(readerFeatures = Set("deletionVectors"),
      writerFeatures = Set("checkConstraints"))
    assert(t.protocol === (Set("deletionVectors"),
      Set("deletionVectors", "checkConstraints")))
    // reads and writes proceed — the features are supported
    t.append(orders(("o2", "d2", 2.0)))
    assert(t.read().count() === 2L)
    // idempotent: re-stamping the same features commits nothing
    val v = t.latestVersion()
    assert(t.upgradeProtocol(Set("deletionVectors")) === v)
  }

  test("a synthetically-bumped READER feature refuses old-path reads " +
      "and writes with a clear error; pre-upgrade versions stay readable") {
    val root = tmpDir("proto").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0)))       // v1
    t.append(orders(("o2", "d2", 2.0)))          // v2
    t.upgradeProtocol(readerFeatures = Set("futureMagic"))  // v3
    // a FRESH handle (a build that lacks the feature) refuses to read
    val fresh = MergeTable(spark, root, Some("date"))
    val e = intercept[IllegalStateException](fresh.read().collect())
    assert(e.getMessage.contains("futureMagic") &&
      e.getMessage.contains("reader feature"),
      s"gate error must name the missing feature: ${e.getMessage}")
    // ... and to write
    intercept[IllegalStateException](
      fresh.append(orders(("o3", "d3", 3.0))))
    // time travel BELOW the upgrade still reconstructs — those
    // versions carry no feature-bearing actions
    assert(fresh.readVersion(2L).count() === 2L)
  }

  test("a WRITER-only future feature still allows reads but refuses " +
      "to publish") {
    val root = tmpDir("proto").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0)))
    t.upgradeProtocol(writerFeatures = Set("futureWriteMagic"))
    val fresh = MergeTable(spark, root, Some("date"))
    assert(fresh.read().count() === 1L, "reads must keep working")
    assert(fresh.protocol._2.contains("futureWriteMagic"))
    val e = intercept[IllegalStateException](
      fresh.append(orders(("o2", "d2", 2.0))))
    assert(e.getMessage.contains("futureWriteMagic") &&
      e.getMessage.contains("writer feature"),
      s"gate error must name the missing feature: ${e.getMessage}")
    assert(fresh.read().count() === 1L, "the refused write published nothing")
  }

  test("protocol state survives checkpoints and vacuum — a reader " +
      "anchored on the checkpoint alone still sees the requirement") {
    val root = tmpDir("proto").toString
    val t = MergeTable(spark, root, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0)))
    t.upgradeProtocol(readerFeatures = Set("deletionVectors"),
      writerFeatures = Set("checkConstraints"))
    // drive past a checkpoint boundary, then vacuum the deltas away —
    // the surviving snapshot reconstructs from the checkpoint ALONE
    (1 to 12).foreach(i => t.append(orders((s"x$i", "d1", i.toDouble))))
    t.vacuum(0L)
    val fresh = MergeTable(spark, root, Some("date"))
    assert(fresh.read().count() === 13L)
    assert(fresh.protocol === (Set("deletionVectors"),
      Set("deletionVectors", "checkConstraints")),
      "the P action must ride the checkpoint, or vacuum would drop it")
  }

  test("AUTOMATIC enablement: the commit that first uses a gated " +
      "feature stamps the protocol in the same atomic publish") {
    // plain table: no features, no protocol
    val plain = MergeTable(spark, tmpDir("proto").toString, Some("date"))
    plain.overwrite(orders(("o1", "d1", 1.0)))
    plain.append(orders(("o2", "d2", 2.0)))
    assert(plain.protocol === (Set.empty[String], Set.empty[String]),
      "feature-free commits must not stamp anything")

    // DV-CONFIGURED handle: stamped on the FIRST commit (before any
    // vector lands), so later vector attaches stay protocol-free
    val dv = MergeTable(spark, tmpDir("proto").toString, Some("date"),
      Nil, deletionVectors = true)
    dv.overwrite(orders(("o1", "d1", 1.0)))
    assert(dv.protocol._1 === Set("deletionVectors"))

    // metadata commits stamp their own family, in the same commit
    val t = MergeTable(spark, tmpDir("proto").toString, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0)))
    t.addConstraint("amount_pos", "amount > 0")
    assert(t.protocol._2.contains("checkConstraints") &&
      !t.protocol._1.contains("checkConstraints"),
      "constraints are writer-only: readers may ignore them")
    t.renameColumn("order_id", "oid")
    assert(t.protocol._1.contains("columnMapping"))
    val t2 = MergeTable(spark, tmpDir("proto").toString, None)
    t2.addIdentityColumn("id")
    t2.declareSchema(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))))
    assert(t2.protocol._2.contains("identityColumns"))
    assert(t2.protocol._1.contains("declaredSchema"))
  }

  test("a CLONE carries the source's protocol — a clone of a feature-" +
      "bearing table is never feature-bearing-undeclared") {
    val src = MergeTable(spark, tmpDir("proto").toString, Some("date"),
      Nil, deletionVectors = true)
    src.overwrite(orders(("o1", "d1", 1.0), ("o2", "d1", 2.0)))
    src.delete(org.apache.spark.sql.functions.col("order_id") === "o2")
    src.upgradeProtocol(writerFeatures = Set("checkConstraints"))
    val clone = src.cloneTo(tmpDir("proto_clone").resolve("t").toString)
    assert(clone.protocol._1.contains("deletionVectors"),
      "the clone's v1 rides dv refs — its protocol must say so")
    assert(clone.protocol._2.contains("checkConstraints"),
      "explicitly-stamped source features must travel too")
    assert(clone.read().count() === 1L)
  }

  test("upgrades are monotone unions and malformed names are rejected") {
    val t = MergeTable(spark, tmpDir("proto").toString, Some("date"))
    t.overwrite(orders(("o1", "d1", 1.0)))
    t.upgradeProtocol(readerFeatures = Set("deletionVectors"))
    t.upgradeProtocol(readerFeatures = Set("columnMapping"))
    assert(t.protocol._1 === Set("deletionVectors", "columnMapping"))
    assert(t.protocol._2 === Set("deletionVectors", "columnMapping"),
      "reader features are implicitly writer features")
    intercept[IllegalArgumentException](
      t.upgradeProtocol(readerFeatures = Set("bad name")))
    intercept[IllegalArgumentException](
      t.upgradeProtocol(writerFeatures = Set("")))
  }
}
