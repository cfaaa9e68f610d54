// lake subpackage: profiles package-private read internals
package graft.lake.tools

import java.nio.file.{Files, StandardCopyOption}

import graft.lake.MergeTable

import org.apache.spark.sql.SparkSession

/** Dev probe: where does cold `read()` construction time go at many
  * live files? Times each layer separately on a flat N-file table:
  * raw `spark.read.parquet(paths)` (DataFrame construction only), the
  * same with an explicit schema, `.inputFiles` (forces listing), and
  * the full MergeTable read. Usage: runMain ... [nFiles] */
object OpenProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = Files.createTempDirectory("graft_openprof")
    val seedDir = work.resolve("seed")
    Seq((1L, 1L)).toDF("id", "n").coalesce(1)
      .write.parquet(seedDir.toString)
    val seed = scala.util.Using.resource(Files.list(seedDir)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
    }
    val root = work.resolve("t")
    Files.createDirectories(root)
    val paths = (0 until n).map { i =>
      val p = root.resolve(f"f$i%07d.parquet")
      Files.copy(seed, p, StandardCopyOption.COPY_ATTRIBUTES)
      p.toString
    }

    def timeS(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val schema = spark.read.parquet(paths.head).schema
    timeS("raw_read_infer")(spark.read.parquet(paths: _*))
    timeS("raw_read_infer_2nd")(spark.read.parquet(paths: _*))
    timeS("raw_read_schema")(
      spark.read.schema(schema).parquet(paths: _*))
    timeS("raw_read_schema_2nd")(
      spark.read.schema(schema).parquet(paths: _*))
    timeS("raw_basePath_read")(spark.read
      .option("basePath", root.toString).parquet(paths: _*))
    timeS("raw_count")(
      spark.read.schema(schema).parquet(paths: _*).count())
    val t = MergeTable(spark, root.toString, None, Seq("n"))
    t.convertInPlace()
    timeS("merge_read_cold")(
      MergeTable(spark, root.toString, None, Seq("n")).read())
    timeS("merge_read_2nd") {
      val h = MergeTable(spark, root.toString, None, Seq("n"))
      h.read(); h.read()
    }
    timeS("merge_count")(
      MergeTable(spark, root.toString, None, Seq("n")).read().count())
    // DECLARED schema routes the read through the manifest-backed
    // FileIndex (zero listing) — the 100 TB posture
    t.declareSchema(schema)
    timeS("declared_read_cold")(
      MergeTable(spark, root.toString, None, Seq("n")).read())
    timeS("declared_read_2nd") {
      val h = MergeTable(spark, root.toString, None, Seq("n"))
      h.read(); h.read()
    }
    timeS("declared_count")(
      MergeTable(spark, root.toString, None, Seq("n")).read().count())
    spark.stop()
  }
}
