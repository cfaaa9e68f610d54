package graft.tools

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

import graft.etl.Ingestion
import graft.ingest.Sources
import graft.lake.MergeTable
import graft.pipeline.Pipeline
import graft.pipeline.Pipeline.{Done, Stage}

/** End-to-end demo of the ETL surface: builds a dirty raw zone, runs the
  * three ingestion jobs through the pipeline runner (markers, retry,
  * archive), and prints the resulting lake tables. Run it twice against the
  * same workDir to see the idempotency gate skip everything.
  *
  * Usage: runMain graft.tools.EtlDemo [workDir]
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val work: Path = args.headOption.map(java.nio.file.Paths.get(_))
      .getOrElse(Files.createTempDirectory("graft-etl-demo"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-etl-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    seedRawZone(work)
    val detected = Sources.detectRawFiles(work)
    println(s"[demo] detected raw files: $detected")

    def job(name: String)(body: => Ingestion.JobResult): Stage =
      Stage(name, markerKey = Some(name + ".csv"), run = () => {
        val r = body
        println(s"[demo] $name: version=${r.tableVersion} " +
          s"valid=${r.validRows} rejected=${r.rejectedRows}")
        Done
      })

    val t = s"$work/tables"
    val q = s"$work/quarantine"
    val reports = Pipeline.run(
      Seq(
        job("products")(Ingestion.productsJob(spark, s"$work/raw/products",
          s"$t/products", s"$q/products")),
        job("orders")(Ingestion.ordersJob(spark, s"$work/raw/orders",
          s"$t/orders", s"$q/orders")),
        job("order_items")(Ingestion.orderItemsJob(spark,
          s"$work/raw/order_items", s"$t/orders", s"$t/products",
          s"$t/order_items", s"$q/order_items")),
        Stage("archive", Some("archive"), run = () => {
          Sources.detectRawFiles(work).foreach { case (_, f) =>
            Pipeline.archive(java.nio.file.Paths.get(f),
              work.resolve("archived"))
          }
          Done
        }),
      ),
      markerDir = work.resolve("processed/_processed_log"),
      onFailure = (st, e) => println(s"[demo] FAILURE in $st: $e"))

    reports.foreach(r => println(s"[demo] stage=${r.name} " +
      s"status=${r.status} attempts=${r.attempts}"))

    for (name <- Seq("products", "orders", "order_items")) {
      val tbl = MergeTable(spark, s"$t/$name", partitionColOf(name))
      if (tbl.latestVersion() > 0) {
        println(s"[demo] table $name v${tbl.latestVersion()}:")
        tbl.read().orderBy(tbl.read().columns.head).show(20, truncate = false)
      } else println(s"[demo] table $name: not created (skipped run?)")
    }
    spark.stop()
  }

  private def partitionColOf(name: String): Option[String] = name match {
    case "products" => Some("department")
    case _ => Some("date")
  }

  private def seedRawZone(dir: Path): Unit = {
    def write(rel: String, lines: String*): Unit = {
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      if (!Files.exists(p)) Files.writeString(p, lines.mkString("\n") + "\n")
    }
    write("raw/products/products.csv",
      "product_id,department_id,department,product_name",
      "p1,1,produce,apple", "p2,2,dairy,milk", "p2,2,dairy,milk-dup",
      "p3,,dairy,cheese", ",4,misc,ghost")
    write("raw/orders/orders.csv",
      "order_num,order_id,user_id,order_timestamp,total_amount",
      "1,o1,u1,2024-01-01 10:00:00,50.0", "2,o2,u1,2024-01-02 11:00:00,75.5",
      "3,o3,u2,2024-01-02 12:00:00,-5.0", "4,,u3,2024-01-03 09:00:00,10.0")
    write("raw/order_items/items.csv",
      "id,order_id,user_id,days_since_prior_order,product_id," +
        "add_to_cart_order,reordered,order_timestamp",
      "i1,o1,u1,,p1,1,false,2024-01-01 10:00:00",
      "i2,o1,u1,3,p2,2,true,2024-01-01 10:00:00",
      "i3,oX,u1,3,p1,1,false,2024-01-01 10:00:00",
      "i4,o2,u1,3,pX,1,false,2024-01-02 11:00:00",
      "i5,o2,u1,,p1,,,")
  }
}
