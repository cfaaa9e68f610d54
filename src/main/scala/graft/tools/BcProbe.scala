package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: does a written frame's schema equal the footer-inferred
  * read-back schema (the dirSchema memo seeding precondition)? */
object BcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(0, 10).toDF("k")
      .withColumn("s", concat(lit("x"), col("k")))
      .withColumn("ts", current_timestamp())
      .withColumn("tntz", expr("localtimestamp()"))
      .withColumn("arr", array(col("k").cast("float")))
      .withColumn("d", col("k").cast("double") + 0.5)
      .withColumn("nul", lit(null).cast("string"))
    val dir = java.nio.file.Files.createTempDirectory("schemaprobe")
      .resolve("c").toString
    df.write.parquet(dir)
    val back = spark.read.parquet(dir).schema
    println("WRITTEN  " + df.schema.map(f => (f.name, f.dataType, f.nullable)))
    println("READBACK " + back.map(f => (f.name, f.dataType, f.nullable)))
    println("EQ_ASNULLABLE=" + (org.apache.spark.sql.types.StructType(df.schema.map(_.copy(nullable = true))) == back))
    println("EQ_EXACT=" + (df.schema == back))
    spark.stop()
  }
}
