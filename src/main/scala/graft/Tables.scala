package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * only through these helpers, so filter pushdown / column pruning reach the
  * parquet scan (the driver's DuckDB oracle reads the same files).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Raise base-scan parallelism to the session default when the file
    * layout under-splits (optimization guide §2.5, input skew: a single
    * small file — or a single parquet row group — plans ONE scan task,
    * serializing every per-row computation above it; measured: the whole
    * doc/text/embed family ran its tokenize/shingle/norm stage on one
    * core, r16). The repartition is KEYED, so the row→partition mapping
    * is deterministic under task retries (SPARK-38388), and fires only
    * when the scan plans fewer partitions than the session's
    * parallelism — at production scale these tables span many
    * files/row-groups and this is a no-op. */
  private[graft] def fanned(df: DataFrame, key: String): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (want <= 1 || df.rdd.getNumPartitions >= want) df
    else df.repartition(want, org.apache.spark.sql.functions.col(key))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Schema-adaptive events loader. Fixture generations have stored `ts`
    * either as parquet TIMESTAMP(MICROS) (read natively as TimestampType)
    * or TIMESTAMP(NANOS) (which Spark's vectorized reader rejects; with
    * `nanosAsLong` it surfaces as epoch-nanos LongType). Normalize both to
    * a TimestampType(µs) column so every downstream query sees one shape.
    * For the nanos case the division MUST stay integral (`div`): `/`
    * promotes to double, and epoch-nanos (~1.7e18) exceed double's 2^53
    * exact range, shifting ~1.6% of values by ±1µs vs the oracle's exact
    * truncation. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) surfaces as
        // TIMESTAMP_NTZ; downstream ops (unix_micros, window) expect the
        // session-zoned TimestampType. The session runs UTC, so the cast
        // is value-preserving and matches the oracle's naive timestamps.
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    fanned(table(s, d, "documents"), "doc_id")
  // embeddings deliberately NOT fanned: measured r16, the embed
  // family's per-pass compute at this SF is smaller than the added
  // exchange/task overhead, and lifecycle writes (VectorIndex scratch
  // tables) would inherit the fan as 32-file commits — a paired A/B
  // showed q_embed_ivfpq 0.83× and q_embed_ivf_refresh 0.55×.
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
