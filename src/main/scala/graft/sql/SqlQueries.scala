package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.lake.MergeTable

/** The SQL front-end under the oracle gate: [[lakeSql]] drives a full
  * lake DML lifecycle purely through SQL STRINGS — the statements a
  * reference consumer (Athena-side analyst, README.md:98) would type —
  * and reads the final state back through the `graft_table` TVF. The
  * hash matches the closed-form oracle only if the parser routed every
  * statement to the right MergeTable call with the right semantics:
  * a mis-parsed predicate, a MERGE source resolved wrong, or a
  * DELETE/UPDATE applied out of order each shifts prices or the
  * surviving key set. */
object SqlQueries {

  private def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** MERGE (update + re-keyed insert wave) → UPDATE (predicate +
    * SET with a function call) → DELETE → OPTIMIZE → SELECT via TVF,
    * all as SQL strings. Arithmetic stays binary-exact (+10.0, ×2 on
    * 2-decimal money values) so the oracle matches bit-for-bit. */
  def lakeSql(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val t = MergeTable(s, scratch("graft_q_lsql"), None)
    t.overwrite(base)
    GraftSql.register("q_lsql_t", t)
    // the MERGE wave: key%4=0 repriced +10, key%6=3 re-keyed inserts
    base.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .unionByName(base.filter(col("o_orderkey") % 6 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_totalprice", col("o_totalprice") + 7.0))
      .createOrReplaceTempView("q_lsql_src")
    s.sql("MERGE INTO q_lsql_t USING q_lsql_src ON o_orderkey")
    s.sql("UPDATE q_lsql_t SET o_totalprice = o_totalprice * 2 " +
      "WHERE o_custkey % 10 = 0")
    s.sql("DELETE FROM q_lsql_t WHERE o_orderkey % 9 = 0")
    s.sql("OPTIMIZE q_lsql_t")
    s.sql("SELECT o_orderkey, o_custkey, " +
      "round(o_totalprice, 2) AS price FROM graft_table('q_lsql_t') " +
      "ORDER BY o_orderkey")
  }

  val lakeSqlOracle: String =
    """WITH base AS (
         SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
       merged AS (
         SELECT o_orderkey, o_custkey,
                CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 10.0
                     ELSE o_totalprice END AS p
         FROM base
         UNION ALL
         SELECT o_orderkey + 100000000, o_custkey, o_totalprice + 7.0
         FROM base WHERE o_orderkey % 6 = 3),
       updated AS (
         SELECT o_orderkey, o_custkey,
                CASE WHEN o_custkey % 10 = 0 THEN p * 2 ELSE p END AS p
         FROM merged)
       SELECT o_orderkey, o_custkey, round(p, 2) AS price
       FROM updated WHERE o_orderkey % 9 <> 0
       ORDER BY o_orderkey"""
}
