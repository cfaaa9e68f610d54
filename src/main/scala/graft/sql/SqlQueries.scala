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
    * SET with a function call) → DELETE → INSERT INTO (positional
    * append, r11) → OPTIMIZE → SELECT via TVF, all as SQL strings.
    * Arithmetic stays binary-exact (+10.0, ×2 on 2-decimal money
    * values) so the oracle matches bit-for-bit. */
  def lakeSql(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val t = MergeTable(s, scratch("graft_q_lsql"), None)
    t.overwrite(base)
    GraftSql.register("q_lsql_t", t)
    base.createOrReplaceTempView("q_lsql_base")
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
    // blind append AFTER the delete: these rows see neither the ×2
    // update nor the %9 delete
    s.sql("INSERT INTO q_lsql_t " +
      "SELECT o_orderkey + 200000000, o_custkey, o_totalprice + 3.0 " +
      "FROM q_lsql_base WHERE o_orderkey % 13 = 1")
    s.sql("OPTIMIZE q_lsql_t")
    s.sql("SELECT o_orderkey, o_custkey, " +
      "round(o_totalprice, 2) AS price FROM graft_table('q_lsql_t') " +
      "ORDER BY o_orderkey")
  }

  /** The r11 clause-MERGE surface under the oracle gate: ONE SQL MERGE
    * with a COMPOSITE key `(o_custkey, o_orderkey)` (unique — the
    * fixture's lineitem carries duplicate line numbers, so orders is
    * the key-clean base) and two conditional WHEN MATCHED clauses — a
    * zero-price tombstone wave deletes, a repricing wave updates ONLY
    * when the source price beats the target's (`s.`/`t.` aliases both
    * exercised; the priced-DOWN half of the wave is kept untouched),
    * and a re-keyed wave inserts. The final state is read back through
    * a BARE-NAME `FROM q_mcond_t` (the [[GraftRelationResolution]]
    * rule), so the hash gates the clause semantics AND the name
    * resolution path at once. Arithmetic stays binary-exact (±10.0,
    * +7.0 on 2-decimal money). */
  def mergeCond(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val t = MergeTable(s, scratch("graft_q_mcond"), None)
    t.overwrite(base)
    GraftSql.register("q_mcond_t", t)
    base.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", lit(0.0))
      .unionByName(base.filter(col("o_orderkey") % 5 === 1)
        .withColumn("o_totalprice", col("o_totalprice") +
          when(col("o_orderkey") % 2 === 0, 10.0).otherwise(-10.0)))
      .unionByName(base.filter(col("o_orderkey") % 7 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_totalprice", col("o_totalprice") + 7.0))
      .createOrReplaceTempView("q_mcond_src")
    s.sql(
      "MERGE INTO q_mcond_t USING q_mcond_src ON (o_custkey, o_orderkey) " +
        "WHEN MATCHED AND s.o_totalprice = 0 THEN DELETE " +
        "WHEN MATCHED AND s.o_totalprice > t.o_totalprice THEN UPDATE " +
        // Delta's rule: with explicit clauses, inserts need their own
        // WHEN NOT MATCHED clause
        "WHEN NOT MATCHED THEN INSERT")
    s.sql(
      "SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price " +
        "FROM q_mcond_t ORDER BY o_custkey, o_orderkey")
  }

  /** X176/X177 under the oracle gate: the full SQL-only TABLE
    * LIFECYCLE — `CREATE GRAFT TABLE ... AS <query>` (CTAS declares
    * the schema in the log, partitioned, auto-compacting), a
    * metadata-only `ALTER TABLE ADD COLUMN`, an unconditional UPDATE
    * computing the new column, a sentinel INSERT (positional, post-ADD
    * arity), a partition-scoped `OPTIMIZE ... WHERE` (X172, content
    * must be byte-stable across the rewrite), and a bare-name
    * aggregate read-back. The hash matches only if the declared-schema
    * read path supplies NULL-then-updated values for the added column
    * on pre-evolution files AND the scoped rewrite/auto-compactions
    * changed nothing logically. */
  def sqlDdl(s: SparkSession, d: String): DataFrame = {
    val p = scratch("graft_q_ddl")
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .createOrReplaceTempView("q_ddl_src")
    s.sql(s"CREATE GRAFT TABLE q_ddl_t AT '$p' " +
      "PARTITIONED BY (o_orderstatus) WITH AUTO COMPACT (67108864, 2) " +
      "AS SELECT * FROM q_ddl_src")
    s.sql("ALTER TABLE q_ddl_t ADD COLUMN price_band STRING")
    s.sql("UPDATE q_ddl_t SET price_band = " +
      "CASE WHEN o_totalprice >= 150000.0 THEN 'high' ELSE 'low' END")
    // DECLARED schema order after ADD COLUMN: (o_orderkey,
    // o_totalprice, o_orderstatus, price_band) — the CTAS declared the
    // first three, ADD COLUMN appended the band, and reads/INSERTs
    // follow that order with the partition column at its declared slot
    s.sql("INSERT INTO q_ddl_t VALUES (-1, 0.0, 'F', 'none')")
    s.sql("OPTIMIZE q_ddl_t WHERE o_orderstatus = 'F'")
    s.sql("SELECT o_orderstatus, price_band, count(*) AS n, " +
      "CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total " +
      "FROM q_ddl_t GROUP BY o_orderstatus, price_band " +
      "ORDER BY o_orderstatus, price_band")
  }

  val sqlDdlOracle: String =
    """WITH base AS (
         SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
       banded AS (
         SELECT o_orderkey, o_totalprice, o_orderstatus,
                CASE WHEN o_totalprice >= 150000.0 THEN 'high'
                     ELSE 'low' END AS price_band
         FROM base),
       full_t AS (
         SELECT * FROM banded
         UNION ALL SELECT -1, 0.0, 'F', 'none')
       SELECT o_orderstatus, price_band, count(*) AS n,
              CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
       FROM full_t GROUP BY 1, 2 ORDER BY 1, 2"""

  val mergeCondOracle: String =
    """WITH base AS (
         SELECT o_custkey, o_orderkey, o_totalprice FROM orders),
       src AS (
         SELECT o_custkey, o_orderkey, 0.0 AS sp
         FROM base WHERE o_orderkey % 5 = 0
         UNION ALL
         SELECT o_custkey, o_orderkey,
                o_totalprice + CASE WHEN o_orderkey % 2 = 0
                                    THEN 10.0 ELSE -10.0 END
         FROM base WHERE o_orderkey % 5 = 1
         UNION ALL
         SELECT o_custkey, o_orderkey + 100000000, o_totalprice + 7.0
         FROM base WHERE o_orderkey % 7 = 3),
       kept AS (
         SELECT b.o_custkey, b.o_orderkey,
                CASE WHEN s.o_orderkey IS NOT NULL AND s.sp <> 0
                          AND s.sp > b.o_totalprice
                     THEN s.sp ELSE b.o_totalprice END AS p
         FROM base b
         LEFT JOIN src s USING (o_custkey, o_orderkey)
         WHERE s.o_orderkey IS NULL OR s.sp <> 0),
       ins AS (
         SELECT s.o_custkey, s.o_orderkey, s.sp AS p
         FROM src s
         LEFT JOIN base b USING (o_custkey, o_orderkey)
         WHERE b.o_orderkey IS NULL)
       SELECT o_custkey, o_orderkey, round(p, 2) AS price
       FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins) f
       ORDER BY o_custkey, o_orderkey"""

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
       SELECT o_orderkey, o_custkey, round(p, 2) AS price FROM (
         SELECT o_orderkey, o_custkey, p
         FROM updated WHERE o_orderkey % 9 <> 0
         UNION ALL
         SELECT o_orderkey + 200000000, o_custkey, o_totalprice + 3.0
         FROM base WHERE o_orderkey % 13 = 1) f
       ORDER BY o_orderkey"""
}
