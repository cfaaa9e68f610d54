package graft.sql

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.lake.MergeTable

/** SQL front-end for the lake DML surface (the reference's consumers
  * speak SQL — Athena over the Glue catalog, README.md:98 — while the
  * MergeTable lifecycle was Scala-only until round 10). A thin parser
  * injected via [[graft.functions.GraftExtensions]] (the X27
  * machinery) intercepts five statements against REGISTERED graft
  * tables and routes them to the existing MergeTable calls; every
  * other statement — including MERGE/UPDATE/DELETE on non-graft
  * tables — delegates untouched to Spark's parser:
  *
  *   MERGE INTO <name> USING <view|(subquery)> ON <pk>
  *     [WITH SCHEMA EVOLUTION]                  → [[MergeTable.merge]]
  *   UPDATE <name> SET c = e[, ...] [WHERE p]   → [[MergeTable.update]]
  *   DELETE FROM <name> [WHERE p]               → [[MergeTable.delete]]
  *   OPTIMIZE <name> [ZORDER BY (c[, ...])]     → compact / zorder
  *   RESTORE <name> TO VERSION AS OF <v>        → [[MergeTable.restore]]
  *   VACUUM <name>                              → [[MergeTable.vacuum]]
  *
  * Tables are REGISTERED handles, not paths: a MergeTable's layout
  * contract (partition column, stats/bloom sidecar columns, deletion
  * vectors) lives on the handle, so resolving a bare path here would
  * silently write an unpartitioned, stats-less commit into a
  * partitioned table. `GraftSql.register(spark, name, table)` binds
  * the fully-configured handle once; SQL drives it by name from then
  * on — the same shape as Delta registering a table in the metastore
  * with its table features.
  *
  * Each statement executes eagerly inside `spark.sql(...)` (command
  * semantics) and returns the committed version as a 1-row result.
  */
object GraftSql {

  /** name → configured handle; names are case-insensitive (SQL
    * convention). Registration is per-JVM — the registry is shared by
    * every session the JVM holds, like Spark's own builtin function
    * registry. */
  private val tables = TrieMap.empty[String, MergeTable]

  def register(name: String, table: MergeTable): Unit =
    tables.put(name.toLowerCase, table)

  def unregister(name: String): Unit = tables.remove(name.toLowerCase)

  def table(name: String): Option[MergeTable] = tables.get(name.toLowerCase)

  /** Snapshot of the registry — the [[graft.lake.GraftScanPruning]]
    * optimizer rule sweeps it to recognize which relations are lake
    * tables it may file-prune. */
  def registered: Seq[(String, MergeTable)] = tables.toSeq

  // ---- the statement grammar ----------------------------------------------

  private val MergeRe =
    """(?is)^\s*MERGE\s+INTO\s+([A-Za-z_][\w]*)\s+USING\s+(.+)\s+ON\s+([A-Za-z_][\w]*)\s*(WITH\s+SCHEMA\s+EVOLUTION)?\s*;?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+([A-Za-z_][\w]*)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+([A-Za-z_][\w]*)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+([A-Za-z_][\w]*)(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+([A-Za-z_][\w]*)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([A-Za-z_][\w]*)\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][\w]*)\s*;?\s*$""".r
  private val RegisterRe =
    """(?is)^\s*REGISTER\s+GRAFT\s+TABLE\s+([A-Za-z_][\w]*)\s+AT\s+'([^']+)'(.*?)\s*;?\s*$""".r
  private val UnregisterRe =
    """(?is)^\s*UNREGISTER\s+GRAFT\s+TABLE\s+([A-Za-z_][\w]*)\s*;?\s*$""".r
  private val PartByRe = """(?is)PARTITIONED\s+BY\s*\(([^)]*)\)""".r
  private val StatsRe = """(?is)STATS\s*\(([^)]*)\)""".r
  private val BloomRe = """(?is)BLOOM\s*\(([^)]*)\)""".r
  private val DvRe = """(?is)WITH\s+DELETION\s+VECTORS""".r

  /** Split `s` on commas at paren/quote depth zero — SET clauses carry
    * commas inside function calls (`SET a = round(x, 2), b = y`). */
  private[sql] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** One `name = expression` SET assignment: split on the FIRST
    * top-level '=' (the expression side may itself contain '='). */
  private def assignment(s: String): (String, String) = {
    val i = s.indexOf('=')
    require(i > 0, s"malformed SET assignment: '$s'")
    (s.take(i).trim, s.drop(i + 1).trim)
  }

  /** The MERGE source: `(subquery)` → run it; bare identifier → the
    * session's resolved table/view. */
  private def sourceDf(spark: SparkSession, src: String): DataFrame = {
    val t = src.trim
    if (t.startsWith("(") && t.endsWith(")"))
      spark.sql(t.drop(1).dropRight(1))
    else spark.table(t)
  }

  /** Parse `sqlText` as a graft DML statement against a registered
    * table. None = not ours (delegate to Spark); Some = an eager
    * command returning the committed version. A statement that LOOKS
    * like graft DML but names an unregistered table also delegates —
    * Spark's own MERGE/UPDATE/DELETE handle catalog tables. */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case MergeRe(name, src, pk, evolve) =>
      table(name).map { t =>
        GraftDmlCommand(s"MERGE INTO $name", s =>
          t.merge(sourceDf(s, src), pk, evolveSchema = evolve != null))
      }
    case UpdateRe(name, set, where) =>
      table(name).map { t =>
        val sets = splitTop(set).map(assignment)
          .map { case (c, e) => c -> expr(e) }.toMap
        GraftDmlCommand(s"UPDATE $name", _ =>
          t.update(Option(where).map(expr)
            .getOrElse(org.apache.spark.sql.functions.lit(true)), sets))
      }
    case DeleteRe(name, where) =>
      table(name).map { t =>
        GraftDmlCommand(s"DELETE FROM $name", _ =>
          t.delete(Option(where).map(expr)
            .getOrElse(org.apache.spark.sql.functions.lit(true))))
      }
    case OptimizeRe(name, zorderCols) =>
      table(name).map { t =>
        GraftDmlCommand(s"OPTIMIZE $name", _ =>
          Option(zorderCols) match {
            case Some(cols) => t.zorder(splitTop(cols))
            case None       => t.compact()
          })
      }
    case RestoreRe(name, v) =>
      table(name).map { t =>
        GraftDmlCommand(s"RESTORE $name", _ => t.restore(v.toLong))
      }
    case VacuumRe(name) =>
      table(name).map { t =>
        GraftDmlCommand(s"VACUUM $name", _ => { t.vacuum(); t.latestVersion() })
      }
    case HistoryRe(name) =>
      table(name).map(t => GraftHistoryCommand(name, t))
    // SQL-only registration path, so a consumer needs zero Scala:
    //   REGISTER GRAFT TABLE t AT '/path' [PARTITIONED BY (c)]
    //     [STATS (c1, c2)] [BLOOM (c1)] [WITH DELETION VECTORS]
    // The clauses ARE the handle's layout contract (partition column,
    // stats/bloom sidecars, deletion vectors) — the same reason DML
    // statements resolve registered handles instead of bare paths.
    case RegisterRe(name, path, tail) =>
      def cols(m: Option[scala.util.matching.Regex.Match]): Seq[String] =
        m.map(_.group(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
      val partCols = cols(PartByRe.findFirstMatchIn(tail))
      require(partCols.size <= 1,
        s"REGISTER GRAFT TABLE $name: PARTITIONED BY takes exactly one " +
          "column")
      Some(GraftDmlCommand(s"REGISTER GRAFT TABLE $name", s => {
        val t = MergeTable(s, path, partCols.headOption,
          cols(StatsRe.findFirstMatchIn(tail)),
          DvRe.findFirstIn(tail).isDefined,
          cols(BloomRe.findFirstMatchIn(tail)))
        register(name, t)
        t.latestVersion()
      }))
    case UnregisterRe(name) =>
      Some(GraftDmlCommand(s"UNREGISTER GRAFT TABLE $name", _ => {
        val had = table(name).isDefined
        unregister(name)
        if (had) 1L else 0L
      }))
    case _ => None
  }

  /** The `graft_table(name[, version|timestamp])` table-valued
    * function's plan builder — SQL-side time travel:
    * `SELECT ... FROM graft_table('t')` reads the live snapshot,
    * `graft_table('t', 3)` reads version 3, and
    * `graft_table('t', TIMESTAMP '...')` (or an ISO-8601 string)
    * resolves Delta's `timestampAsOf`. Arguments must be literals —
    * the relation is resolved at analysis time, exactly like a view
    * expansion. The returned plan is the SAME logical plan the Scala
    * API builds, so predicate pushdown / partition pruning / the scan
    * planner all apply untouched. */
  def tableFunction(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      "graft_table(name[, version|timestamp]) takes 1 or 2 arguments")
    def lit(e: Expression): Any = {
      require(e.foldable, s"graft_table arguments must be literals, got $e")
      e.eval()
    }
    val name = String.valueOf(lit(args.head))
    val t = table(name).getOrElse(throw new IllegalArgumentException(
      s"graft_table: no table registered as '$name' — call " +
        "GraftSql.register first"))
    val df = args.lift(1).map(a => (lit(a), a.dataType)) match {
      case None => t.read()
      case Some((v, org.apache.spark.sql.types.TimestampType)) =>
        // a timestamp literal evals to epoch MICROS
        t.readAsOf(java.time.Instant.EPOCH.plusNanos(
          v.asInstanceOf[Long] * 1000L))
      case Some((v, _: org.apache.spark.sql.types.StringType)) =>
        t.readAsOf(java.time.Instant.parse(String.valueOf(v)))
      case Some((v, _)) =>
        t.readVersion(v.asInstanceOf[Number].longValue())
    }
    df.queryExecution.logical
  }

  /** The `graft_changes(name, pk, fromVersion, toVersion)` table-valued
    * function — the change data feed as SQL (Databricks'
    * `table_changes` parity): every insert/update/delete between the
    * two versions, tagged `_change_type`, log-pruned to partitions
    * whose file sets differ. `pk` is the key column the feed diffs on
    * (a string literal), same contract as [[MergeTable.changes]]. */
  def changesFunction(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 4,
      "graft_changes(name, pk, fromVersion, toVersion) takes 4 arguments")
    def lit(e: Expression): Any = {
      require(e.foldable, s"graft_changes arguments must be literals, got $e")
      e.eval()
    }
    val name = String.valueOf(lit(args(0)))
    val t = table(name).getOrElse(throw new IllegalArgumentException(
      s"graft_changes: no table registered as '$name' — call " +
        "GraftSql.register first"))
    val pk = String.valueOf(lit(args(1)))
    val fromV = lit(args(2)).asInstanceOf[Number].longValue()
    val toV = lit(args(3)).asInstanceOf[Number].longValue()
    t.changes(fromV, toV, pk).queryExecution.logical
  }
}

/** `DESCRIBE HISTORY <name>` — the commit log as a result set
  * (version, committed_at, files added/removed, checkpoint marker).
  * Metadata-scale by construction: [[MergeTable.history]] reads only
  * the log directory, never data files, so collecting it to the
  * driver is a few rows per commit. */
case class GraftHistoryCommand(name: String, t: MergeTable)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(t.history().schema)
  override def run(sparkSession: SparkSession): Seq[Row] =
    t.history().collect().toSeq
  override def simpleString(maxFields: Int): String =
    s"GraftDml(DESCRIBE HISTORY $name)"
}

/** An eagerly-executed lake DML statement: `spark.sql(...)` runs
  * commands at call time, so the MergeTable call commits before
  * `sql()` returns — DML semantics, not lazy-frame semantics. Returns
  * the committed (or latest, for VACUUM) version as one row. */
case class GraftDmlCommand(label: String, body: SparkSession => Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(body(sparkSession)))
  override def simpleString(maxFields: Int): String = s"GraftDml($label)"
}

/** The injected parser: graft DML against registered tables is ours;
  * EVERYTHING else — including standard SQL and Spark's own
  * MERGE/UPDATE/DELETE on catalog tables — goes to the delegate
  * verbatim. Injected by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
