package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftshim.GraftStreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.lake.MergeTable
import graft.sql.GraftSql

/** A [[MergeTable]] as a STRUCTURED STREAMING SINK — the write-side
  * mirror of the X153 `graft-cdf` source (Delta's
  * `writeStream.format("delta")`), closing the loop: a lake table is
  * now both ends of a streaming pipeline.
  *
  * {{{
  *   GraftSql.register("t", table)
  *   df.writeStream.format("graft")
  *     .option("table", "t")
  *     .option("checkpointLocation", ckpt)
  *     .start()                        // appends each micro-batch
  * }}}
  *
  * EXACTLY-ONCE is [[MergeTable.appendWithTxn]]'s transaction
  * watermark (Delta's `txn` action): each micro-batch commits
  * atomically with `appId → batchId`, and a REPLAYED batch — the
  * engine re-runs the last batch after a crash between its offset
  * commit and ours — is absorbed as a no-op. `appId` defaults to
  * `graft-sink:<table>` (correct for the one-streaming-writer-per-
  * table shape; Delta's sink keys on the query checkpoint the same
  * way) and is overridable via `txnAppId` when several queries append
  * to one table.
  *
  * Append-mode only, like Delta's sink: update/complete-mode folding
  * belongs in `foreachBatch` + `merge`/`mergeCdc` (X75/X161), where
  * the caller owns the key semantics. */
class GraftSink(t: MergeTable, appId: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine's frame still carries streaming sources — rewrap the
    // same lazy rows as a batch frame (see GraftStreamShim.asBatch)
    val batch = GraftStreamShim.asBatch(data.sparkSession, data)
    t.withSession(data.sparkSession).appendWithTxn(batch, appId, batchId)
    ()
  }
  override def toString: String = s"GraftSink($appId)"
}

/** `format("graft")` sink provider. Options: `table` (registered
  * name, required — the handle owns the layout contract, same rule as
  * every other SQL/streaming entry point), `txnAppId` (optional
  * exactly-once ledger key; default `graft-sink:<table>`). */
class GraftSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft sink: only Append output mode is supported (got $outputMode);" +
        " use foreachBatch + merge/mergeCdc for keyed folding")
    require(partitionColumns.isEmpty,
      "graft sink: partitioning lives on the registered handle, not " +
        "partitionBy() — register the table with its partition column")
    val name = parameters.getOrElse("table",
      throw new IllegalArgumentException(
        "graft sink: option 'table' (a GraftSql-registered name) is required"))
    val t = GraftSql.table(name).getOrElse(
      throw new IllegalArgumentException(
        s"graft sink: no table registered as '$name' — call " +
          "GraftSql.register (or REGISTER GRAFT TABLE) first"))
    val appId = parameters.getOrElse("txnAppId",
      s"graft-sink:${name.toLowerCase}")
    new GraftSink(t.withSession(sqlContext.sparkSession), appId)
  }
}
