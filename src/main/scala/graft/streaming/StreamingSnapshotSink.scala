package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.io.SnapshotTable

/** Exactly-once Structured Streaming sink into a [[graft.io.SnapshotTable]] —
  * the snapshot-format upgrade of StreamingPipeline's dir-per-batch commits:
  * every micro-batch lands in ONE queryable table as a METADATA-ONLY append
  * (existing files re-listed, only the batch's rows hit disk), and replays
  * are absorbed by the manifest marker `<sinkId>#<batchId>`
  * ([[SnapshotTable.appendOnce]]) instead of a directory-existence probe.
  *
  * What the format buys a long-running ingest stream at scale:
  *  - downstream consumers see one table, not O(batches) `batch=<id>` dirs —
  *    and can follow the stream INCREMENTALLY via
  *    [[SnapshotTable.readAppendsBetween]] (last-processed snapshot → head),
  *    the CDC hand-off that chains a stream into the nightly delta funnel
  *    with zero re-reads;
  *  - small-file pressure is a maintenance call, not a redesign:
  *    `rewriteDataFiles` compacts the accumulated micro-batches (an
  *    `overwrite` commit, which incremental consumers simply do not cross —
  *    they re-anchor at the rewrite snapshot);
  *  - `expireSnapshots(keepLast >= 2 per active query)` bounds metadata;
  *    Structured Streaming replays at most the last unacknowledged batch,
  *    so retained markers always cover the replay horizon.
  *
  * Exactly-once contract (tested in StreamingSnapshotSinkSpec): the source's
  * offset log gives at-least-once delivery of each micro-batch; `appendOnce`
  * turns the duplicate deliveries into manifest no-ops, so each batch's rows
  * appear in the table exactly once — Iceberg's streaming-sink semantics
  * (checkpointed batch id in the snapshot summary), same mechanism.
  */
object StreamingSnapshotSink {

  /** foreachBatch body, exposed for direct idempotence testing: commits
    * `batch` under marker `<sinkId>#<batchId>`, a no-op on replay. */
  def addBatch(table: SnapshotTable, sinkId: String)
              (batch: DataFrame, batchId: Long): Unit = {
    table.appendOnce(batch, s"$sinkId#$batchId")
    ()
  }

  /** Attach the sink to a streaming Dataset:
    * `StreamingSnapshotSink.into(df.writeStream..., table, "ingest").start()`.
    * `sinkId` namespaces markers so independent queries can share a table. */
  def into(w: DataStreamWriter[Row], table: SnapshotTable, sinkId: String): DataStreamWriter[Row] =
    w.foreachBatch(addBatch(table, sinkId) _)

  /** Convenience: stream `df` into `table` with a checkpoint dir. */
  def start(df: DataFrame, table: SnapshotTable, sinkId: String,
            checkpointDir: String): StreamingQuery =
    into(df.writeStream.option("checkpointLocation", checkpointDir), table, sinkId).start()
}
