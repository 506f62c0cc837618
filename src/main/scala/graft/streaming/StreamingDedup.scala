package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup for a document ingest stream.
  *
  * `dropDuplicatesWithinWatermark` keyed on the content hash: a document
  * whose sha256 was already seen within the watermark horizon is dropped
  * before it reaches the expensive stages. State is BOUNDED by the
  * watermark — the streaming state store evicts hashes older than the
  * horizon, so a long-running stream cannot accumulate unbounded dedup
  * state (an unwatermarked global `dropDuplicates` would). That bound is
  * also the contract: this operator guards the ingest stream against
  * bursts, crawler replays and mirror storms of identical content;
  * FULL-HISTORY dedup against everything ever ingested is a batch concern
  * (the curation funnel's exact + near-dup stages), not stream state.
  */
object StreamingDedup {

  /** Drop stream rows whose `textCol` content hash repeats within
    * `horizon` of the event-time column `tsCol`. Emits the input columns
    * plus `sha256` (the dedup key, kept for downstream lineage). */
  def dedupByContent(stream: DataFrame, textCol: String = "text",
                     tsCol: String = "ts", horizon: String = "10 minutes"): DataFrame =
    stream.withColumn("sha256", sha2(col(textCol), 256))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("sha256")
}
