package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap sessionization — the streaming counterpart of the batch
  * W4 operator (`RelOps.w4Sessionize`), via Spark's native `session_window`
  * aggregation: each event opens/extends a [ts, ts+gap) window, overlapping
  * windows per user merge in the state store, and a session emits exactly
  * once — when the watermark passes its end, i.e. when no event can extend
  * it any more (append mode).
  *
  * Semantics vs the batch W4 form, stated precisely (both pinned by
  * StreamingSessionizeSpec):
  *  - session MEMBERSHIP is identical: `session_window` merges an event
  *    landing EXACTLY at the previous window's end, i.e. a session splits
  *    only when the gap is STRICTLY greater than `gap` — the same
  *    convention as W4's `us - prev_us > gapUs`;
  *  - `session_end` here is `last_ts + gap` (the window end — by
  *    construction), where W4 reports `max(ts)`.
  *
  * Scale shape: ONE shuffle keyed on user_id into the session-window state
  * store; state is bounded by (open sessions × state rows), and the
  * watermark both bounds state retention and makes emission deterministic.
  * This is the exact streaming shape the batch W4 scaladoc names. */
object StreamingSessionize {

  /** `stream`: (user_id, event_id, ts, value, ...) with `ts` castable to
    * timestamp. Works identically over a static DataFrame (batch mode) —
    * the stream≡batch equality test runs THIS function both ways. */
  def apply(stream: DataFrame, gap: String = "30 minutes",
            watermark: String = "30 minutes"): DataFrame = {
    val ts = stream.withColumn("ts", col("ts").cast("timestamp"))
    val wm = if (ts.isStreaming) ts.withWatermark("ts", watermark) else ts
    wm.groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
              col("sw.start").as("session_start"),
              col("sw.end").as("session_end"),
              col("n_events"), col("total_value"))
  }
}
