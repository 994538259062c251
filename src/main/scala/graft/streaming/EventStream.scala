package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). The transforms are
  * batch/stream agnostic: the same plan runs on a bounded DataFrame (the
  * driver's batch oracle path) and on a readStream/MemoryStream source with
  * a watermark (EventStreamSpec proves batch/stream parity).
  */
object EventStream {

  /** 5-minute tumbling-window counts per event type. `events.ts` must be a
    * TIMESTAMP column; output (bucket_start epoch-seconds, event_type,
    * n_events). */
  def windowedCounts(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("event_type"), col("n_events"))
  }

  /** Per-user sessionization with a 30-minute gap, via the session_window
    * native operator: (user_id, session_start, n_events). */
  def sessions(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"))
  }
}
