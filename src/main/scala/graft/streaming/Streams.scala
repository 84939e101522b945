package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference's pull pipeline is labeled
  * "// streaming" (`/root/reference/src/main.rs:34`) — incremental
  * chunk-at-a-time evaluation with early break; the Spark-native analog is a
  * Structured Streaming query with watermark-bounded state. Tested via
  * MemoryStream in StreamingSpec (not oracle-checked — not batch SQL).
  */
object Streams {

  /** Event-time tumbling-window aggregation over an events-shaped frame
    * (event_id, ts, user_id, event_type, value, props). With `watermark=true`
    * on a streaming frame, state for windows older than ts_max - 2h is
    * dropped — bounded state at any scale. Works identically on a batch
    * frame with `watermark=false`. */
  def hourlyByType(events: DataFrame, watermark: Boolean = true): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"), col("sum_value"))
  }
}
