package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream batch operators (SURVEY.md §2 P13-P14): gap-based
 * sessionization and tumbling-window aggregation. These are the batch
 * twins of the Structured Streaming pipeline in graft.streaming — same
 * semantics, oracle-checkable in DuckDB.
 *
 * Scale design: both operators shuffle exactly once, keyed by user_id
 * (sessionize) / nothing beyond the groupBy key (windows). user_id is
 * high-cardinality so the sessionize window has no skew; at 100 TB the
 * events table would be range-partitioned by time, making the tumbling
 * agg partial-aggregated per file with no wide shuffle at all.
 */
object Sessionize {

  /**
   * P13 — Gap-based sessionization: a new session starts when the gap to
   * the user's previous event exceeds `gapMinutes`. Emits one row per
   * session: (user_id, session_idx, n_events, session_start, session_end,
   * total_value), session_idx numbered 1.. per user in time order.
   */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // gap compares MICROSECOND timestamps (full parquet precision), the
    // same arithmetic the streaming sessionizer uses — second-floored
    // casts would disagree with the streaming twin on sub-second data
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(byUser))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")), 4).as("total_value"))
  }

  /**
   * P14 — Tumbling-window aggregation: per (window, event_type) counts and
   * value sums over fixed `widthMinutes` windows. Batch twin of the
   * streaming `EventStream.windowedCounts`.
   * Output: (window_start, event_type, n_events, n_users, total_value).
   */
  def tumblingAgg(events: DataFrame, widthMinutes: Int = 60): DataFrame =
    events
      .groupBy(
        window(col("ts"), s"$widthMinutes minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("total_value"))
}
