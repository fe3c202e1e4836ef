package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream operators over the activity log that accompanies a corpus
  * (ingest/extraction audit events, user interactions). Beyond the
  * reference's scope, but the per-entity sessionization below is the
  * standard first aggregation over any event table at scale.
  */
object Events {

  /** Gap-based sessionization per entity: consecutive events within `gap`
    * of each other belong to one session; an event STRICTLY beyond the
    * previous event + gap starts a new one (an event landing exactly on
    * the boundary merges — pinned by test). Uses Spark's NATIVE `session_window`
    * aggregation — a single groupBy whose partial aggregation merges
    * session ranges map-side (and which runs unchanged on a stream with a
    * watermark), rather than a lag()/running-sum window pair that would
    * buffer each entity's whole history in one window partition. Output:
    * one row per (entity, session) with start epoch, event count, and
    * duration in whole seconds — all integers, so a cross-engine oracle
    * hash-compares exactly.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    // parquet event logs are commonly TIMESTAMP_NTZ; with the session in
    // UTC the cast is a pure reinterpretation (no wall-clock shift)
    val ts = col(tsCol).cast("timestamp")
    events
      .groupBy(col(userCol), session_window(ts, gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(ts)).as("_min_us"),
        max(unix_micros(ts)).as("_max_us"))
      .select(
        col(userCol),
        (col("_min_us") / lit(1000000L)).cast("long").as("session_start_epoch"),
        col("n_events"),
        ((col("_max_us") - col("_min_us")) / lit(1000000L)).cast("long").as("duration_sec"))
  }
}
