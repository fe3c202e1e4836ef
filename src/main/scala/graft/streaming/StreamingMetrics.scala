package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed counter metrics over the extraction stream — the
  * Structured-Streaming analog of the sink-time A5 counters
  * (Pipeline.observeMetrics; reference writer.py:240-253).
  *
  * A watermark on the event column bounds aggregation state: windows older
  * than (max event time - delay) finalize and flush, later-arriving rows
  * for them are dropped by the engine. At 10^12-doc scale this is what
  * keeps per-window counter state O(active windows x formats) instead of
  * unbounded. Windowed aggregation shuffles once on (window, format) with
  * partial aggregation — the same single-shuffle shape as the batch
  * counters.
  */
object StreamingMetrics {

  /** Per-(event-window, format) extracted/errored counts. `extracted` must
    * carry `format`, `error`, and the event column (e.g. `index_date` or
    * the source mtime). Works on a streaming OR batch DataFrame (on batch,
    * the watermark is a no-op and every window is emitted).
    */
  def windowedMetrics(extracted: DataFrame, eventCol: String,
      windowDuration: String = "5 minutes",
      watermarkDelay: String = "1 minute"): DataFrame =
    extracted
      .withWatermark(eventCol, watermarkDelay)
      .groupBy(window(col(eventCol), windowDuration), col("format"))
      .agg(
        sum(when(col("error").isNull, 1L).otherwise(0L)).as("n_extracted"),
        sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("n_errored"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("format"), col("n_extracted"), col("n_errored"))
}
