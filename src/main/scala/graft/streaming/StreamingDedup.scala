package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact content dedup as a STREAMING stage — the continuous analog of
  * `ops.Dedup.incrementalExact` for a pipeline whose corpus arrives as an
  * unbounded stream (the reference consumes a queue, adsft/app.py; a crawl
  * pipeline sees the same doc from many seeds).
  *
  * The streaming form keys state by content hash and emits only the FIRST
  * arrival. `dropDuplicatesWithinWatermark` bounds that state by event
  * time: a hash older than (max event time - delay) is evicted, so state
  * is O(docs per watermark window), not O(corpus) — the property that
  * lets the stage run forever. The trade is the dedup horizon: re-arrivals
  * farther apart than the delay pass through, and the downstream
  * idempotent sink (anti-join against the snapshot table) absorbs them.
  */
object StreamingDedup {

  /** Streaming first-arrival dedup on md5(text). `docs` must be a
    * streaming DataFrame carrying `textCol` and event column `tsCol`.
    */
  def dedupStream(docs: DataFrame, textCol: String = "text",
      tsCol: String = "event_time", watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Batch-mode statement of the same semantics (what the stream converges
    * to when arrivals respect event-time order): keep, per content hash,
    * the earliest row by (event time, id). One window shuffle on the hash;
    * deterministic, so an oracle can replay it and reruns are idempotent.
    */
  def firstArrival(docs: DataFrame, textCol: String = "text",
      tsCol: String = "event_time", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("text_hash").orderBy(col(tsCol), col(idCol))))
      .filter(col("_rn") === 1).drop("_rn")
}
