package graft.streaming

import org.apache.spark.sql.DataFrame
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
    * the earliest row by (event time, id). Expressed as
    * `min(struct(ts, id, rest…))` per hash — an aggregation with map-side
    * partial aggregation, not a window — so a hot hash collapses on the
    * map side instead of landing as one giant window partition on a single
    * task. Deterministic (ids unique), so an oracle can replay it and
    * reruns are idempotent.
    */
  def firstArrival(docs: DataFrame, textCol: String = "text",
      tsCol: String = "event_time", idCol: String = "doc_id"): DataFrame = {
    val hashed = docs.withColumn("text_hash", md5(col(textCol)))
    val rest = hashed.columns.filterNot(_ == "text_hash")
    val ordered = Seq(tsCol, idCol) ++ rest.filterNot(c => c == tsCol || c == idCol)
    hashed
      .groupBy("text_hash")
      .agg(min(struct(ordered.map(col): _*)).as("_row"))
      .select(rest.map(c => col(s"_row.$c").as(c)) :+ col("text_hash"): _*)
  }
}
