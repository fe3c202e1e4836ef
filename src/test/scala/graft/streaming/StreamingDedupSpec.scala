package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Streaming first-arrival dedup: state bounded by the event-time
  * watermark, exactly-one emission per content hash across micro-batches.
  * The batch statement of the same semantics (firstArrival) is oracle-gated
  * as q47; these tests pin what the oracle can't see — cross-micro-batch
  * arrival and agreement between the two forms.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: Long) = new Timestamp(1577836800000L + s * 1000L) // 2020-01-01 UTC + s

  test("duplicates across micro-batches are emitted exactly once") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ddstream").toString
    val inDir = s"$tmp/in"; val cpDir = s"$tmp/cp"
    // wave 1: docs 0-9; wave 2: redeliveries of 0-4 (same text, later event
    // time, new ids) plus new docs 10-14. One file per wave/trigger.
    val wave1 = (0 until 10).map(i => (i.toLong, s"text body $i", ts(i)))
    val wave2 = (0 until 5).map(i => (i + 1000L, s"text body $i", ts(i + 60))) ++
      (10 until 15).map(i => (i.toLong, s"text body $i", ts(i)))
    wave1.toDF("doc_id", "text", "event_time").coalesce(1)
      .write.mode("append").parquet(inDir)
    Thread.sleep(100)
    wave2.toDF("doc_id", "text", "event_time").coalesce(1)
      .write.mode("append").parquet(inDir)

    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = StreamingDedup.dedupStream(stream, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dd_stream")
      .option("checkpointLocation", cpDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val out = spark.table("dd_stream")
    // 15 distinct texts, each exactly once; the 5 redeliveries are dropped
    assert(out.count() == 15)
    assert(out.select("text_hash").distinct().count() == 15)
    assert(out.filter(col("doc_id") >= 1000L).count() == 0) // first arrival won
  }

  test("nearDupIngest: later micro-batches near-dedup against the accumulated store") {
    import spark.implicits._
    def t(p: String) = (0 until 30).map(j => s"${p}_$j").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndstream").toString
    val inDir = s"$tmp/in"; val store = s"$tmp/store"
    val kept = s"$tmp/kept"; val cp = s"$tmp/cp"
    // wave 1: docs 0-9. wave 2: drop-last-word NEAR-dups of 0-4 under new
    // ids (must be dropped against the store built by wave 1) + new 10-14.
    val wave1 = (0 until 10).map(i => (i.toLong, t(s"w$i")))
    val wave2 = (0 until 5).map(i =>
        (1000L + i, t(s"w$i").split(" ").dropRight(1).mkString(" "))) ++
      (10 until 15).map(i => (i.toLong, t(s"w$i")))
    wave1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    wave2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    // FileStreamSource orders by mtime (ties broken arbitrarily): set the
    // wave order EXPLICITLY so the test is deterministic on any
    // filesystem's timestamp granularity
    locally {
      val d = new java.io.File(inDir)
      val parts = d.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val w1 = wave1.map(_._1).toSet
      parts.foreach { f =>
        val ids = spark.read.parquet(f.getPath).select("doc_id")
          .collect().map(_.getLong(0)).toSet
        f.setLastModified(if (ids.subsetOf(w1)) 1700000000000L else 1700000060000L)
      }
    }

    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = StreamingDedup.nearDupIngest(stream, store, kept, cp)
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.parquet(kept)
    assert(out.select("doc_id").as[Long].collect().toSet == (0L until 15L).toSet)
    // the store accumulated signatures and texts for every kept doc
    assert(spark.read.parquet(s"$store/texts").count() == 15)
    assert(spark.read.parquet(s"$store/sig").select("doc_id").distinct().count() == 15)

    // FULL REPLAY (fresh checkpoint, same store/kept dirs — the crash-
    // recovery worst case): each batch re-reads a store already holding
    // its own previous writes; the own-partition exclusion must keep it
    // from marking itself duplicate, and the batch=<id> overwrites must
    // leave the output byte-identical instead of doubled or emptied
    val q2 = StreamingDedup.nearDupIngest(stream, store, kept, s"$tmp/cp2")
    try q2.processAllAvailable() finally q2.stop()
    val replayed = spark.read.parquet(kept)
    assert(replayed.select("doc_id").as[Long].collect().toSet == (0L until 15L).toSet)
    assert(replayed.count() == 15)
    assert(spark.read.parquet(s"$store/texts").count() == 15)
  }

  test("batch firstArrival agrees with the streaming output set") {
    import spark.implicits._
    val rows = ((0 until 10).map(i => (i.toLong, s"text body $i", ts(i))) ++
      (0 until 5).map(i => (i + 1000L, s"text body $i", ts(i + 60))) ++
      (10 until 15).map(i => (i.toLong, s"text body $i", ts(i))))
      .toDF("doc_id", "text", "event_time")
    val out = StreamingDedup.firstArrival(rows)
    // skew-safe shape: map-side partial aggregation, no window partition
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    val survivors = out.select("doc_id").as[Long].collect().toSet
    assert(survivors == (0 until 15).map(_.toLong).toSet)
  }

  test("firstArrival tie-breaks equal event times by id (idempotent reruns)") {
    import spark.implicits._
    val rows = Seq(
      (7L, "same text", ts(5)),
      (3L, "same text", ts(5)), // equal ts: smaller id wins
      (9L, "other", ts(1)))
      .toDF("doc_id", "text", "event_time")
    val survivors = StreamingDedup.firstArrival(rows)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(3L, 9L))
  }
}
