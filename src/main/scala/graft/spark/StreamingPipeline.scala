package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous operation. The reference's "streaming" is Celery queues — no
  * event time, no watermarks, at-least-once with one retry
  * (docs/Overview.md:173-175, adsft/tasks.py:21-27). The Spark-native
  * re-expression is Structured Streaming over the input table with the SAME
  * batch body per micro-batch (foreachBatch), which gives exactly-once sink
  * semantics per batch plus checkpointed offsets — strictly stronger than
  * the reference's retry queue.
  */
object StreamingPipeline {

  /** File-source stream of input docs -> extraction -> parquet append.
    * `Trigger.AvailableNow` drains what exists and stops (the bulk-ingest
    * run.py mode); pass a ProcessingTime trigger for continuous service.
    */
  def run(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, prevState: DataFrame,
      indexDate: java.sql.Timestamp, numPartitions: Int = 32,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {

    val schema = spark.read.parquet(inputDir).schema
    val reader = spark.readStream.schema(schema)
    // backpressure: the reference producer stops enqueueing past
    // max_queue_size (run.py:107-109); the streaming analog bounds batch size
    val stream = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n))
      .getOrElse(reader)
      .parquet(inputDir)

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Pipeline.run(batch.sparkSession, batch, prevState, None,
            indexDate, runId = s"stream-$batchId", numPartitions = numPartitions)
          .write.mode("append").parquet(outDir)
      }
      .start()
  }
}
