package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketch
import graft.spark.SparkTestSession

/** Continuous KMV distinct accounting: per-batch sketches accumulate in
  * the store and the read-side merge equals one batch sketch over the full
  * history; replays rewrite their own partition with identical content.
  * The batch form of the merge (kmvMerge) is oracle-gated as q104; these
  * tests pin the cross-micro-batch and restart behavior the oracle can't
  * see.
  */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("per-batch sketches merge to the whole-history distinct estimate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sketchstream").toString
    val inDir = s"$tmp/in"; val store = s"$tmp/store"; val cp = s"$tmp/cp"
    // k=8 over 60 distinct texts: the saturated estimator path, with
    // cross-wave duplicates that must not inflate the estimate
    val wave1 = (0 until 30).map(i => (i.toLong, s"body number $i"))
    val wave2 = (20 until 60).map(i => (i.toLong, s"body number $i"))
    wave1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    Thread.sleep(100)
    wave2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)

    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = StreamingSketch.distinctIngest(stream, store, cp, k = 8)
    q.processAllAvailable(); q.stop()

    val got = StreamingSketch.readDistinct(spark, store, k = 8)
      .as[(Long, Long, Long)].head()
    val want = Sketch.kmvDistinct(
      (0 until 60).map(i => s"body number $i").toDF("text"), col("text"), 8)
      .as[(Long, Long, Long)].head()
    assert(got == want)
    assert(got._1 == 8L) // saturated

    // a fresh-checkpoint rerun over the same input replays the same batch
    // content: same content-keyed partitions, identical store afterwards
    val partsBefore = new java.io.File(store).list().sorted.toSeq
    val q2 = StreamingSketch.distinctIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inDir),
      store, s"$tmp/cp2", k = 8)
    q2.processAllAvailable(); q2.stop()
    assert(new java.io.File(store).list().sorted.toSeq == partsBefore)
    assert(StreamingSketch.readDistinct(spark, store, k = 8)
      .as[(Long, Long, Long)].head() == want)
  }

  test("missing store reads as zero distinct") {
    import spark.implicits._
    val out = StreamingSketch.readDistinct(
      spark, "/tmp/graft-no-such-sketch-store", k = 8)
      .as[(Long, Long, Long)].head()
    assert(out == ((0L, -1L, 0L)))
  }
}
