package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** The streaming curation capstone: micro-batches curated against the
  * accumulated corpus stores, keeper deltas appended, replay-idempotent
  * output partitions — the continuous form of the batch contract gated by
  * q114 and the three-day e2e in OpsSpec.
  */
class StreamingCurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def t(p: String) = (0 until 20).map(j => s"${p}_$j").mkString(" ")

  test("curateIngest: fates per micro-batch; keepers police later batches; full replay idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-scur").toString
    val inDir = s"$tmp/in"; val store = s"$tmp/store"
    val out = s"$tmp/out"; val cp = s"$tmp/cp"
    // wave 1 bootstraps empty stores: 1-4 kept, 5 an exact mirror of 1,
    // 6 low-quality. wave 2 is policed by wave 1's keepers: 11 exact copy
    // of 2, 12 near-dup (drop-1) of 3, 13 novel, 14 low-quality.
    val wave1 = Seq(
      (1L, t("a")), (2L, t("b")), (3L, t("c")), (4L, t("d")),
      (5L, t("a")), (6L, "too short"))
    val wave2 = Seq(
      (11L, t("b")), (12L, t("c").split(" ").dropRight(1).mkString(" ")),
      (13L, t("n")), (14L, "tiny too"))
    def dump(w: Seq[(Long, String)]): Unit =
      w.toDF("doc_id", "text")
        .withColumn("source", concat(lit("s"), col("doc_id") % 2))
        .coalesce(1).write.mode("append").parquet(inDir)
    dump(wave1); dump(wave2)
    // deterministic wave order regardless of filesystem mtime granularity
    locally {
      val w1 = wave1.map(_._1).toSet
      new java.io.File(inDir).listFiles().filter(_.getName.startsWith("part-"))
        .foreach { f =>
          val ids = spark.read.parquet(f.getPath).select("doc_id")
            .collect().map(_.getLong(0)).toSet
          f.setLastModified(if (ids.subsetOf(w1)) 1700000000000L else 1700000060000L)
        }
    }

    val schema = spark.read.parquet(inDir).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = StreamingCurate.curateIngest(stream, store, out, cp)
    try q.processAllAvailable() finally q.stop()

    val expected = Map(
      1L -> "kept", 2L -> "kept", 3L -> "kept", 4L -> "kept",
      5L -> "exact_dup", 6L -> "low_quality",
      11L -> "exact_dup", 12L -> "near_dup", 13L -> "kept", 14L -> "low_quality")
    val fates = spark.read.parquet(out).select("doc_id", "status")
      .as[(Long, String)].collect().toMap
    assert(fates == expected, fates.toString)
    // keepers (and only keepers) entered every store
    assert(spark.read.parquet(s"$store/hash").count() == 5)
    assert(spark.read.parquet(s"$store/texts").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 13L))
    assert(spark.read.parquet(s"$store/sig").select("doc_id").distinct().count() == 5)
    // kept rows carry a split + scrubbed text, dropped rows carry neither
    val keptRows = spark.read.parquet(out).filter(col("status") === "kept")
    assert(keptRows.filter(col("split").isNull || col("text").isNull).isEmpty)

    // FULL REPLAY with a fresh checkpoint over the same store/out dirs:
    // the own-partition exclusion keeps each batch from marking itself
    // duplicate and the content-keyed overwrites leave everything
    // byte-identical instead of doubled or emptied
    val q2 = StreamingCurate.curateIngest(stream, store, out, s"$tmp/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).select("doc_id", "status")
      .as[(Long, String)].collect().toMap == expected)
    assert(spark.read.parquet(s"$store/hash").count() == 5)
    assert(spark.read.parquet(s"$store/texts").count() == 5)
  }
}
