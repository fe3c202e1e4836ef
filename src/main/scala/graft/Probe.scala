package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{CheckedDoc, Checker, Pipeline}

/** Stage-isolation scaling probe: times individual pipeline stages at two
  * parallelism levels to locate anti-scaling stages. Not part of the driver
  * contract; kept for perf work.
  */
object Probe {
  private def session(cores: Int): SparkSession = {
    val b0 = SparkSession.builder()
    val b1 = if (sys.env.get("SPARK_GRAFT_EVENTLOG").contains("1")) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("/tmp/spark-events"))
      b0.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", "/tmp/spark-events")
    } else b0
    val s = b1.master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft-probe")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPL", "40").toInt

    // materialize input once
    {
      val s = session(32)
      import s.implicits._
      val base = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text", "source")
      val amp = base.crossJoin(s.range(repl.toLong).select(col("id").as("r")))
        .select((col("doc_id") + col("r") * 1000000L).as("doc_id"), col("text"), col("source"))
        .as[(Long, String, String)]
        .map { case (id, t, src) => graft.gen.Synth.checkerDoc(id, t, src) }
      amp.toDF().repartition(256, col("doc_id"))
        .write.mode(SaveMode.Overwrite).parquet(s"$work/input")
      base.select(col("doc_id")).as[Long].flatMap(id => graft.gen.Synth.prevState(id))
        .toDF().repartition(64, col("doc_id"))
        .write.mode(SaveMode.Overwrite).parquet(s"$work/prev")
      s.stop()
    }

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val seq = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(32, 8, 32, 8, 32))
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    seq.foreach { cores =>
      val s = session(cores)
      import s.implicits._
      val input = s.read.parquet(s"$work/input")
      val prev = s.read.parquet(s"$work/prev")

      val tRead = time(input.count())
      val tCheck = time(Checker.filterNeedsUpdate(Checker.classify(input, prev)).count())
      val checked = Checker.filterNeedsUpdate(Checker.classify(input, prev))
      val tShuffle = time(checked.repartition(cores, col("doc_id")).count())
      val salted = Pipeline.saltHeavyOnly(checked, cores, 4L << 20)
      val tExtract = time(Pipeline.extractStageNative(salted, ts, "probe")
        .select(count(col("error"))).collect())
      val tTyped = time(Pipeline.extractStage(salted.as[CheckedDoc], ts, "probe").count())
      val tWrite = time(Pipeline.extractStageNative(salted, ts, "probe")
        .write.mode(SaveMode.Overwrite).parquet(s"$work/out$cores"))
      println(f"PROBE cores=$cores%2d read=$tRead%6.2f check=$tCheck%6.2f shuffle=$tShuffle%6.2f native_extract=$tExtract%6.2f typed_extract=$tTyped%6.2f native+write=$tWrite%6.2f")
      s.stop()
    }
  }
}
