package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Doc
import graft.spark.{CheckedDoc, Checker, Pipeline}

/** Per-stage cost decomposition at one parallelism level. */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val work = "/dev/shm/graft-probe"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"MICRO $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val input = spark.read.parquet(s"$work/input")
    val prev = spark.read.parquet(s"$work/prev")

    time("scan-count")(input.count())
    time("scan-count")(input.count())
    time("deserialize-to-Doc")(input.as[Doc].map(d => if (d.spans == null) 0 else d.spans.length).reduce(_ + _))
    time("deserialize-to-Doc")(input.as[Doc].map(d => if (d.spans == null) 0 else d.spans.length).reduce(_ + _))
    val checked0 = Checker.filterNeedsUpdate(Checker.classify(input, prev))
    time("checker-count")(checked0.count())
    val checkedDs = checked0.as[CheckedDoc]
    time("deser+extract-noshuffle")(
      Pipeline.extractStage(checkedDs, ts, "m").count())
    time("deser+extract-noshuffle")(
      Pipeline.extractStage(checkedDs, ts, "m").count())
    val salted = Pipeline.saltByCost(checked0, cores, 4L << 20).as[CheckedDoc]
    time("salt+deser+extract")(
      Pipeline.extractStage(salted, ts, "m").count())
    time("extract+write")(
      Pipeline.extractStage(checkedDs, ts, "m")
        .write.mode("overwrite").parquet(s"$work/mout"))

    // per-partition wall vs cpu inside the extract loop
    val stats = checkedDs.mapPartitions { it =>
      val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      val w0 = System.nanoTime(); val c0 = tmx.getCurrentThreadCpuTime
      var n = 0
      it.foreach { cd =>
        val doc = Doc(cd.doc_id, cd.format, cd.provider, cd.source_path,
          Option(cd.spans).getOrElse(Seq.empty), cd.update_flag, cd.src_mtime)
        graft.core.Dispatcher.extract(doc)
        n += 1
      }
      val w = (System.nanoTime() - w0) / 1e6
      val c = (tmx.getCurrentThreadCpuTime - c0) / 1e6
      Iterator.single((org.apache.spark.TaskContext.getPartitionId(), n, w, c))
    }.collect()
    println(f"MICRO parts=${stats.length} rows=${stats.map(_._2).sum} " +
      f"wallSum=${stats.map(_._3).sum / 1000}%.1fs cpuSum=${stats.map(_._4).sum / 1000}%.1fs " +
      f"maxWall=${stats.map(_._3).max / 1000}%.1fs")
    stats.sortBy(-_._3).take(6).foreach { case (p, n, w, c) =>
      println(f"MICRO part=$p%3d rows=$n%7d wall=${w / 1000}%6.2fs cpu=${c / 1000}%6.2fs")
    }
    spark.stop()
  }
}
