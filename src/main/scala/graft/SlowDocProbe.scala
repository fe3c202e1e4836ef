package graft

import org.apache.spark.sql.SparkSession
import graft.core.{Dispatcher, Doc}

/** Find pathological documents: per-doc extraction timing over the bench
  * input, top-N slowest printed with format and size.
  */
object SlowDocProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet("/dev/shm/graft-probe/input").as[Doc]
      .collect()
    println(s"docs=${docs.length}")
    val timed = docs.iterator.map { d =>
      val t0 = System.nanoTime()
      Dispatcher.extract(d)
      val us = (System.nanoTime() - t0) / 1000
      val bytes = if (d.spans == null) 0 else d.spans.map(s => if (s.text == null) 0 else s.text.length).sum
      (us, d.doc_id, d.format, bytes, if (d.spans == null) 0 else d.spans.length)
    }.toArray
    println("TOTAL_SEC " + timed.map(_._1).sum / 1e6)
    timed.sortBy(-_._1).take(12).foreach { case (us, id, fmt, bytes, ns) =>
      println(f"SLOW $id%14s fmt=$fmt%-7s us=$us%9d bytes=$bytes%9d spans=$ns%6d")
    }
    spark.stop()
  }
}
