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
    // multithreaded pass over the SAME pre-materialized docs: isolates kernel
    // thread-scaling from Spark's row deserialization/allocation
    def mt(label: String, ds: Array[Doc], threads: Int): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val idx = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val fs = (0 until threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = idx.getAndIncrement()
            while (i < ds.length) { Dispatcher.extract(ds(i)); i = idx.getAndIncrement() }
          }
        })
      }
      fs.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"MT $label%-9s threads=$threads%2d sec=$sec%6.2f docs_per_sec=${ds.length / sec}%9.0f")
    }
    Seq(32, 8, 32).foreach(t => mt("real", docs, t))
    // CSP-style synthetic docs, same count, same JVM — A/B against the real set
    val words = Array("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch", "stream")
    val synth = (0 until docs.length).map { i =>
      val rnd = new scala.util.Random(i)
      val text = Array.fill(40 + rnd.nextInt(40))(words(rnd.nextInt(words.length))).mkString(" ")
      graft.gen.Synth.doc(i.toLong, text, s"src$i")
    }.toArray
    Seq(32, 8, 32).foreach(t => mt("synth", synth, t))
    // per-format single-thread cost on the real set (locates which format diverges)
    docs.groupBy(_.format).foreach { case (fmt, ds) =>
      val t0 = System.nanoTime()
      ds.foreach(Dispatcher.extract)
      val us = (System.nanoTime() - t0) / 1e3 / ds.length
      println(f"FMT $fmt%-8s n=${ds.length}%7d us_per_doc=$us%8.1f")
    }
    spark.stop()
  }
}
