package graft

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.gen.Synth

/** Spark-free scaling probe of the pure extraction kernel: same docs, plain
  * thread pools at several sizes. Separates core-code / GC contention from
  * Spark-layer effects.
  */
object CoreScaleProbe {
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(60000)
    val seq = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 8, 32, 8, 32))
    val warmups = args.lift(2).map(_.toInt).getOrElse(1)
    // deterministic synthetic docs (all formats), text ~300 chars
    val words = Array("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch", "stream")
    val docs = (0 until nDocs).map { i =>
      val rnd = new scala.util.Random(i)
      val text = Array.fill(40 + rnd.nextInt(40))(words(rnd.nextInt(words.length))).mkString(" ")
      Synth.doc(i.toLong, text, s"src$i")
    }.toArray

    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val idx = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val tasks = (0 until threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = idx.getAndIncrement()
            while (i < docs.length) {
              graft.core.Dispatcher.extract(docs(i))
              i = idx.getAndIncrement()
            }
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
      (System.nanoTime() - t0) / 1e9
    }

    (1 to warmups).foreach(_ => run(32)) // warmup
    seq.foreach { t =>
      val gc0 = gcMillis
      val sec = run(t)
      val gcSec = (gcMillis - gc0) / 1e3
      println(f"CORE threads=$t%2d sec=$sec%6.2f docs_per_sec=${nDocs / sec}%9.0f gc_sec=$gcSec%6.2f")
    }
  }
}
