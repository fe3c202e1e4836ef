package graft

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.gen.Synth

/** Spark-free scaling probe of the pure extraction kernel: same docs, plain
  * thread pools at several sizes. Separates core-code / GC contention from
  * Spark-layer effects.
  */
object CoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(60000)
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

    run(8) // warmup
    Seq(1, 8, 32, 8, 32).foreach { t =>
      val sec = run(t)
      println(f"CORE threads=$t%2d sec=$sec%6.2f docs_per_sec=${nDocs / sec}%9.0f")
    }
  }
}
