package graft

import org.apache.spark.sql.SaveMode

import graft.spark.Pipeline

/** A/B probe for the extract-stage skew strategy: times the bench pipeline
  * with `salt = "none"` (straight-through; scan splits bound per-task cost)
  * against `salt = "heavy"` (union-of-filters isolation, which executes the
  * scan+join subtree twice — see Pipeline.saltHeavyOnly's cost caveat).
  * Interleaved draws in one JVM so host throttling hits both arms equally.
  *
  * args: [cores] [draws]   (defaults 8, 3; requires a populated bench work
  * dir — run graft.Bench once first)
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val draws = args.lift(1).map(_.toInt).getOrElse(3)
    val work = BenchCore.fastDir("graft-bench")
    val spark = BenchCore.session(cores)
    BenchCore.registerTables(spark, work)

    def timed(salt: String, out: String): Double = {
      val input = spark.table("graft_bench_input")
      val prev = spark.table("graft_bench_prev")
      val t0 = System.nanoTime()
      Pipeline.run(spark, input, prev, None,
          java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "probe", cores,
          salt = salt)
        .write.mode(SaveMode.Overwrite).parquet(out)
      (System.nanoTime() - t0) / 1e9
    }

    timed("none", s"$work/out_probe") // warmup (JIT both shapes)
    timed("heavy", s"$work/out_probe")
    val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (d <- 1 to draws; salt <- Seq("none", "heavy")) {
      val t = timed(salt, s"$work/out_probe")
      res(salt) ::= t
      println(f"[salt-probe] draw=$d salt=$salt%-5s sec=$t%7.2f")
    }
    for ((salt, ts) <- res.toSeq.sortBy(_._1))
      println(f"[salt-probe] $salt%-5s best=${ts.min}%7.2f median=${ts.sorted.apply(ts.size / 2)}%7.2f")
    BenchCore.deleteRec(new java.io.File(s"$work/out_probe"))
    spark.stop()
  }
}
