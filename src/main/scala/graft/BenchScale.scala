package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.Synth

/** Scale-evidence harness (NOT part of the frozen driver bench): measures
  * the engine ABOVE the sf0.1 point every prior round stopped at, answering
  * "is each operator ~linear in rows?" with data instead of plan audits.
  *
  * Part A — headline pipeline at input multiples. The same amplified
  * bucketed-table build the bench uses (one file per bucket, zero-Exchange
  * state join), at `SPARK_GRAFT_SCALE_PIPE_REPLS` replication factors
  * (default "720,7200" — the bench's own 3.6 M-doc point and a 10x 36 M-doc
  * point), each timed with [[BenchCore.runPipelineOnce]] after an untimed
  * warm run. Linear scaling means docs/sec holds flat across the points.
  *
  * Part B — full-corpus query gates at corpus multiples. documents/
  * embeddings/events are replicated `SPARK_GRAFT_SCALE_CORPUS`-fold
  * (default "10,100") with disjoint ids AND per-replica word suffixes
  * (`regexp_replace(text, '(\\S+)', '$1x<k>')`), so replicas are
  * content-DISTINCT: a naive copy would plant 10-100 exact/near duplicates
  * of every doc and the dedup gates would (correctly) explode on a corpus
  * shape no real 10x crawl has. Planted-universe gates (doc_id < 200 etc.)
  * see only the original rows and stay scale-independent by design; the
  * queries measured here are the full-corpus scans.
  *
  * Output: one JSON line
  * `{"harness":"BenchScale","pipeline":[{repl,docs,sec,docs_per_sec},...],
  *   "queries":{"qNN":{"x1":s,"x10":s,"x100":s},...}}`.
  */
object BenchScale {

  /** Amplified bucketed input pair + 1/100 warm pair at `repl` — the same
    * construction (and therefore the same zero-Exchange plan preconditions)
    * as the bench's input build; kept in a repl-specific dir so the frozen
    * bench's cached input is never touched.
    */
  private def writeScaledInput(spark: SparkSession, sfDir: String, repl: Int,
      path: String): Long = {
    import spark.implicits._
    val markerTag = s"graft-scale-input v1 sf=$sfDir repl=$repl"
    val marker = new java.io.File(s"$path/input.marker")
    if (marker.exists() &&
        scala.io.Source.fromFile(marker).mkString.trim == markerTag) {
      BenchCore.registerTables(spark, path)
      return spark.table("graft_bench_input").count()
    }
    val baseRows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val nBase = baseRows.length
    val baseB = spark.sparkContext.broadcast(baseRows)
    for ((r, pre) <- Seq((repl, ""), (math.max(1, repl / 100), "warm_"))) {
      val ids = spark.range(0L, nBase.toLong * r, 1L, 256)
      val docs = ids.map { i =>
        val (bid, text, source) = baseB.value((i % nBase).toInt)
        val id = bid + (i / nBase) * 1000000L
        val t = if (id % 997 == 0) (text + " ") * 100 else text // mega-doc tail
        Synth.checkerDoc(id, t, source)
      }.toDF()
      val prev = ids.flatMap { i =>
        val bid = baseB.value((i % nBase).toInt)._1
        Synth.prevState(bid + (i / nBase) * 1000000L)
      }.toDF()
      for ((df, sub) <- Seq((docs, s"${pre}input"), (prev, s"${pre}prev"))) {
        df.repartition(BenchCore.Buckets, col("doc_id"))
          .write.bucketBy(BenchCore.Buckets, "doc_id").sortBy("doc_id")
          .option("path", s"$path/$sub")
          .mode(SaveMode.Overwrite).saveAsTable(s"graft_bench_$sub")
      }
    }
    val n = spark.table("graft_bench_input").count()
    val w = new java.io.PrintWriter(marker)
    try w.print(markerTag) finally w.close()
    n
  }

  /** Replicated corpus dir (documents/embeddings/events) at `mult`:
    * disjoint ids (offset k * 1e8) and content made replica-distinct (word
    * suffixes / embedding first-component nudges / user offsets) so the
    * scaled corpus behaves like MORE data, not like planted duplicates.
    */
  private def writeScaledCorpus(spark: SparkSession, sfDir: String, mult: Int,
      path: String): Unit = {
    val marker = new java.io.File(s"$path/corpus.marker")
    val markerTag = s"graft-scale-corpus v1 sf=$sfDir mult=$mult"
    if (marker.exists() &&
        scala.io.Source.fromFile(marker).mkString.trim == markerTag) return
    val Off = 100000000L
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    def replicas(k: Int) = {
      val d =
        if (k == 0) docs
        else docs
          .withColumn("doc_id", col("doc_id") + lit(k * Off))
          .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1x$k"))
      val e =
        if (k == 0) emb
        else emb
          .withColumn("vec_id", col("vec_id") + lit(k * Off))
          .withColumn("embedding", concat(
            array((col("embedding")(0) + lit(0.001f * k)).cast("float")),
            slice(col("embedding"), lit(2), size(col("embedding")) - 1)))
      val v =
        if (k == 0) ev
        else ev
          .withColumn("event_id", col("event_id") + lit(k * Off))
          .withColumn("user_id", col("user_id") + lit(k * Off))
      (d, e, v)
    }
    val (d0, e0, v0) = (0 until mult).map(replicas)
      .reduce((a, b) => (a._1.unionAll(b._1), a._2.unionAll(b._2), a._3.unionAll(b._3)))
    d0.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$path/documents.parquet")
    e0.repartition(8).write.mode(SaveMode.Overwrite).parquet(s"$path/embeddings.parquet")
    v0.repartition(8).write.mode(SaveMode.Overwrite).parquet(s"$path/events.parquet")
    val w = new java.io.PrintWriter(marker)
    try w.print(markerTag) finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pipeRepls = sys.env.getOrElse("SPARK_GRAFT_SCALE_PIPE_REPLS", "720,7200")
      .split(",").filter(_.nonEmpty).map(_.trim.toInt).toSeq
    val corpusMults = sys.env.getOrElse("SPARK_GRAFT_SCALE_CORPUS", "10,100")
      .split(",").filter(_.nonEmpty).map(_.trim.toInt).toSeq
    val queryNames = sys.env.getOrElse("SPARK_GRAFT_SCALE_QUERIES",
      "q01_extract_txt,q14_dedup_exact,q17_simhash,q19_lang_id,q21_token_counts," +
        "q22_fingerprint,q49_decontaminate,q50_sessionize,q52_pack_shards," +
        "q54_paragraph_dedup,q59_distinctive_terms,q98_kmv_distinct,q102_bpe_pairs," +
        "q103_term_spectrum,q111_simhash_neardup,q112_inverted_index,q113_bm25")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = BenchCore.session(cpus)

    // ---- Part A: headline pipeline scaling in input rows
    val pipeline = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    for (repl <- pipeRepls) {
      val dir = BenchCore.fastDir(s"graft-scale-$repl")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      spark.sparkContext.setJobDescription(s"scale: build input repl=$repl")
      val docs = writeScaledInput(spark, sfDir, repl, dir)
      spark.sparkContext.setJobDescription(s"scale: pipeline repl=$repl")
      BenchCore.runPipelineOnce(spark, dir, s"$dir/wout", cpus, warm = true)
      val secs = (1 to 2).map { i =>
        BenchCore.runPipelineOnce(spark, dir, s"$dir/out$i", cpus)._2
      }
      val best = secs.min
      pipeline += ((repl, docs, best))
      System.err.println(f"[scale] pipeline repl=$repl docs=$docs best=$best%.1fs " +
        f"docs_per_sec=${docs / best}%.0f (runs: ${secs.map(s => f"$s%.1f").mkString(", ")})")
      // timed outputs are transient
      Seq("wout", "out1", "out2").foreach(s => BenchCore.deleteRec(new java.io.File(s"$dir/$s")))
    }

    // ---- Part B: full-corpus gates at corpus multiples
    val qtimes = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Int, Double]]
    val dirs: Seq[(Int, String)] = (1, sfDir) +: corpusMults.map { m =>
      val d = BenchCore.fastDir(s"graft-scale-corpus-x$m")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      spark.sparkContext.setJobDescription(s"scale: build corpus x$m")
      writeScaledCorpus(spark, sfDir, m, d)
      (m, d)
    }
    for ((mult, dir) <- dirs; name <- queryNames) {
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"scale: $name x$mult")
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, dir).count(): Unit }
        catch { case e: Throwable => System.err.println(s"[scale] $name x$mult FAILED: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      qtimes.getOrElseUpdate(name,
        scala.collection.mutable.LinkedHashMap.empty[Int, Double])(mult) = secs.min
      System.err.println(f"[scale] $name x$mult best=${secs.min}%.2fs " +
        f"(runs: ${secs.map(s => f"$s%.2f").mkString(", ")})")
    }

    val pipeJson = pipeline.map { case (r, d, s) =>
      f"""{"repl":$r,"docs":$d,"sec":$s%.2f,"docs_per_sec":${d / s}%.1f}"""
    }.mkString("[", ",", "]")
    val qJson = qtimes.map { case (n, m) =>
      s""""$n":${m.map { case (k, v) => f""""x$k":$v%.3f""" }.mkString("{", ",", "}")}"""
    }.mkString("{", ",", "}")
    println(s"""{"harness":"BenchScale","sf":"$sfDir","cpus":$cpus,"pipeline":$pipeJson,"queries":$qJson}""")
    spark.stop()
  }
}
