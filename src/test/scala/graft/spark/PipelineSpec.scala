package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Span
import graft.gen.{SpanGen, Synth}

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  test("end-to-end pipeline: checker families route and extract correctly") {
    val input = SpanGen.checkerDocs(spark, dir).toDF()
    val prev = SpanGen.prevState(spark, dir)
    val out = Pipeline.run(spark, input, prev, None, ts, "t1", numPartitions = 4).toDF().cache()

    // reasons present exactly per the planted families
    val reasons = out.select("doc_id", "update_reason").collect()
      .map(r => (r.getString(0).drop(1).toLong, r.getString(1))).toMap
    reasons.foreach { case (id, reason) =>
      val expected =
        if (id % 23 == 0 || id % 17 == 0) null // must have been dropped
        else if (id % 13 == 0) "FORCE_TO_EXTRACT"
        else if (id % 13 == 1) "FORCE_TO_SEND"
        else if (id % 7 == 0) "NOT_EXTRACTED_BEFORE"
        else if (id % 7 == 5) "STALE_META"
        else if (id % 7 == 6) "MISSING_FULL_TEXT"
        else if (id % 7 == 2) "DIFFERING_FULL_TEXT"
        else if (id % 7 == 3 || id % 7 == 4) "STALE_CONTENT"
        else null
      assert(reason == expected, s"doc $id")
    }
    // ignored docs never reach the output
    assert(!reasons.keys.exists(id => id % 23 == 0 || id % 17 == 0))
    // fresh un-forced docs are skipped
    assert(!reasons.keys.exists(id =>
      id % 7 == 1 && id % 13 > 1 && id % 17 != 0 && id % 23 != 0))
    // no extraction errors on the well-formed corpus
    assert(out.filter(col("error").isNotNull).count() == 0)
  }

  test("span-sequence equality: XML doc spans match the synthesized expectation exactly") {
    import spark.implicits._
    val row = SpanGen.documents(spark, dir).filter(_.doc_id % 10 == 3).head()
    val doc = Synth.doc(row.doc_id, row.text, row.source)
    val r = graft.core.Dispatcher.extract(doc).toOption.get
    val k = Synth.key(row.doc_id)
    val clean = graft.core.CleanText.run(row.text)
    val w0 = Synth.firstWord(row.text)
    val expected = Vector(
      Span("text", s"I. INTRODUCTION $clean Manual Entry 1 TABLE $k. CAP $k", null, 0),
      Span("media", null, s"fig${k}a.gif", 1),
      Span("media", null, s"fig${k}b.gif", 2),
      Span("text", s"NOTES $k", null, 3),
      Span("text", s"APPENDIX $k APP $w0", null, 4))
    assert(r.spans == expected)
  }

  test("skew salting: salted and unsalted plans produce identical results") {
    import spark.implicits._
    // make a few mega-docs by repeating text
    val docs = SpanGen.documents(spark, dir).limit(60)
      .map { r =>
        val text = if (r.doc_id % 19 == 0) (r.text + " ") * 2000 else r.text
        Synth.doc(r.doc_id, text, r.source)
      }.toDF()
      .withColumn("update_reason", lit("NOT_EXTRACTED_BEFORE"))
      .withColumn("route", lit("Standard"))

    def results(budget: Long) = {
      val salted = Pipeline.saltByCost(docs, 4, budget).as[CheckedDoc]
      Pipeline.extractStage(salted, ts, "t3").toDF()
        .select("doc_id", "fulltext", "acknowledgements")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    }
    assert(results(budgetBytesForAll) == results(1024)) // everything vs nothing salted
  }
  private val budgetBytesForAll = Long.MaxValue

  test("default run() scans the input once; salt modes duplicate the subtree") {
    import spark.implicits._
    val input = SpanGen.checkerDocs(spark, dir).toDF()
    val prev = SpanGen.prevState(spark, dir)
    // the salt operators are a union of two filters over the same child and
    // there is no Exchange for ReuseExchange to dedup, so the scan+join
    // subtree executes once per branch — the default must stay single-scan
    def leafCount(salt: String): Int =
      Pipeline.run(spark, input, prev, None, ts, "ps", 4, salt = salt)
        .queryExecution.optimizedPlan.collectLeaves().size
    val none = leafCount("none")
    assert(leafCount("heavy") > none, "salt=heavy should duplicate the scan subtree")
    assert(leafCount("all") > none, "salt=all should duplicate the scan subtree")
  }

  test("native Catalyst extract expression == typed mapPartitions stage") {
    import spark.implicits._
    val docs = SpanGen.docs(spark, dir).toDF()
      .withColumn("update_reason", lit("NOT_EXTRACTED_BEFORE"))
      .withColumn("route", lit("Standard"))
    val typed = Pipeline.extractStage(docs.as[CheckedDoc], ts, "x").toDF()
      .select("doc_id", "spans", "fulltext", "acknowledgements", "dataset", "facility", "error", "lineage")
    val native = Pipeline.extractStageNative(docs, ts, "x")
      .select("doc_id", "spans", "fulltext", "acknowledgements", "dataset", "facility", "error", "lineage")
    assert(native.exceptAll(typed).count() == 0)
    assert(typed.exceptAll(native).count() == 0)
  }

  test("lineage is deterministic across runs and partitionings") {
    import spark.implicits._
    val docs = SpanGen.docs(spark, dir).toDF()
      .withColumn("update_reason", lit("NOT_EXTRACTED_BEFORE"))
      .withColumn("route", lit("Standard"))
    def lineages(parts: Int) =
      Pipeline.extractStageNative(docs.repartition(parts, col("doc_id")), ts, "L")
        .select("doc_id", "lineage").as[(String, String)].collect().toSet
    val a = lineages(2)
    val b = lineages(7) // different physical layout, same logical rows
    assert(a == b)
    assert(a.forall { case (id, lin) => lin == s"L/$id" })
  }

  test("resume: partial output + anti-join rerun = full output, no duplicates") {
    val input = SpanGen.docs(spark, dir).toDF().limit(100).cache()
    val prev = SpanGen.prevState(spark, dir)
    val full = Pipeline.run(spark, input, prev, None, ts, "t4", 4).toDF()
      .select("doc_id").cache()
    val committed = full.limit(40).cache()
    val resumedInput = Pipeline.resume(input, committed)
    val resumed = Pipeline.run(spark, resumedInput, prev, None, ts, "t4b", 4).toDF().select("doc_id")
    val union = committed.unionAll(resumed)
    assert(union.count() == full.count())
    assert(union.distinct().count() == union.count())
    assert(union.exceptAll(full).count() == 0)
  }

  test("FORCE_TO_SEND recovers prior extraction without re-extracting (reader.py:54-101)") {
    import spark.implicits._
    // doc 14 is id%13==1 (FORCE_TO_SEND) and id%7==0
    val input = SpanGen.checkerDocs(spark, dir).toDF().filter(col("doc_id") === "D000000014")
    val prev = SpanGen.prevState(spark, dir)
    val prevOut = Seq(("D000000014", Seq(Span("text", "RECOVERED BODY", null, 0)),
      "RECOVERED BODY", "RECOVERED ACK", Seq.empty[String], Seq.empty[String]))
      .toDF("doc_id", "spans", "fulltext", "acknowledgements", "dataset", "facility")
    val out = Pipeline.run(spark, input, prev, Some(prevOut), ts, "t5", 4).toDF().collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("fulltext") == "RECOVERED BODY")
    assert(out.head.getAs[String]("lineage").contains("recovered"))
  }

  test("sink-time metrics: per-format counters ride the sink action, errors isolated (A5)") {
    import spark.implicits._
    val good = SpanGen.docs(spark, dir).toDF().limit(20)
    // one rejected-format doc -> C8 error side-channel, counted under `other`
    val bad = Seq(("DBAD", "weird", "synthetic", "/x/y.weird",
        Seq(Span("text", "payload", null, 0)), "", Synth.srcMtime(0)))
      .toDF("doc_id", "format", "provider", "source_path", "spans", "update_flag", "src_mtime")
    val docs = good.unionByName(bad, allowMissingColumns = true)
      .withColumn("update_reason", lit("NOT_EXTRACTED_BEFORE"))
      .withColumn("route", lit("Standard"))
    val out = Pipeline.extractStageNative(docs, ts, "m")
    val (observed, obs) = Pipeline.observeMetrics(out)
    val tmp = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    observed.write.mode("overwrite").parquet(tmp)
    val metrics = Pipeline.metricsFrame(spark, obs.get)
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(metrics("other") == ((0L, 1L))) // the bad doc errored, nothing else
    assert(metrics.filter(_._1 != "other").values.map(_._2).sum == 0L)
    assert(metrics.values.map(t => t._1 + t._2).sum == 21L)
    // counters agree with the written output (same action, no second pass)
    val written = spark.read.parquet(tmp)
    assert(written.filter(col("error").isNotNull).count() == 1)
    assert(written.count() == 21)
  }

  test("streaming backpressure: maxFilesPerTrigger=1 bounds each micro-batch (Q3)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bp").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cpDir = s"$tmp/cp"
    val input = SpanGen.checkerDocs(spark, dir).toDF().limit(60)
    // three separate input files -> three trigger units
    input.repartition(3).write.parquet(inDir)
    assert(new java.io.File(inDir).listFiles().count(_.getName.endsWith(".parquet")) >= 3)
    val prev = SpanGen.prevState(spark, dir)
    val q = StreamingPipeline.run(spark, inDir, outDir, cpDir, prev, ts,
      numPartitions = 4, maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    // one file per trigger -> at least 3 committed micro-batches
    val batches = new java.io.File(s"$cpDir/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 3, s"expected >=3 micro-batches, got $batches")
    // and the chunked result equals the batch run
    val streamed = spark.read.parquet(outDir).select("doc_id", "fulltext")
    val batch = Pipeline.run(spark, spark.read.parquet(inDir), prev, None, ts, "bp", 4)
      .toDF().select("doc_id", "fulltext")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming redelivery dedup: re-enqueued docs extract once under one checkpoint") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ddpipe").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cpDir = s"$tmp/cp"
    val input = SpanGen.checkerDocs(spark, dir).toDF().limit(40).cache()
    // wave 1: 40 docs; wave 2 (later micro-batch): 15 of them REDELIVERED
    // verbatim — the at-least-once upstream retry shape
    input.coalesce(1).write.mode("append").parquet(inDir)
    Thread.sleep(100)
    input.limit(15).coalesce(1).write.mode("append").parquet(inDir)
    val prev = SpanGen.prevState(spark, dir)
    val q = StreamingPipeline.run(spark, inDir, outDir, cpDir, prev, ts,
      numPartitions = 4, maxFilesPerTrigger = Some(1),
      dedupWithin = Some("1 hour"))
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(outDir).select("doc_id", "fulltext")
    // exactly the single-delivery batch result: nothing extracted twice
    assert(streamed.count() == streamed.select("doc_id").distinct().count())
    val batch = Pipeline.run(spark, input, prev, None, ts, "dd", 4)
      .toDF().select("doc_id", "fulltext")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming foreachBatch produces the same rows as the batch pipeline") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cpDir = s"$tmp/cp"
    val input = SpanGen.checkerDocs(spark, dir).toDF().limit(80)
    input.write.parquet(inDir)
    val prev = SpanGen.prevState(spark, dir)
    val q = StreamingPipeline.run(spark, inDir, outDir, cpDir, prev, ts, numPartitions = 4)
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(outDir).select("doc_id", "fulltext")
    val batch = Pipeline.run(spark, spark.read.parquet(inDir), prev, None, ts, "t6", 4)
      .toDF().select("doc_id", "fulltext")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}

class CheckerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("format derivation from source path (checker.py:260-263)") {
    import spark.implicits._
    val df = Seq("/a/b/x.PDF", "/a/b/y.tar.xml", "http://host/doc", "/a/noext")
      .toDF("source_path")
      .select(Checker.deriveFormat(col("source_path")).as("f"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("pdf", "xml", "http", ""))
  }

  test("facility NER: gazetteer matches deduped across fulltext+ack (ner.py:19-38)") {
    import spark.implicits._
    val df = Seq(("d1", "saw FAC3 and FAC12 here", "thanks FAC3")).toDF("doc_id", "fulltext", "acknowledgements")
    val out = graft.ops.FacilityNer.identify(df).collect().head
    assert(out.getSeq[String](1) == Seq("FAC12", "FAC3"))
  }
}

class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("minhash-LSH finds every planted near-duplicate pair (recall vs exact jaccard)") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    val words = filter(split(col("text"), "\\s+"), w => length(w) > 0)
    val mutated = base
      .withColumn("text", concat_ws(" ", slice(words, lit(1), size(words) - 1)))
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val uni = base.unionAll(mutated)
    val exact = graft.ops.Dedup.ngramJaccardPairs(uni).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.ops.Dedup.minhashLsh(uni).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"missing=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
  }

  test("LSH ANN finds planted near-neighbors (recall >= 0.9 where neighbors exist)") {
    import spark.implicits._
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding")).as[(Long, Seq[Float])]
    // plant 3 near-copies of each query vector (tiny deterministic noise)
    val planted = base.filter(_._1 < 10L).collect().flatMap { case (id, v) =>
      (1 to 3).map { j =>
        val rnd = new scala.util.Random(id * 10 + j)
        (100000L + id * 10 + j, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
      }
    }
    val uni = base.unionAll(planted.toSeq.toDS()).toDF("vec_id", "embedding")
    val brute = graft.ops.Similarity.bruteKnn(uni, 0L until 10L, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = graft.ops.Similarity.lshAnn(uni, 0L until 10L, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // brute top-3 are exactly the planted near-copies; LSH must recover them
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall=$recall brute=${brute.take(6)} lsh=${lsh.take(6)}")
  }

  test("multimodal feature extraction is deterministic and error-isolating") {
    import spark.implicits._
    val media = Seq(
      graft.ops.Multimodal.MediaIn("d1", "fig1.gif", graft.ops.Multimodal.synthBytes("fig1.gif")),
      graft.ops.Multimodal.MediaIn("d2", "bad", Array[Byte](1, 2)) // truncated -> error row
    ).toDS()
    val feats = graft.ops.Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats(0).decode_error == null && feats(0).width >= 64 && feats(0).feature.length == 8)
    assert(feats(1).decode_error != null && feats(1).width == -1)
    // deterministic across runs
    val again = graft.ops.Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats(0).feature.toSeq == again(0).feature.toSeq)
  }
}
