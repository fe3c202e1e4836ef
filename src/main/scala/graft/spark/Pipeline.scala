package graft.spark

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.core.{Dispatcher, Doc, ExtractedDoc, Span}

/** A checked document entering the extract stage. */
final case class CheckedDoc(
    doc_id: String,
    format: String,
    provider: String,
    source_path: String,
    spans: Seq[Span],
    update_flag: String,
    src_mtime: java.sql.Timestamp,
    update_reason: String,
    route: String
)

/** The extraction pipeline (reference lifecycle run.py -> checker -> extract
  * -> write, SURVEY.md §3.1), as one logical Spark plan:
  *
  *   read -> [checker join] -> filter -> [skew-salted repartition]
  *        -> mapPartitions(dispatch+extract) -> sink (+ lineage, metrics)
  *
  * Two shuffles total: the state join and the salted repartition. Extraction
  * itself is narrow, iterator-based, and never materializes a partition.
  */
object Pipeline {

  final case class Metrics(extracted: LongAccumulator, errors: LongAccumulator)

  def newMetrics(spark: SparkSession): Metrics = Metrics(
    spark.sparkContext.longAccumulator("graft.docs_extracted"),
    spark.sparkContext.longAccumulator("graft.docs_errored"))

  /** The accepted-format universe (reference ACCEPTED_FORMATS,
    * adsft/extraction.py:1207) — the counter dimensions of the metrics table.
    */
  val ObservedFormats: Seq[String] =
    Seq("txt", "ocr", "xml", "teixml", "html", "pdf", "http", "pdf-grobid")

  /** Counter metrics AT SINK TIME via the Observation API (SURVEY A5,
    * reference writer.py:240-253 / run.py:102-117): per-format
    * extracted/errored counters are computed inside the SAME action that
    * writes the output — no second pass over the data. Call
    * [[metricsFrame]] with `obs.get` after the sink action completes.
    */
  def observeMetrics(out: DataFrame): (DataFrame, Observation) = {
    val obs = Observation()
    val known = col("format").isin(ObservedFormats: _*)
    val aggs = ObservedFormats.map(f => col("format") === f)
      .zip(ObservedFormats)
      .flatMap { case (pred, f) =>
        Seq(
          sum(when(pred && col("error").isNull, 1L).otherwise(0L)).as(s"x_$f"),
          sum(when(pred && col("error").isNotNull, 1L).otherwise(0L)).as(s"e_$f"))
      } ++ Seq(
        // rejected-format rows (C8 error side-channel) land in `other`
        sum(when(!known && col("error").isNull, 1L).otherwise(0L)).as("x_other"),
        sum(when(!known && col("error").isNotNull, 1L).otherwise(0L)).as("e_other"),
        count(lit(1)).as("n_rows"))
    (out.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Observed counters as a queryable table: one row per format that
    * produced output, (format, n_extracted, n_errored).
    */
  def metricsFrame(spark: SparkSession, m: Map[String, Any]): DataFrame = {
    import spark.implicits._
    def cnt(k: String): Long =
      m.get(k).flatMap(Option(_)).map(_.asInstanceOf[Long]).getOrElse(0L)
    (ObservedFormats :+ "other").flatMap { f =>
      val x = cnt(s"x_$f"); val e = cnt(s"e_$f")
      if (x + e > 0) Some((f, x, e)) else None
    }.toDF("format", "n_extracted", "n_errored")
  }

  /** Skew handling (SURVEY.md §4): documents above `budgetBytes` of raw text
    * are "mega docs" (the reference's dedicated PDF queue + slow-doc problem,
    * checker.py:266-277). A document is the unit of work and cannot be split
    * across tasks, so the mitigation is placement: heavy docs are hashed over
    * their own partition range so no partition receives both a mega doc and a
    * full share of normal docs. AQE rebalances the residue.
    */
  def saltByCost(df: DataFrame, numPartitions: Int, budgetBytes: Long): DataFrame = {
    val cost = Checker.spanCost(col("spans"))
    val heavy = df.filter(cost > budgetBytes)
    val normal = df.filter(cost <= budgetBytes)
    normal.repartition(numPartitions, col("doc_id"))
      .unionAll(heavy.repartition(numPartitions, col("doc_id")))
  }

  /** Adaptive variant: parquet/Iceberg scans split by BYTES, and extraction
    * cost is proportional to bytes, so a scan-fed pipeline is already
    * cost-balanced — shuffling every payload through a full repartition
    * would only move ~all input bytes to gain nothing. Here only the heavy
    * tail shuffles (isolated onto the doc_id hash range) while normal docs
    * stay narrow in their scan partitions. Use [[saltByCost]] after KEYED
    * shuffles (count-balanced, not byte-balanced) where placement of every
    * row matters.
    *
    * COST CAVEAT: both salt operators are a union of two filters over the
    * same child, and with no Exchange boundary in the child there is nothing
    * for ReuseExchange to deduplicate — the child plan (scan, and in
    * [[run]]'s case the whole checker join) EXECUTES TWICE. That is the
    * right trade only when heavy rows exist and their placement dominates;
    * when the input is a byte-split scan (every task already holds ≤
    * maxPartitionBytes of payload, so per-task cost is bounded by
    * construction), it buys nothing — which is why [[run]] defaults to
    * `salt = "none"`.
    */
  def saltHeavyOnly(df: DataFrame, numPartitions: Int, budgetBytes: Long): DataFrame = {
    val cost = Checker.spanCost(col("spans"))
    val heavy = df.filter(cost > budgetBytes)
    val normal = df.filter(cost <= budgetBytes)
    normal.unionAll(heavy.repartition(numPartitions, col("doc_id")))
  }

  /** The extract stage: per-row dispatch inside mapPartitions over
    * Catalyst-encoded case classes (no RDD surface). Errors become rows in
    * the error side-channel (`error` column non-null) rather than task
    * failures — the reference's error-handler-queue semantics
    * (docs/Overview.md:173-175).
    *
    * `grobid`: deployments with a Grobid service route `pdf-grobid` docs
    * through the external call HERE, in the typed iterator stage — blocking
    * remote IO belongs in mapPartitions tasks (retryable, per-row error
    * isolation), never inside the codegen'd native expression, which is why
    * [[extractStageNative]] stays grobid-free (its pdf-grobid rows become
    * error rows, the reference's own disabled default).
    */
  def extractStage(ds: Dataset[CheckedDoc], indexDate: java.sql.Timestamp,
      runId: String, metrics: Option[Metrics] = None,
      grobid: Option[Dispatcher.GrobidConfig] = None): Dataset[ExtractedDoc] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val partId = TaskContext.getPartitionId()
      it.map { cd =>
        // lineage is a pure function of (runId, doc_id): stable under task
        // retry, AQE re-planning, and repartitioning — a counter-based id
        // (monotonically_increasing_id or a partition-local seq) can assign
        // the same logical row a different id on retry. part_id (below)
        // records physical placement separately.
        val lineage = s"$runId/${cd.doc_id}"
        val doc = Doc(cd.doc_id, cd.format, cd.provider, cd.source_path,
          Option(cd.spans).getOrElse(Seq.empty), cd.update_flag, cd.src_mtime)
        Dispatcher.extract(doc, graft.core.HttpExtractor.defaultTransport, grobid) match {
          case Right(r) =>
            metrics.foreach(_.extracted.add(1))
            ExtractedDoc(cd.doc_id, r.spans, r.fulltext, r.acknowledgements,
              r.dataset, r.facility, cd.update_reason, indexDate, cd.format,
              partId, lineage, null)
          case Left(err) =>
            metrics.foreach(_.errors.add(1))
            ExtractedDoc(cd.doc_id, Seq.empty, null, null, Seq.empty, Seq.empty,
              cd.update_reason, indexDate, cd.format, partId, lineage, err)
        }
      }
    }
  }

  /** Native extract stage: the [[ExtractDocExpr]] Catalyst expression runs
    * extraction without leaving Tungsten row format (no object encoder on
    * either side) — measured ~4x the row throughput of the typed
    * mapPartitions stage on the synthetic corpus. Output schema matches
    * ExtractedDoc. Prefer this in the batch pipeline; the typed stage
    * remains for API-level use and as a semantics cross-check in tests.
    */
  def extractStageNative(df: DataFrame, indexDate: java.sql.Timestamp,
      runId: String): DataFrame = {
    ExtractDocExpr.register(df.sparkSession)
    df.withColumn("_ex", expr("graft_extract(doc_id, format, provider, spans)"))
      .select(
        col("doc_id"),
        col("_ex.spans").as("spans"),
        col("_ex.fulltext").as("fulltext"),
        col("_ex.acknowledgements").as("acknowledgements"),
        col("_ex.dataset").as("dataset"),
        col("_ex.facility").as("facility"),
        col("update_reason"),
        lit(indexDate).as("index_date"),
        col("format"),
        spark_partition_id().as("part_id"),
        // deterministic lineage (see extractStage): function of the row key,
        // not of physical placement or evaluation order
        concat_ws("/", lit(runId), col("doc_id")).as("lineage"),
        col("_ex.error").as("error"))
  }

  /** Checkpoint/resume: drop inputs whose doc_id already committed to the
    * output table (reference FORCE_TO_SEND skip-if-written semantics,
    * adsft/writer.py:152-156, re-expressed as an anti-join — idempotent
    * at partition granularity because parquet/iceberg commits are atomic).
    */
  def resume(input: DataFrame, committed: DataFrame): DataFrame =
    input.join(committed.select("doc_id"), Seq("doc_id"), "left_anti")

  /** Production sink path: resume against the committed snapshot, extract
    * only what is missing, commit the increment atomically. A job killed
    * mid-write leaves stray data files no reader sees (SnapshotTable), so
    * rerunning this is exactly-once at table granularity — the Spark-native
    * equivalent of the reference's skip-if-written + temp-file-commit
    * (adsft/writer.py:40-156). Returns the new snapshot id, or -1 when
    * everything was already committed.
    */
  def runCommitted(spark: SparkSession, input: DataFrame, prevState: DataFrame,
      prevExtracted: Option[DataFrame], indexDate: java.sql.Timestamp,
      runId: String, tableDir: String, numPartitions: Int = 32): Long = {
    val todo = SnapshotTable.read(spark, tableDir) match {
      // only SUCCESSFULLY extracted rows count as done: the reference's
      // skip-if-written protocol skips written fulltext only
      // (adsft/writer.py:152-156), so error-channel rows are retried on
      // every rerun; a later success supersedes the old error row in the
      // [[SnapshotTable.readCurrent]] merge-on-read view
      case Some(committed) => resume(input, committed.filter(col("error").isNull))
      case None => input
    }
    if (todo.isEmpty) -1L
    else {
      val out = run(spark, todo, prevState, prevExtracted, indexDate, runId, numPartitions).toDF()
      // counters ride the sink action itself (observe = zero extra passes),
      // then land as a queryable sidecar table keyed by snapshot
      val (observed, obs) = observeMetrics(out)
      val snapshotId = SnapshotTable.commit(observed, tableDir)
      metricsFrame(spark, obs.get)
        .withColumn("snapshot_id", lit(snapshotId))
        .withColumn("run_id", lit(runId))
        .write.mode("append").parquet(s"$tableDir/metrics")
      snapshotId
    }
  }

  /** One-call table maintenance — the housekeeping a long-lived extraction
    * table needs between [[runCommitted]] invocations, surfaced through the
    * pipeline API so a scheduler job never reaches into [[SnapshotTable]]
    * directly:
    *
    *   1. [[SnapshotTable.compact]] folds the retry/supersede append
    *      history into a single overwrite snapshot, so the
    *      [[SnapshotTable.readCurrent]] merge-on-read cost stops growing
    *      with the number of ingest runs;
    *   2. [[SnapshotTable.vacuum]] drops manifests beyond the `keepLast`
    *      retention horizon and reclaims data files no retained manifest
    *      references. The `olderThanMs` age guard (Iceberg's orphan-file
    *      rule) is what makes this safe next to an in-flight writer:
    *      files written but not yet pointer-swapped are younger than any
    *      sane horizon, so they are never eaten.
    *
    * Both halves keep the live view byte-identical: compact refuses (and
    * this method rethrows) if a concurrent commit lands mid-rewrite, and
    * vacuum never touches the newest `keepLast` snapshots. Time travel
    * ([[SnapshotTable.readAt]]) beyond the horizon is the one thing
    * traded away — that is the point of retention.
    *
    * Returns (compacted snapshot id or -1 when already compact,
    * data files deleted, manifests deleted).
    */
  def maintain(spark: SparkSession, tableDir: String, keepLast: Int = 1,
      olderThanMs: Long = 7L * 24 * 3600 * 1000,
      keyCol: String = "doc_id"): (Long, Int, Int) = {
    val snap = SnapshotTable.compact(spark, tableDir, keyCol)
    val (files, manifests) =
      SnapshotTable.vacuum(spark, tableDir, keepLast, olderThanMs)
    (snap, files, manifests)
  }

  /** Full batch run: classify -> filter -> recover-or-extract -> extraction.
    * `prevExtracted` (the previous output snapshot) serves FORCE_TO_SEND
    * recovery (adsft/extraction.py:1212-1220): recovered rows are passed
    * through without re-extraction when prior fulltext exists.
    *
    * `salt` picks the skew strategy for the extract stage:
    *   - "none" (default): no re-shuffle. The input is a byte-split scan
    *     (parquet/Iceberg tasks hold ≤ maxPartitionBytes of payload; a row
    *     too large to share a split gets a task to itself) and extraction
    *     cost is ~linear in payload bytes, so per-task cost is bounded by
    *     the scan itself — re-shuffling would move every payload byte to
    *     improve nothing, and the union-of-filters salt operators execute
    *     the scan+join subtree twice (see [[saltHeavyOnly]]'s cost caveat).
    *   - "heavy": isolate docs above `budgetBytes` onto their own hash
    *     range ([[saltHeavyOnly]]) — for inputs whose SPLITS are count-
    *     balanced rather than byte-balanced (e.g. a row-limit-split source).
    *   - "all": full cost-based repartition ([[saltByCost]]) — after keyed
    *     shuffles where every row's placement matters.
    */
  def run(spark: SparkSession, input: DataFrame, prevState: DataFrame,
      prevExtracted: Option[DataFrame], indexDate: java.sql.Timestamp,
      runId: String, numPartitions: Int = 32,
      budgetBytes: Long = 4L << 20,
      metrics: Option[Metrics] = None,
      salt: String = "none"): Dataset[ExtractedDoc] = {
    import spark.implicits._

    val checked = Checker.filterNeedsUpdate(Checker.classify(input, prevState))

    val (toExtract, recovered) = prevExtracted match {
      case Some(prevOut) =>
        val fts = checked.filter(col("update_reason") === "FORCE_TO_SEND")
        val rec = fts.alias("c").join(
            prevOut.alias("o"),
            col("c.doc_id") === col("o.doc_id"), "inner")
          .filter(col("o.fulltext").isNotNull && length(col("o.fulltext")) > 0)
          .select(col("c.doc_id"), col("o.spans"), col("o.fulltext"),
            col("o.acknowledgements"), col("o.dataset"), col("o.facility"),
            col("c.update_reason"),
            lit(indexDate).as("index_date"), col("c.format"),
            lit(-1).as("part_id"), lit(s"$runId/recovered").as("lineage"),
            lit(null).cast("string").as("error"))
          .as[ExtractedDoc]
        val rest = checked.join(
          rec.select(col("doc_id")), Seq("doc_id"), "left_anti")
        (rest, Some(rec))
      case None => (checked, None)
    }

    val salted = salt match {
      case "all" => saltByCost(toExtract, numPartitions, budgetBytes)
      case "heavy" => saltHeavyOnly(toExtract, numPartitions, budgetBytes)
      case "none" => toExtract
      // a typo ("Heavy", "heav") must not silently disable skew handling
      case other => throw new IllegalArgumentException(
        s"""unknown salt strategy "$other": expected "none", "heavy" or "all"""")
    }
    val extracted = extractStageNative(salted, indexDate, runId).as[ExtractedDoc]
    recovered.map(extracted.unionAll).getOrElse(extracted)
  }
}
