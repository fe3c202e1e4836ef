package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus curation — the composition a release pipeline actually
  * runs, wired from the individually-gated operators so "switch to this
  * library" is one function, not a page of glue:
  *
  *   1. normalization-aware EXACT dedup ([[Dedup.normalizeForDedup]]):
  *      case/punctuation mirror copies collapse to the minimum id; losers
  *      exit as `exact_dup`, NULL-text rows as `empty`,
  *   2. NEAR-dup resolution over the survivors: [[Dedup.minhashLsh]]
  *      pairs -> [[Dedup.duplicateClusters]] components ->
  *      [[Dedup.resolveDuplicates]] best-text-wins; cluster losers exit
  *      as `near_dup`,
  *   3. quality gate: [[TextAnalysis.quality]]'s `short` bucket exits as
  *      `low_quality` (the fluent/list-like distinction is kept data —
  *      downstream mixture planning consumes it, the gate does not),
  *   4. release prep for the keepers: [[TextAnalysis.scrubPii]] redaction
  *      and [[Sampling.assignSplits]] leakage-safe splits (coherence by
  *      `coherenceCol`, so near-dup families sharing a domain land in one
  *      split).
  *
  * Every input document comes back exactly once with its fate:
  * (doc_id, status, split, text) — status in {kept, exact_dup, near_dup,
  * low_quality, empty}; split and the scrubbed text are non-null only for
  * `kept`. The stage order is load-bearing: exact dedup first (cheap,
  * shrinks the costly near-dup stage), resolution before the quality gate
  * (the resolver prefers the LONGEST family member, which the gate then
  * judges).
  *
  * Scale shape: each stage is the already-audited plan of its operator;
  * the stage-1 tagged table is eagerly localCheckpointed because every
  * status branch and all three survivor consumers (pair mining,
  * resolution, the keep join) would otherwise re-execute the corpus-wide
  * ownership aggregation + join. Numeric-id contract inherited from
  * [[Dedup.duplicateClusters]] and enforced the same way (fail fast, never
  * silently drop).
  */
object Curate {

  def curate(docs: DataFrame,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125),
      tau: Double = 0.85, coherenceCol: String = "source"): DataFrame = {
    val base = docs.select(expr("try_cast(doc_id AS BIGINT)").as("doc_id"),
      col("text"), col(coherenceCol).as("_coh"))
    val withNorm = base.withColumn("_h",
      md5(Dedup.normalizeForDedup(col("text"))))
    val owners = withNorm.filter(col("_h").isNotNull)
      .groupBy("_h").agg(min("doc_id").as("_own"))
    // checkpoint the TAGGED table once: all three status branches AND the
    // survivor set derive from it, and without the pin each branch would
    // re-execute the corpus-wide ownership aggregation + join
    val tagged = withNorm.join(owners, Seq("_h"), "left").localCheckpoint()
    // numeric-id contract (inherited from duplicateClusters), enforced the
    // same way: a NULL-casting id would silently vanish from every status
    // branch below (both =!= and === are NULL against a NULL id) — fail
    // fast instead. One bounded scan of the already-materialized table.
    if (!tagged.filter(col("doc_id").isNull).isEmpty)
      throw new IllegalArgumentException(
        "curate requires numeric doc ids (try_cast to BIGINT returned NULL " +
          "for some rows); strip any prefix before calling")
    val empties = tagged.filter(col("_h").isNull)
      .select(col("doc_id"), lit("empty").as("status"))
    val exactDups = tagged
      .filter(col("_h").isNotNull && col("doc_id") =!= col("_own"))
      .select(col("doc_id"), lit("exact_dup").as("status"))
    val surv1 = tagged
      .filter(col("_h").isNotNull && col("doc_id") === col("_own"))
      .select("doc_id", "text", "_coh")

    val clusters = Dedup.duplicateClusters(Dedup.minhashLsh(surv1, tau = tau))
    val resolved = Dedup.resolveDuplicates(
      surv1.withColumn("n_chars", length(col("text"))), clusters)
    val t2 = surv1.join(resolved.select("doc_id", "keep"), Seq("doc_id"))
    val nearDups = t2.filter(col("keep") === 0)
      .select(col("doc_id"), lit("near_dup").as("status"))
    val surv2 = t2.filter(col("keep") === 1).select("doc_id", "text", "_coh")

    val judged = TextAnalysis.quality(surv2)
    val lowQuality = judged.filter(col("quality_bucket") === "short")
      .select(col("doc_id"), lit("low_quality").as("status"))
    val keepers = judged.filter(col("quality_bucket") =!= "short")
      .select("doc_id", "text", "_coh")

    val kept = Sampling.assignSplits(keepers, splits, coherenceCol = "_coh")
      .select(col("doc_id"), lit("kept").as("status"), col("split"),
        TextAnalysis.scrubPii(col("text")).as("text"))

    val nullS = lit(null).cast("string")
    Seq(empties, exactDups, nearDups, lowQuality)
      .map(_.withColumn("split", nullS).withColumn("text", nullS))
      .reduce(_ unionByName _)
      .unionByName(kept)
  }
}
