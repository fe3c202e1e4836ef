package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation.
  *
  * These extend the engine beyond the reference's own operator set (the
  * reference dedups only xpath results in-row, adsft/extraction.py:925-935;
  * a 10^12-doc corpus needs document-level dedup). All plans are
  * shuffle-conscious: map-side combine on every groupBy, explicit candidate
  * generation before any pairwise work, and LSH so the pairwise stage never
  * sees the full corpus at scale.
  */
object Dedup {

  /** Exact duplicate groups by content hash. One shuffle (hash groupBy with
    * partial aggregation). Output: one row per distinct text.
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))

  /** Dedup-normalization kernel (the CCNet preprocessing rule): lowercase,
    * squash every non-alphanumeric run to one space, trim. Two documents
    * differing only in case, punctuation, or whitespace normalize to the
    * same string — the variants raw-byte hashing misses. Pure codegen'd
    * column expression; the character class is ASCII-explicit so Java
    * regex (Spark) and RE2 (DuckDB oracle) agree byte-for-byte.
    */
  def normalizeForDedup(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** [[exact]] over the [[normalizeForDedup]] canonical form: one shuffle
    * (hash groupBy with map-side combine), same output shape. This is the
    * first pass of a curation pipeline — cheap, and at web scale it
    * collapses the case/punctuation mirror copies that would otherwise
    * all flow into the (much costlier) near-dup stage.
    */
  def exactNormalized(docs: DataFrame, textCol: String = "text"): DataFrame =
    exact(docs.withColumn(textCol, normalizeForDedup(col(textCol))), textCol)

  /** Incremental-ingest exact dedup: drop new-batch docs whose content hash
    * already exists in the historical fingerprint store, AND collapse
    * duplicates arriving within the batch itself (first id per hash wins —
    * deterministic, so reruns are idempotent). Returns the surviving rows
    * plus their `text_hash`, which the caller appends back to the store so
    * the next batch dedups against it — the standing pattern for a corpus
    * that grows by daily crawls.
    *
    * Scale shape: within-batch collapse is `min(struct(id, rest…))` per
    * hash — an aggregation, NOT a window — so map-side partial aggregation
    * collapses duplicates BEFORE the shuffle and a hot hash (millions of
    * identical docs in one batch) costs each task one buffered row instead
    * of one window partition. The anti-join then shares the aggregation's
    * key, and the store side ships only its hash column (or broadcasts
    * while small — AQE decides from runtime sizes). No driver-side state,
    * no collect.
    */
  def incrementalExact(newDocs: DataFrame, seenHashes: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val hashed = newDocs.withColumn("text_hash", md5(col(textCol)))
    // struct comparison is lexicographic on fields, so leading with the id
    // makes min() "first id wins"; ids are unique so later fields never
    // decide the order, they just ride along
    val rest = hashed.columns.filterNot(_ == "text_hash")
    val ordered = Seq(idCol) ++ rest.filterNot(_ == idCol)
    val firstPerHash = hashed
      .groupBy("text_hash")
      .agg(min(struct(ordered.map(col): _*)).as("_row"))
      .select(col("text_hash") +: rest.map(c => col(s"_row.$c").as(c)): _*)
    firstPerHash.join(
      seenHashes.select(col("text_hash")).distinct(), Seq("text_hash"), "left_anti")
  }

  /** [[incrementalExact]] with a Bloom runtime filter — the 100-TB shape of
    * "dedup today's batch against the all-time fingerprint store". The
    * plain anti-join shuffles the ENTIRE store's hash column every run even
    * when the batch is a millionth of it; here the filter runs in the
    * cheap direction (the same direction as Spark's own runtime
    * row-filtering): the BATCH's hashes — the small side, with exact
    * driver-known cardinality — are summarized into a Bloom filter, the
    * filter is broadcast, and the store is pruned MAP-SIDE before its
    * exchange to only the hashes that might appear in the batch. The one
    * anti-join then shuffles |batch ∩ store| + fpp x |store| store rows
    * instead of all of them, and the batch side is unchanged.
    *
    * The OUTPUT is exactly [[incrementalExact]]'s — a false positive only
    * lets a store row through to the join, where the exact key comparison
    * settles it; a batch row whose hash is NULL never matches any anti-join
    * key and passes through on both paths — which is what keeps this
    * oracle-gateable (q60 shares q44's oracle semantics).
    *
    * Costs: the batch pipeline is evaluated twice (once to build the
    * filter, once under the join) — two passes over the SMALL side in
    * exchange for not shuffling the large one; the filter itself is
    * ~1.44 x log2(1/fpp) bits per expected batch hash (MBs for
    * ingest-sized batches) on the driver and each executor.
    */
  def incrementalExactBloom(newDocs: DataFrame, seenHashes: DataFrame,
      expectedBatchItems: Long, fpp: Double = 0.01,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = newDocs.sparkSession
    // within-batch first-id-wins collapse: identical to incrementalExact
    val hashed = newDocs.withColumn("text_hash", md5(col(textCol)))
    val rest = hashed.columns.filterNot(_ == "text_hash")
    val ordered = Seq(idCol) ++ rest.filterNot(_ == idCol)
    val firstPerHash = hashed
      .groupBy("text_hash")
      .agg(min(struct(ordered.map(col): _*)).as("_row"))
      .select(col("text_hash") +: rest.map(c => col(s"_row.$c").as(c)): _*)
    // the filter is built over the batch's NON-NULL hashes only: a null
    // hash never matches an anti-join key, so it needs no representation.
    // NATIVE build + probe (bloom_filter_agg / might_contain — the same
    // expressions behind Spark's own runtime join filters): the store-side
    // prune stays inside WholeStageCodegen instead of falling out to a
    // ScalaUDF row-at-a-time probe. The one-row aggregate is the SAME
    // single driver action the previous stat.bloomFilter build paid, and
    // its NULL result on an empty batch replaces the separate isEmpty()
    // pre-check action. Both sides hash with xxhash64 over the md5 string;
    // a store row with NULL hash may pass the probe (xxhash64(NULL) is the
    // seed) but can never match the anti-join key — output-invisible.
    import org.apache.spark.sql.GraftColumnBridge
    val bloomBytes = firstPerHash.filter(col("text_hash").isNotNull)
      .select(GraftColumnBridge.bloomFilterAgg(
        xxhash64(col("text_hash")), expectedBatchItems, fpp))
      .head.getAs[Array[Byte]](0)
    if (bloomBytes == null) return firstPerHash // no non-null hashes: no-op join
    val prunedStore = seenHashes.select(col("text_hash"))
      .filter(GraftColumnBridge.mightContain(bloomBytes, xxhash64(col("text_hash"))))
      .distinct()
    firstPerHash.join(prunedStore, Seq("text_hash"), "left_anti")
  }

  /** Distinct word n-gram shingles per doc, exploded to (doc_id, shingle).
    * ONE codegen'd kernel call per row ([[TextFunctions.wordShingles]] —
    * same semantics as the previous higher-order-function column chain,
    * whose interpreted `filter(split(text))` got cloned into a
    * pre-Generate filter at every `words` reference by
    * InferFiltersFromGenerate: ~3 full regex splits PER SHINGLE INDEX per
    * row, 8.6 s for a 5,000-doc corpus vs 0.2 s materialized). Documents
    * shorter than `n` words emit NO shingles (the kernel returns an empty
    * array, which `explode` drops — they cannot contain an n-gram).
    * Consumers re-join against the full doc set where every-row output is
    * needed (decontaminate), or correctly treat shingle-less docs as
    * never-candidates (minhashLsh, ngramJaccardPairs).
    */
  def shingled(docs: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.spark.TextFunctions.wordShingles(col(textCol), n)).as("shingle"))

  /** Benchmark decontamination: flag corpus docs sharing any word `n`-gram
    * with an evaluation set (the standard pre-training hygiene pass — an
    * eval example appearing verbatim or near-verbatim in training data
    * poisons the benchmark). Output: every input row plus
    * `n_hit_shingles` (distinct contaminated n-grams in the doc) and
    * `contaminated` (0/1).
    *
    * Scale shape: the eval side is SMALL (benchmarks are thousands of
    * examples) — its distinct shingles are broadcast, so the corpus is
    * scanned once, the semi-join is map-side, and the only shuffle is the
    * per-doc hit count (map-side combine; cardinality bounded by hits, not
    * corpus size). The docs-side re-join is on the already-partitioned
    * doc_id. No driver-side state beyond the broadcast.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, n: Int = 8,
      textCol: String = "text"): DataFrame = {
    val evalShingles = shingled(evalDocs, n, textCol)
      .select(col("shingle")).distinct()
    val hits = shingled(docs, n, textCol)
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_shingles"))
    docs.join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit_shingles", coalesce(col("n_hit_shingles"), lit(0L)))
      .withColumn("contaminated", when(col("n_hit_shingles") > 0, 1).otherwise(0))
  }

  /** Exact pairwise n-gram Jaccard over a (bounded) universe: self-join on
    * shingle -> pair intersection counts -> |A∪B| via per-doc sizes. The
    * shingle join is the scale bottleneck by design — use [[minhashLsh]] to
    * produce candidates first on a full corpus.
    * Output: (doc_a, doc_b) with jaccard >= tau, doc_a < doc_b.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, tau: Double = 0.85): DataFrame = {
    // deliberately NOT cached: the shingle map is a narrow codegen'd
    // projection, and recomputing it for the sizes agg + both join sides is
    // cheaper than materializing a corpus-sized cache (and leaks nothing —
    // a session-lifetime .cache() here held blocks until shutdown)
    val sh = shingled(docs, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.alias("a").join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .filter(col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c")) >= tau)
      .select("doc_a", "doc_b")
  }

  /** Deterministic 32-bit shingle hash with seed (pure, also usable in tests). */
  @inline def seededHash(s: String, seed: Int): Int =
    scala.util.hashing.MurmurHash3.stringHash(s, seed)

  /** Size-bounded bucket aggregation shared by [[minhashLsh]] and
    * [[embeddingNearDup]]: group (id, bucket) assignments into
    * (bucket, ids[<=maxBucket], truncated) WITHOUT ever materializing an
    * unbounded bucket in an aggregation buffer. A plain
    * `groupBy(bucket).agg(collect_list(id))` holds the ENTIRE bucket in one
    * in-memory buffer before any cap applies — on a degenerate hot bucket
    * (millions of near-identical docs sharing a band key) that is an
    * executor OOM, not graceful truncation. Here a `row_number()` window
    * over the same shuffle key ranks ids per bucket first (WindowExec sorts
    * with an external spillable sorter — O(1) memory per row), rows beyond
    * `maxBucket + 1` are dropped BEFORE aggregation, and the surviving
    * collect_list buffer is bounded at `maxBucket` elements by construction.
    * The sentinel `maxBucket + 1` row keeps the `truncated` flag exact
    * (max(rn) > maxBucket  <=>  bucket size > maxBucket) without a second
    * full count. Same shuffle key throughout — one Exchange, no extra pass.
    * Output ids are the smallest `maxBucket` ids of the bucket, ascending —
    * identical to the previous `ids.sorted.take(maxBucket)` semantics.
    */
  private[ops] def boundedBuckets(assignments: DataFrame, idCol: String,
      maxBucket: Int): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
    assignments
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxBucket + 1)
      .groupBy("bucket")
      .agg(
        sort_array(collect_list(when(col("rn") <= maxBucket, col(idCol)))).as("ids"),
        max("rn").as("_maxrn"))
      .filter(size(col("ids")) > 1)
      .select(col("bucket"), col("ids"),
        (col("_maxrn") > maxBucket).cast("int").as("truncated"))
  }

  /** MinHash + banded LSH near-duplicate detection, verified by exact
    * Jaccard. numPerm = bands * rowsPerBand signatures; a pair becomes a
    * candidate when any band agrees. With 16 bands x 4 rows, a pair at
    * jaccard 0.85 is missed with probability (1-0.85^4)^16 ≈ 7e-6, so the
    * verified output matches the exact-Jaccard oracle.
    *
    * Plan: one typed map computes the signature per doc (no shuffle), one
    * shuffle ranks-and-groups band buckets with BOUNDED buffers
    * ([[boundedBuckets]] — a degenerate hot bucket truncates gracefully
    * instead of OOMing an executor; overflow counted, never silent), pairs
    * are generated per capped bucket, one join brings texts back for exact
    * verification.
    */
  /** MinHash band-signature table: one row per (doc, band) with the band's
    * bucket key — the persisted artifact of an LSH dedup store ([[
    * minhashLsh]] derives it in-flight; [[incrementalMinhash]] joins a
    * fresh batch against the historical corpus's standing table, which the
    * ingest pipeline maintains by appending each surviving batch's
    * signatures). One typed map per doc, no shuffle; a doc shorter than
    * `n` words — or with NULL text — emits no rows (nothing to sign, and
    * the never-a-candidate contract for shingle-less docs).
    */
  def signBands(docs: DataFrame, n: Int = 3, bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val numPerm = bands * rowsPerBand
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val words =
          if (text == null) Array.empty[String]
          else text.split(TextAnalysis.WhitespaceRe).filter(_.nonEmpty)
        val shingles: Iterator[String] =
          if (words.length < n) Iterator.empty
          else (0 to words.length - n).iterator.map(i => words.slice(i, i + n).mkString(" "))
        val mins = Array.fill(numPerm)(Int.MaxValue)
        shingles.foreach { s =>
          var p = 0
          while (p < numPerm) {
            val h = seededHash(s, p)
            if (h < mins(p)) mins(p) = h
            p += 1
          }
        }
        val keys =
          if (words.length < n) Array.empty[Long]
          else Array.tabulate(bands) { b =>
            val slice = java.util.Arrays.copyOfRange(mins, b * rowsPerBand, (b + 1) * rowsPerBand)
            (b.toLong << 32) | (scala.util.hashing.MurmurHash3.arrayHash(slice, 98765).toLong & 0xffffffffL)
          }
        (id, keys)
      }.toDF("doc_id", "band_keys")
      .select(col("doc_id"), explode(col("band_keys")).as("bucket"))
  }

  def minhashLsh(docs: DataFrame, n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      tau: Double = 0.85, maxBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val buckets = boundedBuckets(
      signBands(docs, n, bands, rowsPerBand), "doc_id", maxBucket)

    val candidates = buckets.select(col("ids"), col("truncated"))
      .as[(Seq[Long], Int)]
      .flatMap { case (ids, tr) =>
        for (i <- ids.indices.iterator; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j), tr)
      }.toDF("doc_a", "doc_b", "truncated")
      .groupBy("doc_a", "doc_b").agg(max("truncated").as("truncated"))

    // exact verification (adversarial check of every candidate)
    val texts = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val verified = candidates
      .join(texts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), "doc_a")
      .join(texts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("truncated"), col("text_a"), col("text_b"))
      .as[(Long, Long, Int, String, String)]
      .flatMap { case (a, b, _, ta, tb) =>
        val j = jaccard(ta, tb, n)
        if (j >= tau) Some((a, b)) else None
      }.toDF("doc_a", "doc_b")
    verified
  }

  /** Incremental NEAR-dup detection: flag new-batch documents that are
    * near-duplicates of the historical corpus — [[incrementalExact]]'s
    * semantics lifted from hash equality to MinHash/Jaccard similarity,
    * the shape of "dedup today's crawl against the all-time corpus".
    * The store enters through its PRECOMPUTED band-signature table
    * `storeSig` (one [[signBands]] pass when the store was built, then
    * appended per surviving ingest — never re-signed here: per-call work
    * on the store is one scan of its signature TABLE, not a re-hash of
    * its text) plus a `storeTexts` (doc_id, text) relation consulted only
    * for the candidate-sized exact-verify lookup.
    *
    * Plan: one typed map signs the batch (no shuffle, O(batch)); the
    * store signature table is capped at `maxBucket` ids per bucket
    * (row_number — the [[boundedBuckets]] bound, applied store-side so a
    * degenerate hot bucket bounds the join fan-out instead of exploding
    * it; the overflow is COUNTED into a per-bucket flag, never silent);
    * ONE equi-join on the bucket key yields candidates (batch docs carry
    * <= `bands` buckets each, so candidates <= |batch| x bands x
    * maxBucket); exact Jaccard against the store text verifies every
    * candidate; one groupBy(batch id) takes the minimum matching store
    * id. The batch side is ingest-sized — broadcastable.
    *
    * Output: (doc_id, dup_of, truncated) — one row per batch doc with at
    * least one store near-dup at `tau`; dup_of = the smallest matching
    * store id; truncated = 1 if any bucket this doc matched through
    * overflowed `maxBucket` (the store list was cut there, so an even
    * smaller store match may exist unseen). Callers anti-join the batch
    * against it to keep the novel docs.
    */
  /** Shared batch-vs-store candidate generation for the incremental
    * near-dup operators: the store's signature table is capped at
    * `maxBucket` ids per bucket (row_number with a maxBucket+1 sentinel so
    * the overflow is COUNTED into a per-bucket `_btrunc` flag, never
    * silent), then ONE equi-join on the bucket key against the batch's
    * signatures, collapsed to distinct (batch id, store_id) pairs with the
    * truncation flag OR-ed across the buckets they met in. Both modalities
    * (text bands, embedding hyperplanes) share this exact contract — one
    * implementation so the sentinel/flag semantics cannot drift.
    */
  private def cappedStoreCandidates(batchSig: DataFrame, storeSig: DataFrame,
      idCol: String, maxBucket: Int): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy(idCol)
    val marked = storeSig
      .select(col(idCol).cast("long").as(idCol), col("bucket"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxBucket + 1)
    val flags = marked.groupBy("bucket")
      .agg((max("rn") > maxBucket).cast("int").as("_btrunc"))
    val cappedStore = marked.filter(col("rn") <= maxBucket)
      .join(flags, Seq("bucket"))
      .select(col("bucket"), col(idCol).as("store_id"), col("_btrunc"))
    batchSig.join(cappedStore, Seq("bucket"))
      .groupBy(idCol, "store_id").agg(max("_btrunc").as("_trunc"))
  }

  def incrementalMinhash(batch: DataFrame, storeSig: DataFrame,
      storeTexts: DataFrame, n: Int = 3, bands: Int = 16,
      rowsPerBand: Int = 4, tau: Double = 0.85,
      maxBucket: Int = 64): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val candidates = cappedStoreCandidates(
      signBands(batch, n, bands, rowsPerBand), storeSig, "doc_id", maxBucket)
    val batchTexts = batch.select(col("doc_id").cast("long").as("doc_id"),
      col("text").as("_bt"))
    val stTexts = storeTexts.select(col("doc_id").cast("long").as("store_id"),
      col("text").as("_st"))
    candidates
      .join(batchTexts, "doc_id").join(stTexts, "store_id")
      .select(col("doc_id"), col("store_id"), col("_trunc"), col("_bt"), col("_st"))
      .as[(Long, Long, Int, String, String)]
      .flatMap { case (b, s, tr, tb, ts) =>
        // a NULL store text (signature table out of sync with the text
        // relation) can never verify — dropped, not an NPE
        if (tb != null && ts != null && jaccard(tb, ts, n) >= tau)
          Some((b, s, tr))
        else None
      }.toDF("doc_id", "store_id", "_trunc")
      .groupBy("doc_id").agg(min("store_id").as("dup_of"),
        max("_trunc").as("truncated"))
  }

  /** Duplicate-cluster resolution: connected components over a near-dup
    * pair graph, labeling every doc with the minimum doc_id reachable from
    * it (the canonical representative). This is the step that turns
    * pairwise dedup output into "keep one per group" at corpus scale.
    *
    * Algorithm: min-label propagation with pointer jumping (path halving).
    * Each round (a) takes the min label over self + neighbors, then (b)
    * replaces every label by its label's own label — the jump collapses
    * chains so a path of length D resolves in O(log D) rounds, not O(D)
    * (pure one-hop propagation would exhaust `maxIters` on a long chained
    * near-dup cluster and silently return split components). Convergence
    * detection rides the same pass: the previous label is carried through
    * the aggregation and the round's single action both materializes the
    * checkpoint and counts changed labels. Non-convergence within
    * `maxIters` throws — never a silently wrong clustering. No driver-side
    * graph state: everything stays distributed.
    *
    * Input: pairs (doc_a, doc_b). Output: (doc_id, cluster_id) for every
    * doc appearing in a pair, cluster_id = min doc_id of its component.
    */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // undirected edge list, both directions. Eagerly materialized ONCE:
    // `pairs` is typically the output of a whole pair-mining pipeline
    // (LSH bucketing + exact verification), and every propagation round
    // joins against edges — without the checkpoint each round would
    // re-execute that entire upstream pipeline (measured 28.7 s for a
    // 180-doc q36 profile; unbounded at corpus scale)
    val srcA = expr("try_cast(doc_a AS BIGINT)")
    val dstB = expr("try_cast(doc_b AS BIGINT)")
    val edges = pairs.select(srcA.as("src"), dstB.as("dst"))
      .unionAll(pairs.select(dstB.as("src"), srcA.as("dst")))
      .distinct()
      .localCheckpoint()
    // numeric-id contract, enforced: min-label propagation needs a totally
    // ordered id domain, so doc ids are cast to long — a non-numeric string
    // id (e.g. "D000000007") try_casts to NULL (in ANSI and legacy mode
    // alike) and would silently produce a degenerate clustering. Fail fast
    // with a clear message instead (the count scans only the
    // already-materialized checkpoint, no upstream recompute).
    val nullIds = edges.filter(col("src").isNull || col("dst").isNull).count()
    if (nullIds > 0)
      throw new IllegalArgumentException(
        s"duplicateClusters: $nullIds edge endpoint(s) are not castable to long; " +
          "doc_a/doc_b must be numeric ids (strip any prefix before calling)")
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // min label among self and neighbors; the previous label rides along
      // as `old` (each doc has exactly one labels row, and viaEdges rows
      // carry MaxValue, so min(old) is exactly the previous label)
      val viaEdges = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("label"), lit(Long.MaxValue).as("old"))
      val oneHop = labels.select(col("doc_id"), col("label"), col("label").as("old"))
        .unionAll(viaEdges)
        .groupBy("doc_id").agg(min("label").as("label"), min("old").as("old"))
      // pointer jump: label <- label(label). Every label value is a node id,
      // and a node's own label only decreases, so the jump is monotone.
      val next = oneHop
        .join(oneHop.select(col("doc_id").as("label"), col("label").as("plabel")),
          Seq("label"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("plabel"), col("label"))).as("label"),
          col("old"))
        .localCheckpoint(eager = false) // lineage cut; materialized by the count
      changed = next.filter(col("label") =!= col("old")).count() // the round's ONE job
      labels = next.select("doc_id", "label")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"duplicateClusters did not converge within maxIters=$maxIters rounds; " +
          "component diameter exceeds the iteration budget — raise maxIters")
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Corpus-level exact paragraph dedup (the line-dedup pass of
    * CCNet/RefinedWeb-style curation): across the WHOLE corpus, each
    * distinct paragraph of at least `minLen` chars is kept only at its
    * first occurrence (smallest (doc_id, position)); every later copy is
    * dropped and documents are rebuilt in original paragraph order.
    * Boilerplate repeated across a crawl (nav menus, cookie banners,
    * copyright footers) survives in exactly one document. Paragraphs
    * shorter than `minLen` are structural (blank lines, headings) and pass
    * through untouched. Output: (doc_id, text, n_paras_kept) for EVERY
    * input doc — a fully-boilerplate doc comes back with empty text and
    * n_paras_kept = 0 rather than vanishing silently.
    *
    * Scale shape: ownership is an AGGREGATION on the paragraph hash —
    * `min(struct(doc_id, pos))` with map-side partial aggregation, so a
    * paragraph duplicated a billion times costs each map task one buffered
    * row, never a window partition (same skew lesson as
    * [[incrementalExact]]). The keep-decision join shares that hash key
    * (sort-merge; a hot paragraph is an AQE-splittable skewed join, not a
    * single window task), the rebuild groups by doc_id with collect_list
    * bounded by the document's own paragraph count, and the final
    * left join re-attaching empty docs reuses the doc_id partitioning.
    */
  def paragraphDedup(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minLen: Int = 10): DataFrame = {
    val paras = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "para")))
    val eligible = paras.filter(length(col("para")) >= minLen)
      .withColumn("h", md5(col("para")))
    val owners = eligible.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    val keptEligible = eligible.join(owners, "h")
      .filter(col("first.doc_id") === col("doc_id") && col("first.pos") === col("pos"))
      .select("doc_id", "pos", "para")
    val kept = keptEligible.unionByName(
      paras.filter(length(col("para")) < minLen))
    val rebuilt = kept.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("para")))).as("_ps"),
        count(lit(1)).as("n_paras_kept"))
      .select(col("doc_id"),
        concat_ws("\n", transform(col("_ps"), p => p("para"))).as(textCol),
        col("n_paras_kept"))
    docs.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_paras_kept"), lit(0L)).as("n_paras_kept"))
  }

  /** Cluster-size histogram over a [[duplicateClusters]] labeling — the
    * release-dashboard view of a dedup pass: how many duplicate families
    * exist at each size, and how many documents a keep-one-per-cluster
    * policy would remove. A heavy tail here (a few giant families) is the
    * signature of template/mirror content; a flat histogram of pairs is
    * ordinary near-duplication.
    *
    * Scale shape: two cascaded aggregations (cluster -> size, size ->
    * count), both with map-side partials and constant-size buffers; the
    * second input is one row per CLUSTER, the output one row per distinct
    * size. No window, no join, no driver state.
    *
    * Output: (cluster_size, n_clusters, n_docs_removable); sizes are
    * >= 2 because [[duplicateClusters]] labels only paired docs.
    */
  def clusterSizeHistogram(clusters: DataFrame): DataFrame =
    clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * (col("cluster_size") - 1)).as("n_docs_removable"))

  /** Corpus-frequency boilerplate removal — the OTHER standard line-level
    * pass (CCNet's "drop lines shared by many documents", complementing
    * [[paragraphDedup]]'s keep-one-owner rule): a line occurring in more
    * than `maxDocFreq` DISTINCT documents is navigation / cookie-banner /
    * footer boilerplate and is removed from EVERY document (no surviving
    * owner — the line is noise, not content). Lines shorter than `minLen`
    * chars bypass the rule, like paragraphDedup's short-line guard.
    *
    * Scale shape: one posexplode (O(corpus lines)); the document-frequency
    * count is an aggregation on the line hash — count(distinct doc_id)
    * plans as a two-phase expand + partial aggregate, so a line repeated a
    * billion times still combines map-side; membership is a LEFT ANTI join
    * on the same hash key (the frequent set is tiny — AQE broadcasts it);
    * the rebuild is one groupBy(doc_id) whose buffer is bounded by the
    * document's own line count. Every input doc comes back (possibly
    * empty), so the output substitutes 1:1 for the input.
    *
    * Output: (doc_id, text, n_lines_removed).
    */
  def removeFrequentLines(docs: DataFrame, maxDocFreq: Int = 2,
      minLen: Int = 10, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val lines = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val eligible = lines.filter(length(col("line")) >= minLen)
      .withColumn("h", md5(col("line")))
    val frequent = eligible.groupBy("h")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") > maxDocFreq)
      .select("h")
    val kept = eligible.join(frequent, Seq("h"), "left_anti")
      .select("doc_id", "pos", "line")
      .unionByName(lines.filter(length(col("line")) < minLen))
    val rebuilt = kept.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("line")))).as("_ps"),
        count(lit(1)).as("_n_kept"))
      .select(col("doc_id"),
        concat_ws("\n", transform(col("_ps"), p => p("line"))).as(textCol),
        col("_n_kept"))
    // NULL text has no lines: _n0 coalesces to 0 (size(split(NULL)) is
    // NULL under ANSI, -1 under legacy — both wrong as a count), so the
    // output row is (id, '', 0), keeping the 1:1 substitution contract
    docs.select(col(idCol).as("doc_id"),
        coalesce(size(split(col(textCol), "\n")).cast("long"), lit(0L)).as("_n0"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col(textCol), lit("")).as(textCol),
        (col("_n0") - coalesce(col("_n_kept"), lit(0L))).as("n_lines_removed"))
  }

  /** Corpus-duplicated n-gram coverage — the measurement half of
    * substring-level dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): for every document, how many of its
    * word n-gram occurrences also occur ELSEWHERE in the corpus (or again
    * in the same document), and how many of its token positions are covered
    * by at least one such duplicated n-gram. A doc with high
    * `covered_tokens / n_tokens` is mostly made of text the corpus already
    * contains — the filter signal substring dedup acts on. All counts are
    * integers, so a cross-engine oracle hash-compares exactly.
    *
    * Scale shape: one positioned-shingle explode (cardinality O(corpus
    * tokens)); duplicate detection is an aggregation on the shingle hash
    * (map-side combine — a shingle repeated a billion times costs each map
    * task one buffer row); the membership join is a sort-merge on the same
    * shingle key (hot shingles are AQE-splittable); coverage expands each
    * surviving occurrence to its n positions (bounded x n) and both
    * per-doc distinct counts ride ONE groupBy(doc_id) — Spark plans the
    * two count-distincts as a single expand + two-phase aggregate, never a
    * per-doc window or buffer beyond the doc's own length. Every input doc
    * comes back (zero-duplication docs with zeros), so the output is
    * directly joinable as a per-doc feature.
    *
    * Output: (doc_id, n_tokens, n_dup_ngrams, covered_tokens).
    */
  /** Positioned n-gram occurrences `(doc_id, i, sh)` over a
    * `(doc_id, w)` token table, plus the corpus-duplicated shingle set —
    * the derivation shared by [[duplicatedNgramCoverage]] (measurement)
    * and [[removeDuplicatedNgrams]] (action). Documents shorter than `n`
    * tokens are filtered out BEFORE the shingle transform: they cannot
    * contain an n-gram, and the unguarded `sequence(0, size - n)` is NOT
    * empty when `size < n` — Spark's `sequence` steps BACKWARDS
    * (`[0, -1]`), which under default ANSI mode turns `w(i + j)` into an
    * INVALID_ARRAY_INDEX job failure (and with ANSI off fabricates two
    * self-duplicating shingles that mark every short doc as duplicated).
    */
  private def dupShingleOccurrences(toks: DataFrame, n: Int): (DataFrame, DataFrame) = {
    val occ = toks
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ", (0 until n).map(j => col("w")(i + j)): _*)))
        .as(Seq("i", "sh")))
    val dup = occ.groupBy("sh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("sh")
    (occ, dup)
  }

  def duplicatedNgramCoverage(docs: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val (occ, dup) = dupShingleOccurrences(
      docs.select(col(idCol).as("doc_id"), ws.as("w")), n)
    val stats = occ.join(dup, "sh")
      .select(col("doc_id"), col("i"),
        explode(sequence(col("i"), col("i") + (n - 1))).as("p"))
      .groupBy("doc_id")
      .agg(countDistinct("i").as("n_dup_ngrams"),
        countDistinct("p").as("covered_tokens"))
    docs.select(col(idCol).as("doc_id"), size(ws).as("n_tokens"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_ngrams"), lit(0L)).as("n_dup_ngrams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
  }

  /** Substring-dedup REMOVAL — the action half of
    * [[duplicatedNgramCoverage]] (Lee et al. 2022's ExactSubstr dedup,
    * approximated at word n-gram granularity): rebuild every document's
    * text with the tokens covered by corpus-duplicated n-grams REMOVED, so
    * a training corpus keeps each long repeated passage zero times rather
    * than once-per-copy. Deterministic function of the corpus; docs whose
    * text is entirely duplicated come back with empty text (a downstream
    * length filter drops them), untouched docs come back verbatim modulo
    * whitespace normalization.
    *
    * Scale shape: the duplicate-shingle derivation is shared with the
    * coverage measurement (one positioned-shingle explode, one map-side-
    * combined aggregation, one sort-merge membership join). Covered
    * positions feed the token stream through a LEFT ANTI join on
    * (doc_id, position) — anti-join semantics make the right side's
    * duplicate rows harmless, so no distinct pass is needed. The rebuild
    * is one groupBy(doc_id) whose `collect_list(struct(p, tok))` buffer is
    * bounded by the DOCUMENT's own length (the same bound as the text
    * column itself — this is per-doc state, not per-bucket state, and a
    * document that fits in a row fits in the buffer). No windows, no
    * driver state.
    *
    * Output: (doc_id, text_deduped, n_tokens, n_removed) — every input
    * doc exactly once.
    */
  def removeDuplicatedNgrams(docs: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val toks = docs.select(col(idCol).as("doc_id"), ws.as("w"))
    val (occ, dup) = dupShingleOccurrences(toks, n)
    val covered = occ.join(dup, "sh")
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (n - 1))).as("p"))
    val tokens = toks.select(col("doc_id"), posexplode(col("w")).as(Seq("p", "tok")))
    val kept = tokens.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x("tok"))).as("text_deduped"),
        count(lit(1)).as("n_kept"))
    toks.select(col("doc_id"), size(col("w")).as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Exact-substring dedup at CHARACTER granularity — the other half of
    * Lee et al. (2022)'s ExactSubstr next to [[removeDuplicatedNgrams]]'s
    * word-n-gram approximation: every character covered by a length-`l`
    * character window that occurs MORE THAN ONCE anywhere in the corpus
    * (across documents or within one) is removed, so verbatim licenses,
    * boilerplate and quoted passages dedup exactly even when the repeat
    * starts or ends mid-word (a token-granularity pass cannot see a
    * repeat that crosses token boundaries). Deterministic function of the
    * corpus; a doc whose text is entirely covered comes back empty; docs
    * shorter than `l` are untouchable by construction and come back
    * verbatim.
    *
    * Scale shape (the positioned-hash aggregation, NOT a suffix array —
    * suffix arrays don't distribute and Lee et al. build theirs on one
    * machine): window hashing is ONE O(n) codegen'd pass per doc
    * ([[graft.spark.TextFunctions.charGramHashes]], rolling Rabin-Karp —
    * never O(n*l) re-hashing and never the l-fold blowup of shuffling the
    * substrings themselves; the groupBy key is an 8-byte hash per char
    * position, ~12 bytes/char with the doc id through the one Exchange,
    * map-side combine folding in-partition repeats first). Duplicated
    * window starts come back per doc through a sort-merge join sharing
    * the hash key; the per-doc `collect_list(pos)` buffer is bounded by
    * the DOCUMENT's own length — per-doc state, same bound as the text
    * column itself — and the splice
    * ([[graft.spark.TextFunctions.spliceCovered]]) is one output-sized
    * pass merging overlapping windows with a forward cursor. No windows
    * over unbounded keys, no driver state. Hash collisions spuriously
    * remove a window at birthday probability (~n^2/2^65 — a handful of
    * runs at 10^12 positions), the accepted trade of every distributed
    * ExactSubstr implementation.
    *
    * Output: (doc_id, text_deduped, n_chars, n_removed) — every input doc
    * exactly once; NULL text ~ empty (0 chars, nothing removed).
    */
  def removeDuplicatedCharRuns(docs: DataFrame, l: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(l >= 2, s"window length must be >= 2, got $l")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("_t"))
    // (doc_id, 1-based window start, rolling hash); docs shorter than l
    // emit no windows (the kernel returns an empty array — no ANSI
    // sequence pitfalls to guard here)
    val occ = base.filter(length(col("_t")) >= l)
      .select(col("doc_id"),
        posexplode(graft.spark.TextFunctions.charGramHashes(col("_t"), l))
          .as(Seq("i", "h")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"), col("h"))
    val dup = occ.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("h")
    val covered = occ.join(dup, "h")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    base.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("starts").isNull, coalesce(col("_t"), lit("")))
          .otherwise(graft.spark.TextFunctions.spliceCovered(
            col("_t"), col("starts"), l)).as("text_deduped"),
        coalesce(length(col("_t")), lit(0)).cast("long").as("n_chars"))
      .withColumn("n_removed",
        (col("n_chars") - length(col("text_deduped"))).cast("long"))
  }

  /** Duplicate-cluster resolution policy: turn [[duplicateClusters]]
    * output into a per-document keep/drop decision. Within each cluster
    * exactly one document survives — the one with the highest `scoreCol`
    * (e.g. length, a quality score), ties broken toward the smallest id so
    * the decision is deterministic. Documents outside every cluster keep
    * trivially, reported with themselves as cluster_id. Output:
    * (doc_id, cluster_id, keep) for every input doc.
    *
    * Scale shape: cluster membership joins on the already-partitioned id
    * (AQE broadcasts the cluster map while it is small); the winner per
    * cluster is an aggregation — `min(struct(-score, id))` with map-side
    * combine, never a window over a possibly-huge cluster; the winner
    * table (one row per cluster) re-joins on cluster_id and is
    * broadcast-sized; unclustered docs take an anti-join on the same id
    * key and bypass everything else.
    */
  def resolveDuplicates(docs: DataFrame, clusters: DataFrame,
      scoreCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    val member = docs
      .select(col(idCol).cast("long").as("doc_id"), col(scoreCol).cast("long").as("_score"))
      .join(clusters.select(col("doc_id").cast("long").as("doc_id"), col("cluster_id")),
        Seq("doc_id"))
    val winners = member.groupBy("cluster_id")
      .agg(min(struct((-col("_score")).as("neg"), col("doc_id").as("id"))).as("_w"))
      .select(col("cluster_id"), col("_w.id").as("_keep_id"))
    val resolved = member.join(winners, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("_keep_id")).cast("int").as("keep"))
    val singletons = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(clusters.select(col("doc_id").cast("long").as("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"), lit(1).as("keep"))
    resolved.unionByName(singletons)
  }

  /** Cross-split near-duplicate leakage audit: given a near-dup pair list
    * (from [[ngramJaccardPairs]], [[minhashLsh]] or [[embeddingNearDup]])
    * and a split assignment ([[graft.ops.Sampling.assignSplits]]), report
    * every pair whose two sides landed in DIFFERENT splits — each such pair
    * is evaluation contamination (the model trains on a near-copy of an
    * eval document). The fix the audit motivates is assigning splits by a
    * coherence key (domain) instead of per-document; this operator is the
    * measurement that proves whether a split is leak-free.
    *
    * Scale shape: two equi-joins keyed on the pair's two doc ids — each
    * keyed on a UNIQUE id so neither join skews, and the pair side is the
    * (bounded) near-dup candidate list, which AQE broadcasts when small.
    * One codegen'd inequality filter; no window, no aggregation.
    *
    * Output: (aCol, bCol, split_a, split_b), leaked pairs only — the
    * split_a/split_b names are fixed regardless of `splitCol`.
    */
  def crossSplitLeakage(pairs: DataFrame, assign: DataFrame,
      idCol: String = "doc_id", splitCol: String = "split",
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    // a prior audit's output can be re-audited: stale split_a/split_b on
    // the pair side would make the join output ambiguous, so drop them
    val p = pairs.drop("split_a", "split_b")
    val a = assign.select(col(idCol).as(aCol), col(splitCol).as("split_a"))
    val b = assign.select(col(idCol).as(bCol), col(splitCol).as("split_b"))
    p.join(a, aCol).join(b, bCol)
      .filter(col("split_a") =!= col("split_b"))
      .select(col(aCol), col(bCol), col("split_a"), col("split_b"))
  }

  /** Exact word-n-gram Jaccard of two texts (pure). */
  def jaccard(ta: String, tb: String, n: Int = 3): Double = {
    def sh(t: String): Set[String] = {
      val w = t.split(TextAnalysis.WhitespaceRe).filter(_.nonEmpty)
      if (w.length < n) Set.empty
      else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
    }
    val (sa, sb) = (sh(ta), sh(tb))
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  /** 60-bit SimHash over words, built only from md5 so an ANSI SQL oracle can
    * reproduce it bit-for-bit: a word's hash is the integer formed by the
    * first 15 hex chars of md5(word) (60 bits, always positive); simhash bit
    * j is the majority vote of the words' bit j, ties voting 1.
    *
    * Computed by the native codegen'd [[graft.spark.SimHash60Expr]] — ONE
    * traversal of the document's words and ONE md5 per word. The original
    * column construction ([[simhashColumns]]) evaluated a per-word
    * `aggregate()` lambda once PER BIT — sixty re-traversals per document,
    * the whole cost of q111's 20 s profile reading; the kernel is
    * equality-pinned against it in OpsSpec. NULL text maps to simhash 0
    * (the column form's `when(null >= 0).otherwise(0)` collapse),
    * whitespace-only text to all 60 bits set (zero words, every vote 0).
    */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("simhash",
      coalesce(graft.spark.TextFunctions.simhash60(col(textCol)), lit(0L)))

  /** The original 60-aggregate column construction of [[simhash]], kept as
    * the independent reference implementation for the kernel-equality test
    * (and as documentation of the SQL-oracle semantics).
    */
  private[ops] def simhashColumns(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = TextAnalysis.words(col(textCol))
    val wordHash = transform(words, w => conv(substring(md5(w), 1, 15), 16, 10).cast("long"))
    val bitCols: Seq[org.apache.spark.sql.Column] = (0 until 60).map { j =>
      // sum over words of (2*bit_j - 1) >= 0  -> bit j of the simhash
      val votes = aggregate(wordHash, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    docs.withColumn("simhash",
      bitCols.reduce((a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a.bitwiseOR(b)))
  }

  /** Hyperplane-LSH signature table for an embedding corpus: one row per
    * (vector, table) with the table's bucket key — the persisted artifact
    * of an embedding dedup store, exactly as [[signBands]] is for text.
    * The planes are a fixed function of (tables, planesPerTable, dim)
    * (seeded PRNG), so signing a later batch with the SAME parameters
    * over the SAME dimensionality reproduces the store's geometry — the
    * contract [[incrementalEmbeddingNearDup]] relies on.
    *
    * One typed map, no shuffle. `dim` anchors the plane geometry: pass it
    * explicitly (a streaming ingest should pass the store's dimensionality
    * once — no per-micro-batch driver action); `dim <= 0` probes the first
    * non-null row, and an EMPTY input yields an empty signature table, not
    * a driver error. NULL-text parity with [[signBands]]: a NULL embedding
    * emits no rows (never a candidate). A vector whose length differs from
    * `dim` throws — a dimensionality mismatch against a standing store
    * would otherwise bucket randomly and verify prefix-cosines, silently
    * losing recall, so it must fail loudly.
    */
  def signEmbeddings(emb: DataFrame, tables: Int = 6,
      planesPerTable: Int = 8, dim: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val typed = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Seq[Float])]
    val d =
      if (dim > 0) dim
      else emb.filter(col("embedding").isNotNull)
        .select(size(col("embedding"))).head(1) match {
          case Array(row) => row.getInt(0)
          case _ => return spark.emptyDataset[(Long, Long)].toDF("vec_id", "bucket")
        }
    val rnd = new scala.util.Random(42)
    val hyper = Array.fill(tables * planesPerTable, d)(rnd.nextGaussian())
    val hyperB = spark.sparkContext.broadcast(hyper)

    // one bucket key per table: (table#, P-bit signature)
    typed
      .map { case (id, v) =>
        val keys =
          if (v == null) Array.empty[Long]
          else {
            require(v.length == d,
              s"embedding dim ${v.length} for vec_id $id != LSH plane dim $d " +
                "(batch signed against a store of different dimensionality?)")
            val h = hyperB.value
            Array.tabulate(tables) { t =>
              var sig = 0L
              var p = 0
              while (p < planesPerTable) {
                var dot = 0.0
                var i = 0
                val plane = h(t * planesPerTable + p)
                while (i < v.length) { dot += plane(i) * v(i); i += 1 }
                if (dot >= 0) sig |= (1L << p)
                p += 1
              }
              (t.toLong << 32) | sig
            }
          }
        (id, keys)
      }.toDF("vec_id", "bucket_keys")
      .select(col("vec_id"), explode(col("bucket_keys")).as("bucket"))
  }

  /** Embedding near-duplicate pairs: cosine >= tau among LSH-bucketed
    * candidates. Multi-table random-hyperplane LSH (`tables` independent
    * signatures of `planesPerTable` bits each, seeded): a pair is a
    * candidate when ANY table agrees, so a pair at cosine c is missed with
    * probability (1-(1-acos(c)/pi)^P)^T — ~1e-6 at c=0.999 with 4x8 —
    * while each table's buckets stay fine-grained enough to bound pair
    * generation.
    *
    * Scale shape mirrors [[minhashLsh]]: one narrow signature map, one
    * size-bounded bucket grouping ([[boundedBuckets]] — per-bucket ids are
    * capped BEFORE any aggregation buffer forms, so a hot bucket on
    * correlated corpora can neither go quadratic nor OOM the aggregation;
    * overflow surfaced in the `truncated` flag, never silent), then exact
    * cosine verification of every candidate.
    */
  def embeddingNearDup(emb: DataFrame, tau: Double = 0.95, tables: Int = 6,
      planesPerTable: Int = 8, maxBucket: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._

    val candidates = boundedBuckets(
      signEmbeddings(emb, tables, planesPerTable),
      "vec_id", maxBucket)
      .select(col("ids"), col("truncated"))
      .as[(Seq[Long], Int)]
      .flatMap { case (ids, tr) =>
        for (i <- ids.indices.iterator; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j), tr)
      }.toDF("id_a", "id_b", "truncated")
      .groupBy("id_a", "id_b").agg(max("truncated").as("truncated"))

    // exact cosine verification of every candidate; the truncated flag rides
    // through to the output so hot-bucket recall loss is never silent.
    // Scoring is the native codegen'd cosine_sim expression — the vectors
    // are read from Tungsten ArrayData, never deserialized to Seq[Float]
    // (bit-identical to Similarity.cosine, so the q33/q41 hashes hold)
    val vecs = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    candidates
      .join(vecs.withColumnRenamed("vec_id", "id_a").withColumnRenamed("embedding", "ea"), "id_a")
      .join(vecs.withColumnRenamed("vec_id", "id_b").withColumnRenamed("embedding", "eb"), "id_b")
      // the nanvl guard keeps the Scala-comparison semantics: SQL orders
      // NaN ABOVE every number, so a corrupt (NaN-component) embedding
      // would otherwise pass >= tau and confirm a bogus duplicate. A
      // single _sim reference matters: predicate pushdown inlines the
      // alias into the filter, and a two-conjunct form would score every
      // candidate twice (FilterExec has no subexpression elimination)
      .withColumn("_sim", graft.spark.VectorFunctions.cosineSim(col("ea"), col("eb")))
      .filter(nanvl(col("_sim"), lit(-2.0)) >= tau)
      .select(col("id_a"), col("id_b"), col("truncated"))
  }

  /** Incremental embedding near-dup — [[incrementalMinhash]]'s
    * batch-vs-store contract for the embedding modality: flag new-batch
    * vectors whose cosine to some store vector reaches `tau`, without
    * re-signing the store. `storeSig` is the store's persisted
    * [[signEmbeddings]] table (appended per ingest) and `storeVecs` a
    * (vec_id, embedding) relation consulted only for the candidate-sized
    * exact verification. The batch MUST be signed with the same (tables,
    * planesPerTable) and dimensionality the store was built with — the
    * planes are a fixed function of those, which is what makes the
    * signature table durable.
    *
    * Plan: identical shape to [[incrementalMinhash]] — batch signed
    * O(batch); store signature table capped at `maxBucket` ids per bucket
    * with the overflow COUNTED into the output's `truncated` flag
    * ([[cappedStoreCandidates]], shared with the text modality); ONE
    * bucket equi-join; exact NaN-guarded cosine verification; min store
    * id per batch vector.
    *
    * `dim` anchors the hyperplane geometry. Left at 0 it is probed ONCE
    * from `storeVecs` (the store is the durable side, so the store's
    * dimensionality is authoritative — a wrong-dim batch then fails
    * loudly inside [[signEmbeddings]] instead of bucketing randomly); a
    * steady-state ingest should pass it explicitly to avoid the per-call
    * probe action. An empty store means nothing can be a duplicate:
    * empty result, no driver error — so a foreachBatch ingest can call
    * this from its very first micro-batch.
    *
    * Output: (vec_id, dup_of, truncated).
    */
  def incrementalEmbeddingNearDup(batch: DataFrame, storeSig: DataFrame,
      storeVecs: DataFrame, tau: Double = 0.95, tables: Int = 6,
      planesPerTable: Int = 8, maxBucket: Int = 64, dim: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val d =
      if (dim > 0) dim
      else storeVecs.filter(col("embedding").isNotNull)
        .select(size(col("embedding"))).head(1) match {
          case Array(row) => row.getInt(0)
          case _ => return spark.emptyDataset[(Long, Long, Int)]
            .toDF("vec_id", "dup_of", "truncated")
        }
    val candidates = cappedStoreCandidates(
      signEmbeddings(batch, tables, planesPerTable, d), storeSig, "vec_id", maxBucket)
    val batchVecs = batch.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").as("_bv"))
    val stVecs = storeVecs.select(col("vec_id").cast("long").as("store_id"),
      col("embedding").as("_sv"))
    candidates
      .join(batchVecs, "vec_id").join(stVecs, "store_id")
      .withColumn("_sim",
        graft.spark.VectorFunctions.cosineSim(col("_bv"), col("_sv")))
      .filter(nanvl(col("_sim"), lit(-2.0)) >= tau)
      .groupBy("vec_id").agg(min("store_id").as("dup_of"),
        max("_trunc").as("truncated"))
  }

  /** SimHash near-duplicate pairs: band the 60-bit [[simhash]] into four
    * 15-bit keys; any pair within `maxHamming <= 3` bit flips agrees on
    * at least one band EXACTLY (pigeonhole: 3 flips cannot touch all 4
    * bands), so band-equality candidates give guaranteed recall, then an
    * exact `bit_count(xor)` verify keeps only true near-duplicates.
    * Docs with no words are excluded (an all-empty cohort would
    * otherwise collide into one degenerate hamming-0 clique).
    *
    * Scale shape: signatures are pure column expressions (ONE scan, one
    * simhash evaluation — the 16-byte (doc_id, simhash) struct rides the
    * band shuffle, so verification needs NO join back to the corpus and
    * never re-derives the signature); candidates flow through
    * [[boundedBuckets]] so a degenerate hot band (millions of identical
    * docs) truncates gracefully with the overflow flagged instead of
    * OOMing an executor; the hamming verify runs inline over each capped
    * bucket, and one final groupBy dedups pairs surfaced by several bands.
    */
  /** Incremental SimHash near-dup — [[simhashNearDup]]'s batch-vs-store
    * form, completing the incremental family ([[incrementalExact]] /
    * [[incrementalMinhash]] / [[incrementalEmbeddingNearDup]] / this):
    * flag batch documents within `maxHamming` bits of ANY document in a
    * standing simhash store. The store enters as its PRECOMPUTED
    * `(doc_id, simhash)` table — one [[simhash]] evaluation when each doc
    * was ingested, appended per surviving batch, never re-hashed here.
    *
    * Same 4x15-bit banding and pigeonhole recall as [[simhashNearDup]]
    * (<= 3 flips cannot touch all 4 bands, so band-equality candidates
    * are exhaustive at maxHamming <= 3); the store side is capped at
    * `maxBucket` ids per bucket through [[cappedStoreCandidates]] (the
    * shared row_number bound — a degenerate hot band bounds the join
    * fan-out with the overflow COUNTED into the flag, never silent).
    * Batch docs with no words emit no signature (never candidates), the
    * [[simhashNearDup]] contract. STORE CONTRACT: `storeSims` must carry
    * signatures of worded documents only — the same rule the batch side
    * enforces and the deltas every incremental operator emits satisfy
    * (keepers are never empty). A store row whose signature came from
    * empty/zero-word text (a raw [[simhash]] call coalesces those to 0)
    * would enter band buckets and could surface as `dup_of` for a
    * near-zero-signature batch doc where the q116 oracle — which drops
    * empty store docs — reports none; filter such rows before appending.
    *
    * Plan: one codegen'd simhash pass over the batch feeds the band
    * shuffle; candidates come from ONE bucket equi-join against the
    * capped store table; the verify joins each side's signature back on
    * its UNIQUE id (candidate-sized, no skew) and runs inline
    * `bit_count(xor)`. The batch is signed twice (once per consumer — an
    * O(batch) map each, cheaper at any scale than pinning a batch-sized
    * signature table) and the store signature TABLE is scanned twice
    * (banding + the verify lookup), never the store text.
    *
    * Output: (doc_id, dup_of, min_hamming, truncated), matched batch
    * docs only — dup_of = min matching store id, min_hamming = the
    * closest match's distance, truncated = OR over the buckets the
    * doc's candidates met in.
    */
  def incrementalSimhash(batch: DataFrame, storeSims: DataFrame,
      maxHamming: Int = 3, maxBucket: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band LSH guarantees recall only for maxHamming <= 3")
    val spark = batch.sparkSession
    import spark.implicits._
    val bands = broadcast((0 until 4).toDF("b"))
    def banded(sims: DataFrame): DataFrame = sims
      .select(col("doc_id").cast("long").as("doc_id"), col("simhash"))
      .crossJoin(bands)
      .select(col("doc_id"),
        (col("b").cast("long") * lit(1L << 60) +
          call_function("shiftright", col("simhash"), (col("b") * 15).cast("int"))
            .bitwiseAND(lit(32767L))).as("bucket"))
    val batchSims = simhash(
        batch.filter(coalesce(size(TextAnalysis.words(col("text"))), lit(0)) > 0))
      .select(col("doc_id").cast("long").as("doc_id"), col("simhash"))
    cappedStoreCandidates(banded(batchSims), banded(storeSims), "doc_id", maxBucket)
      .join(batchSims.withColumnRenamed("simhash", "_bs"), "doc_id")
      .join(storeSims.select(col("doc_id").cast("long").as("store_id"),
        col("simhash").as("_ss")), "store_id")
      .withColumn("hamming",
        call_function("bit_count", col("_bs").bitwiseXOR(col("_ss"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("doc_id")
      .agg(min("store_id").as("dup_of"), min("hamming").as("min_hamming"),
        max("_trunc").as("truncated"))
  }

  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band LSH guarantees recall only for maxHamming <= 3")
    val spark = docs.sparkSession
    import spark.implicits._
    val sims = simhash(
        docs.filter(coalesce(size(TextAnalysis.words(col("text"))), lit(0)) > 0))
      .select(col("doc_id").cast("long").as("doc_id"), col("simhash"))
    val bands = broadcast((0 until 4).toDF("b"))
    // struct ordering is field-lexicographic and doc_id is unique, so the
    // bucket cap keeps the smallest doc_ids — exactly the oracle's rule
    val assign = sims.crossJoin(bands)
      .select(struct(col("doc_id"), col("simhash")).as("node"),
        (col("b").cast("long") * lit(1L << 60) +
          call_function("shiftright", col("simhash"), (col("b") * 15).cast("int"))
            .bitwiseAND(lit(32767L))).as("bucket"))
    boundedBuckets(assign, "node", maxBucket)
      .select(col("ids"), col("truncated")).as[(Seq[(Long, Long)], Int)]
      .flatMap { case (ids, tr) =>
        for {
          i <- ids.indices.iterator
          j <- (i + 1) until ids.size
          h = java.lang.Long.bitCount(ids(i)._2 ^ ids(j)._2)
          if h <= maxHamming
        } yield (ids(i)._1, ids(j)._1, h, tr)
      }.toDF("doc_a", "doc_b", "hamming", "tr")
      .groupBy("doc_a", "doc_b", "hamming").agg(max("tr").as("truncated"))
      .select("doc_a", "doc_b", "hamming", "truncated")
  }
}
