package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode / feature-extraction runs as a
  * typed mapPartitions over Catalyst-encoded rows (the Scala analog of
  * `mapInPandas` batch UDFs).
  *
  * The image/audio codec libraries are not available in this container, so
  * the decode step is a clearly-marked DETERMINISTIC STUB — the Spark-side
  * plumbing (schema, batch iteration, partitioning, null/error handling) is
  * real and tested, and swapping `stubDecode` for a real codec is the only
  * change needed for production.
  */
object Multimodal {

  final case class MediaIn(doc_id: String, media_ref: String, content: Array[Byte])
  final case class MediaFeat(doc_id: String, media_ref: String, width: Int,
      height: Int, n_bytes: Long, feature: Array[Float], decode_error: String)

  /** Deterministic fake payload for a media_ref (so tests/benches have real
    * bytes to push through the pipeline without external data): concatenated
    * md5 blocks md5(ref || ":" || j), j = 0, 1, ... Built ONLY from md5 so
    * bytes 0/1 — the stub decoder's width/height source — are closed-form in
    * ANSI SQL and the q32 DuckDB oracle can state the expected features.
    */
  def synthBytes(mediaRef: String, len: Int = 256): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](len)
    var i = 0
    var block = 0
    while (i < len) {
      val d = md.digest(s"$mediaRef:$block".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val n = math.min(16, len - i)
      System.arraycopy(d, 0, out, i, n)
      i += n
      block += 1
    }
    out
  }

  /** STUB DECODER — stands in for an image codec. Reads "dimensions" from
    * the payload head deterministically; a real implementation would parse
    * an actual container format here. ??? -> replaced by a fixed fake.
    */
  private def stubDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    if (bytes == null || bytes.length < 8) throw new IllegalArgumentException("truncated payload")
    val width = 64 + (bytes(0) & 0x7f)
    val height = 64 + (bytes(1) & 0x7f)
    // "feature": 8-dim byte histogram moments (deterministic, cheap)
    val feat = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      feat((bytes(i) & 0xff) % 8) += 1f
      i += 1
    }
    var j = 0
    while (j < 8) { feat(j) /= bytes.length.toFloat; j += 1 }
    (width, height, feat)
  }

  /** Decode + feature-extract media rows. Batch shape: iterator-per-partition
    * (constant memory); decode failures become rows with `decode_error` set
    * (error side-channel, never a task failure).
    */
  def extractFeatures(media: Dataset[MediaIn]): Dataset[MediaFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        try {
          val (w, h, feat) = stubDecode(m.content)
          MediaFeat(m.doc_id, m.media_ref, w, h,
            if (m.content == null) 0L else m.content.length.toLong, feat, null)
        } catch {
          case e: Throwable =>
            MediaFeat(m.doc_id, m.media_ref, -1, -1,
              if (m.content == null) 0L else m.content.length.toLong,
              Array.empty[Float], e.getMessage)
        }
      }
    }
  }

  /** Build a media table from the extracted spans: every media span becomes
    * a binary row (payload synthesized deterministically from the ref).
    */
  def mediaTable(extracted: DataFrame): Dataset[MediaIn] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      .as[(String, String)]
      .map { case (d, r) => MediaIn(d, r, synthBytes(r)) }
  }

  /** Render the interleaved span model into ONE training sequence per
    * document — the serialization step of multimodal pre-training corpora
    * (interleaved image-text datasets train on exactly this shape: document
    * text in order with a sentinel token at each image position, the image
    * itself riding in a parallel table keyed by (doc_id, media_ref) —
    * [[mediaTable]]). Text spans contribute their text verbatim, media
    * spans contribute `sentinel`, order is the span order, joined by a
    * single space. Also emits `n_media` / `n_text_spans` so a packing or
    * filtering stage downstream can budget sequences without re-parsing.
    *
    * Scale shape: pure column expressions over the spans array (transform +
    * concat_ws + size/filter) — a map-only codegen'd projection, no
    * explode, no shuffle, no per-row state; cost is O(spans) per document
    * regardless of corpus size.
    */
  def renderInterleaved(extracted: DataFrame, sentinel: String = "<|image|>"): DataFrame = {
    val spans = col("spans")
    extracted.select(
      col("doc_id"),
      concat_ws(" ", transform(spans,
        s => when(s("kind") === "media", lit(sentinel)).otherwise(s("text"))))
        .as("training_text"),
      size(filter(spans, s => s("kind") === "media")).as("n_media"),
      size(filter(spans, s => s("kind") === "text")).as("n_text_spans"))
  }

  final case class FrameRow(doc_id: String, media_ref: String, n_frames: Int,
      sample_rank: Int, frame_idx: Int, frame_byte: Int, decode_error: String)

  /** Deterministic frame sampling for video-like payloads — the
    * frame-sample half of the multimodal decode family ([[extractFeatures]]
    * is the image half): probe the container for its frame count, pick at
    * most `k` evenly-spaced frame indices, and emit one row per sampled
    * frame with a per-frame payload byte (the stand-in for a decoded
    * frame's pixels; a real codec replaces [[stubDecode]]-style probing and
    * the byte lookup, nothing else).
    *
    * Container probe is a DETERMINISTIC STUB like [[stubDecode]]:
    * `n_frames = 8 + (payload[2] & 0x7f)` and
    * `frame_byte = payload[frame_idx % len] & 0xff` — both closed-form over
    * the md5-block [[synthBytes]] payloads so the DuckDB oracle can state
    * every expected row.
    *
    * Sampling contract: if `n_frames <= k` every frame is taken in order;
    * otherwise `frame_idx(i) = i * n_frames / k` for i in 0 until k
    * (integer division — strictly increasing when n_frames > k, so ranks
    * map to distinct frames). `sample_rank` is the 0-based output position.
    *
    * Scale shape: iterator-per-partition typed map, zero shuffle, output
    * cardinality <= k rows per media row; probe failures become a single
    * `decode_error` row (error side-channel, never a task failure).
    */
  def frameSample(media: Dataset[MediaIn], k: Int): Dataset[FrameRow] = {
    require(k > 0, "k must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        // build the <= k rows EAGERLY inside the try: a lazy iterator body
        // would escape the catch, and a real codec's per-frame lookup must
        // land in the error side-channel, not fail the task
        try {
          val bytes = m.content
          if (bytes == null || bytes.length < 8)
            throw new IllegalArgumentException("truncated payload")
          val nFrames = 8 + (bytes(2) & 0x7f)
          val taken = math.min(k, nFrames)
          Vector.tabulate(taken) { i =>
            val idx = if (nFrames <= k) i else i * nFrames / k
            FrameRow(m.doc_id, m.media_ref, nFrames, i, idx,
              bytes(idx % bytes.length) & 0xff, null)
          }
        } catch {
          case e: Throwable =>
            Vector(FrameRow(m.doc_id, m.media_ref, -1, -1, -1, -1, e.getMessage))
        }
      }
    }
  }

  /** Integer resize planning over decoded dimensions — the resize half of
    * the decode family, kept as PURE COLUMN EXPRESSIONS because the plan
    * (output dimensions) is arithmetic on [[extractFeatures]]'s width and
    * height; only the pixel resampling itself would live in the codec.
    * Aspect-preserving fit into a `maxDim` square: dimensions already
    * inside the box pass through; otherwise the longer side becomes
    * `maxDim` and the shorter scales by the same integer-floor ratio
    * (`dim * maxDim / longest`), floored at 1 so extreme aspect ratios
    * never produce a zero dimension. Decode-error rows (width < 0) keep
    * NULL output dimensions.
    *
    * Scale shape: map-only codegen'd projection, zero shuffle.
    */
  def resizePlan(feats: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, "maxDim must be positive")
    val w = col("width")
    val h = col("height")
    val longest = greatest(w, h)
    def scaled(dim: Column): Column =
      greatest(floor(dim.cast("long") * maxDim / longest).cast("int"), lit(1))
    feats
      .withColumn("out_width",
        when(w < 0, lit(null).cast("int"))
          .when(longest <= maxDim, w).otherwise(scaled(w)))
      .withColumn("out_height",
        when(h < 0, lit(null).cast("int"))
          .when(longest <= maxDim, h).otherwise(scaled(h)))
  }

  /** Referential-integrity audit between the interleaved span model and the
    * media payload table — the consistency check a multimodal corpus needs
    * before training: every `media` span's ref must resolve to a payload
    * row (else the sentinel in the rendered sequence points at nothing),
    * and payload rows never referenced are dead weight to vacuum. Statuses:
    * `resolved` (span ref with a payload), `orphan` (span ref with NO
    * payload row), `unused` (payload row no span references).
    *
    * Scale shape: one explode of the spans array + one groupBy per side
    * (map-side combined — a doc referencing the same image a thousand
    * times costs one buffer row per map task), then ONE full-outer
    * sort-merge join on (doc_id, media_ref). No windows, no driver state;
    * both sides arrive pre-aggregated so join rows are unique per key.
    *
    * Output: (doc_id, media_ref, n_span_refs, status) — one row per
    * distinct (doc, ref) seen on either side.
    */
  def mediaIntegrity(extracted: DataFrame, media: DataFrame): DataFrame = {
    val refs = extracted
      .select(col("doc_id"), explode(col("spans")).as("sp"))
      .filter(col("sp.kind") === "media")
      .groupBy(col("doc_id"), col("sp.media_ref").as("media_ref"))
      .agg(count(lit(1)).as("n_span_refs"))
    val payloads = media
      .groupBy(col("doc_id"), col("media_ref"))
      .agg(count(lit(1)).as("n_media_rows"))
    refs.join(payloads, Seq("doc_id", "media_ref"), "full_outer")
      .select(col("doc_id"), col("media_ref"),
        coalesce(col("n_span_refs"), lit(0L)).as("n_span_refs"),
        when(col("n_span_refs").isNull, "unused")
          .when(col("n_media_rows").isNull, "orphan")
          .otherwise("resolved").as("status"))
  }

  /** Image-caption pair extraction from the interleaved span model — the
    * standard multimodal-training-data derivation: every `media` span is
    * paired with its NEAREST FOLLOWING `text` span in document order
    * (figure first, caption/discussion after — the layout the extractors
    * emit); a trailing media span with no text after it gets a null
    * caption rather than vanishing. Output: (doc_id, media_ref, caption).
    *
    * Scale shape: one explode + one window PARTITIONED BY doc_id ordered
    * by span position — the partition is one document's span list (pages,
    * not the corpus), and the "nearest following text" is a running
    * `last(.., ignoreNulls)` over the DESCENDING order, an incremental
    * frame (no per-row lookahead scans). One shuffle on doc_id.
    */
  def mediaCaptionPairs(extracted: DataFrame): DataFrame = {
    val spans = extracted
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), col("s.kind").as("kind"),
        col("s.text").as("text"), col("s.media_ref").as("media_ref"))
    // scanning positions in DESCENDING order, the last text seen so far is
    // exactly the nearest text span AFTER the current position
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("pos").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spans
      .withColumn("caption",
        last(when(col("kind") === "text", col("text")), ignoreNulls = true).over(w))
      .filter(col("kind") === "media")
      .select(col("doc_id"), col("media_ref"), col("caption"))
  }

  /** Contrastive negatives for (media, caption) training pairs — the
    * third leg of a CLIP-style dataset after [[mediaCaptionPairs]]
    * (positives) and [[dedupMediaPayloads]] (storage): each pair gets a
    * deterministic negative caption, the caption of the NEXT pair in
    * md5(pair) order (a fixed global shuffle, so negatives are unbiased
    * "random other captions" yet re-runs reproduce them bit-for-bit), the
    * last pair wrapping to the first. A negative that happens to come
    * from the same document is FLAGGED (`same_doc`), not silently
    * re-drawn — the caller decides whether to drop or re-pair those.
    * Null-caption pairs (trailing media with no following text) are
    * excluded (they can serve as neither anchor nor negative), and
    * duplicate (doc, media_ref) pairs — a doc whose span list references
    * the same media twice — collapse to their minimum caption, so the
    * ranked key is genuinely unique (the key itself is md5(doc)||md5(ref):
    * fixed-width digests concatenate unambiguously, where a delimiter
    * could collide on ids containing the delimiter).
    *
    * Scale shape: the global order is [[Sampling.shuffleOrder]]'s
    * distributed two-pass prefix rank (range partition + driver
    * partition-offsets — never a global one-task window); the neighbor is
    * ONE self-equi-join on the rank; the wrap row is a one-row filter
    * broadcast to every task. The ranked relation is eagerly
    * localCheckpointed ONCE — it feeds three branches (output, neighbor,
    * wrap), which would otherwise re-execute the whole upstream pairs
    * plan per branch. No global sort, no window, no driver state beyond
    * one row per partition.
    *
    * Output: (doc_id, media_ref, caption, neg_caption, same_doc).
    */
  def captionContrastiveNegatives(pairs: DataFrame): DataFrame = {
    val nn = pairs.filter(col("caption").isNotNull)
      .groupBy("doc_id", "media_ref").agg(min("caption").as("caption"))
      .withColumn("pair_id",
        concat(md5(col("doc_id").cast("string")), md5(col("media_ref"))))
    val ranked = Sampling.shuffleOrder(nn.select("pair_id"), "pair_id")
    val wp = nn.join(ranked, "pair_id").localCheckpoint()
    val neg = wp.select((col("pos") - 1).as("pos"),
      col("caption").as("_negcap"), col("doc_id").as("_negdoc"))
    val wrap = wp.filter(col("pos") === 0)
      .select(col("caption").as("_wrapcap"), col("doc_id").as("_wrapdoc"))
    wp.join(neg, Seq("pos"), "left")
      .crossJoin(broadcast(wrap))
      .select(col("doc_id"), col("media_ref"), col("caption"),
        coalesce(col("_negcap"), col("_wrapcap")).as("neg_caption"),
        (col("doc_id") === coalesce(col("_negdoc"), col("_wrapdoc")))
          .cast("int").as("same_doc"))
  }

  /** Span-aware PII scrub over the interleaved model: redact
    * [[graft.ops.TextAnalysis.scrubPii]]'s five classes inside TEXT spans
    * while leaving media spans, span order, and offsets untouched — the
    * release-time privacy pass a multimodal corpus needs, where scrubbing
    * the RENDERED text would orphan the media positions (the sentinel
    * indices into the parallel payload table must survive). Also emits
    * `n_pii`, the Luhn-gated total hit count over the original text spans,
    * so a filtering stage can quarantine PII-dense documents instead of
    * (or in addition to) redacting them.
    *
    * Scale shape: pure column expressions over the spans array (one
    * `transform` rebuilding the structs + one `aggregate` for the count) —
    * a map-only codegen'd projection, no explode, no shuffle, no per-row
    * state; cost is O(total span text) per document at any corpus size.
    */
  def scrubSpans(extracted: DataFrame, spansCol: String = "spans"): DataFrame = {
    val spans = col(spansCol)
    extracted
      .withColumn("n_pii", aggregate(spans, lit(0),
        (acc, s) => acc + when(s("kind") === "text" && s("text").isNotNull,
          TextAnalysis.piiCount(s("text"))).otherwise(lit(0))))
      .withColumn(spansCol, transform(spans, s =>
        struct(
          s("kind").as("kind"),
          when(s("kind") === "text", TextAnalysis.scrubPii(s("text")))
            .otherwise(s("text")).as("text"),
          s("media_ref").as("media_ref"),
          s("offset").as("offset"))))
  }

  /** Storage-level media dedup over a content-addressed media table: when
    * several media_refs point at byte-identical payloads (mirrored
    * figures, re-hosted images — the multimodal analog of exact text
    * dedup), the corpus should store ONE copy and every document should
    * reference it. `media` is (media_ref, content_hash) — the hash a
    * content-addressable store computes at ingest (for the stub-payload
    * pipeline, md5 of [[synthBytes]] input). The canonical ref per hash is
    * the minimum media_ref (deterministic, re-run stable); every media
    * span is re-pointed at its canonical. A ref appearing under SEVERAL
    * hashes (a re-ingested payload whose bytes changed) resolves to the
    * minimum canonical — one mapping row per ref BY CONSTRUCTION, so a
    * dirty media table can never fan a span out into duplicates.
    *
    * Scale shape: canonical selection is ONE groupBy(content_hash) with a
    * min — map-side combined, a billion copies of one payload cost each
    * task one buffer row; the ref->canonical mapping collapses to one row
    * per ref by the same aggregation shape and joins the exploded spans
    * on media_ref (mapping is dedup-output-sized — AQE broadcasts it when
    * small); the per-doc rebuild is one groupBy(doc_id) whose buffer is
    * bounded by the doc's own span count. Docs with an EMPTY spans array
    * come back empty, and a NULL spans array stays NULL — "extraction
    * produced nothing" is not rewritten into "zero spans".
    *
    * Output: the input docs with `spans` re-pointed plus `n_repointed`
    * (spans whose ref changed).
    */
  def dedupMediaPayloads(extracted: DataFrame, media: DataFrame,
      spansCol: String = "spans"): DataFrame = {
    val canon = media.groupBy("content_hash")
      .agg(min("media_ref").as("_canon"))
    val mapping = media.join(canon, "content_hash")
      .groupBy(col("media_ref").as("_ref")).agg(min("_canon").as("_canon"))
    val exploded = extracted.select(col("doc_id"),
      posexplode(col(spansCol)).as(Seq("pos", "sp")))
    val repointed = exploded
      .join(mapping, exploded("sp.media_ref") === mapping("_ref"), "left")
      .select(col("doc_id"), col("pos"),
        struct(
          col("sp.kind").as("kind"),
          col("sp.text").as("text"),
          coalesce(col("_canon"), col("sp.media_ref")).as("media_ref"),
          col("sp.offset").as("offset")).as("sp"),
        (col("_canon").isNotNull && !(col("_canon") <=> col("sp.media_ref")))
          .cast("long").as("_chg"))
    val rebuilt = repointed.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("sp")))).as("_ps"),
        sum("_chg").as("n_repointed"))
      .select(col("doc_id"), transform(col("_ps"), p => p("sp")).as(spansCol),
        col("n_repointed"))
    val spanArrayType = extracted.schema(extracted.schema.fieldIndex(spansCol)).dataType
    extracted.withColumn("_had", col(spansCol).isNotNull).drop(spansCol)
      .join(rebuilt, Seq("doc_id"), "left")
      .withColumn(spansCol,
        when(col("_had"), coalesce(col(spansCol), array().cast(spanArrayType))))
      // the count stays a count (0) even for NULL-spans docs, matching the
      // sibling ops' null policy (removeFrequentLines returns 0 removed)
      .withColumn("n_repointed", coalesce(col("n_repointed"), lit(0L)))
      .drop("_had")
  }
}
