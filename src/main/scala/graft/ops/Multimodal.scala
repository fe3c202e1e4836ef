package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
}
