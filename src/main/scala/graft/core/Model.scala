package graft.core

/** Data model for the interleaved-span document table.
  *
  * Mirrors the message-dict data model of the reference pipeline
  * (adsft/utils.py:99-103, adsft/checker.py:252-277) re-expressed as the
  * Iceberg-style schema mandated by the graft:
  * `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`.
  */

/** One span of a document.
  *
  * Input-side kinds:
  *  - "raw":   one source-file part (reference `ft_source` content; several
  *             raw spans = the comma-joined multi-file case, adsft/utils.py:286-312)
  *  - "table": an HTML companion table file (reference A&A external tables,
  *             adsft/extraction.py:215-239); `media_ref` = table file name
  *  - "run":   a positioned PDF text run; `media_ref` = "page:x:y" layout key
  *  - "image": a positioned media object (PDF figure); `media_ref` = object ref
  *
  * Output-side kinds:
  *  - "text":  cleaned body text segment
  *  - "media": a media reference the reference pipeline encountered and removed
  *             (e.g. `<graphic xlink:href=...>`, adsft/extraction.py:729),
  *             kept interleaved in document order.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** An input document row plus the checker metadata the reference carries in its
  * payload dict (`bibcode`, `ft_source`, `provider`, `UPDATE`: adsft/utils.py:99-111).
  * `src_mtime` is the source-file mtime analog used by the staleness checker
  * (adsft/checker.py:47-56).
  */
final case class Doc(
    doc_id: String,
    format: String,
    provider: String,
    source_path: String,
    spans: Seq[Span],
    update_flag: String, // null | FORCE_TO_EXTRACT | FORCE_TO_SEND
    src_mtime: java.sql.Timestamp
)

/** Pure extraction result (no Spark types). Field meanings follow the
  * reference's extractor output dict (adsft/extraction.py:963-966, rules.py:4-101).
  */
final case class Extracted(
    spans: Vector[Span],
    fulltext: String,
    acknowledgements: String,
    dataset: Vector[String],
    facility: Vector[String]
)

object Extracted {
  val empty: Extracted = Extracted(Vector.empty, "", "", Vector.empty, Vector.empty)
}

/** Output row of the extraction pipeline (the `extracted` table). */
final case class ExtractedDoc(
    doc_id: String,
    spans: Seq[Span],
    fulltext: String,
    acknowledgements: String,
    dataset: Seq[String],
    facility: Seq[String],
    update_reason: String,
    index_date: java.sql.Timestamp,
    format: String,
    part_id: Int,
    lineage: String,
    error: String
)
