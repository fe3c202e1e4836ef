package graft.core


/** PDF layout / reading-order reconstruction.
  *
  * The reference shells out to `pdftotext` (adsft/extraction.py:1110-1131,
  * scripts/extract_pdf_with_pdftotext.sh) or uses PDFBox's PDFTextStripper
  * (src/main/java/org/adslabs/adsfulltext/PDFExtract.java:43-145) — both
  * produce reading-order text with column handling, then clean
  * (translate=False, decode=True, normalise, trim). Here the "pdf" document
  * kind carries positioned text runs as spans (`kind="run"`,
  * `media_ref="page:x:y"`), and this operator reconstructs reading order from
  * scratch:
  *
  *   - group runs by page
  *   - detect a two-column layout per page by the largest gap between
  *     distinct run x-positions (if the gap splits the x-range significantly)
  *   - emit left column top-to-bottom, then right column, pages in order
  *   - `kind="image"` runs become media spans at their position in the
  *     reconstructed order
  *
  * The per-record timeout/degraded-retry of the reference (30s pdftotext then
  * ghostscript vector-strip) maps to the degraded mode in the dispatcher:
  * on failure, image runs are dropped and text runs re-processed.
  */
object PdfExtractor {

  final case class Run(page: Int, x: Int, y: Int, text: String, image: Option[String])

  final case class PdfResult(fulltext: String, spans: Vector[Span])

  /** media_ref layout key: "page:x:y" */
  def parseRef(ref: String): (Int, Int, Int) = {
    val parts = ref.split(':')
    (parts(0).toInt, parts(1).toInt, parts(2).toInt)
  }

  def runsFromSpans(spans: Seq[Span]): Seq[Run] =
    spans.collect {
      case s if s.kind == "run" =>
        val (p, x, y) = parseRef(s.media_ref)
        Run(p, x, y, s.text, None)
      case s if s.kind == "image" =>
        // image ref format: "page:x:y:objref"
        val parts = s.media_ref.split(':')
        Run(parts(0).toInt, parts(1).toInt, parts(2).toInt, null,
          Some(parts.drop(3).mkString(":")))
    }

  /** Order runs of one page: column-major reading order. */
  private def orderPage(runs: Seq[Run]): Seq[Run] = {
    if (runs.isEmpty) return runs
    val xs = runs.map(_.x).distinct.sorted
    var splitAt = -1
    if (xs.length >= 2) {
      var bestGap = 0
      var i = 1
      while (i < xs.length) {
        val gap = xs(i) - xs(i - 1)
        if (gap > bestGap) { bestGap = gap; splitAt = xs(i) }
        i += 1
      }
      val range = xs.last - xs.head
      if (range == 0 || bestGap < range / 2 || bestGap < 100) splitAt = -1
    }
    if (splitAt < 0) runs.sortBy(r => (r.y, r.x))
    else {
      val (left, right) = runs.partition(_.x < splitAt)
      left.sortBy(r => (r.y, r.x)) ++ right.sortBy(r => (r.y, r.x))
    }
  }

  def extract(spans: Seq[Span]): PdfResult = {
    val ordered = runsFromSpans(spans)
      .groupBy(_.page).toSeq.sortBy(_._1)
      .flatMap { case (_, rs) => orderPage(rs) }

    def clean(s: String): String =
      CleanText.run(s, translateFlag = false, normaliseFlag = true, trimFlag = true)

    val out = Vector.newBuilder[Span]
    var off = 0
    val sb = new java.lang.StringBuilder()

    def flushText(): Unit = {
      val seg = clean(sb.toString)
      sb.setLength(0)
      if (seg.nonEmpty) { out += Span("text", seg, null, off); off += 1 }
    }

    ordered.foreach { r =>
      r.image match {
        case Some(ref) =>
          flushText()
          out += Span("media", null, ref, off); off += 1
        case None =>
          if (sb.length() > 0) sb.append(' ')
          sb.append(if (r.text == null) "" else r.text)
      }
    }
    flushText()
    val spansOut = out.result()
    val fulltext = spansOut.collect { case s if s.kind == "text" => s.text }.mkString(" ")
    PdfResult(fulltext, spansOut)
  }
}
