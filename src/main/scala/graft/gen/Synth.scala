package graft.gen

import graft.core.{Doc, Span}

/** Deterministic synthetic corpus generation (pure functions; no Spark).
  *
  * Each row of the driver's `documents` table (doc_id, text, source) becomes
  * one interleaved-span document whose format is `doc_id % 10`:
  *
  *   0,1 txt · 2 ocr · 3,4 JATS xml · 5 Elsevier xml · 6 TEI xml ·
  *   7 html (+ companion table span) · 8,9 pdf (positioned runs, scrambled)
  *
  * The wrappers exercise the same constructs as the reference stub corpus
  * (tests/test_unit/stub_data): AGU body-comment wrap, inline-formula tail
  * preservation, table label/caption kept + content dropped, graphics ->
  * media spans, datasets/facilities, ack relocation, appendix join,
  * namespaced Elsevier tags, HTML intro/references removal + external-table
  * splice, two-column PDF layout.
  *
  * EVERYTHING here is mirrored by ANSI SQL in SparkEntry.oracleSql — the
  * expected extraction output of every synthetic doc is a closed-form
  * function of (doc_id, text, source). Keep the two in sync.
  */
object Synth {

  def key(id: Long): String = f"D$id%09d"

  def fmtCode(id: Long): Int = (id % 10).toInt

  def format(id: Long): String = fmtCode(id) match {
    case 0 | 1 => "txt"
    case 2     => "ocr"
    case 3 | 4 | 5 => "xml"
    case 6     => "teixml"
    case 7     => "html"
    case _     => "pdf"
  }

  def provider(id: Long): String = if (fmtCode(id) == 5) "Elsevier" else "ADS"

  def ext(id: Long): String = format(id) match {
    case "teixml" => "teixml"
    case f        => f
  }

  def sourcePath(id: Long): String = s"/sources/${format(id)}/${key(id)}.${ext(id)}"

  /** source mtime: 2020-01-01 + (id % 100) days */
  def srcMtime(id: Long): java.sql.Timestamp =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime +
      (id % 100) * 86400000L)

  def firstWord(text: String): String = {
    val i = text.indexOf(' ')
    if (i < 0) text else text.substring(0, i)
  }

  /** Split at the word midpoint: first ceil(n/2) words / rest. */
  def splitWords(text: String): (String, String) = {
    val words = text.split(" ").filter(_.nonEmpty)
    val k = (words.length + 1) / 2
    (words.take(k).mkString(" "), words.drop(k).mkString(" "))
  }

  // ------------------------------------------------------------------ bodies

  def jatsXml(id: Long, text: String, source: String): String = {
    val k = key(id)
    val (a, b) = splitWords(text)
    val w0 = firstWord(text)
    s"""<?xml version="1.0" encoding="UTF-8"?>
<article xmlns:xlink="http://www.w3.org/1999/xlink" article-type="article">
<front><article-title>TITLE $k</article-title><abstract><p>ABSTRACT $k</p></abstract></front>
<!-- body <body>
<sec id="s1"><label>I.</label><title>INTRODUCTION</title>
<p>$a<inline-formula>REMOVED</inline-formula> $b</p></sec>
<data><named-content content-type="dataset" xlink:href="DS/$k/a">Manual Entry 1</named-content></data>
<table-wrap id="t1"><label>TABLE $k.</label><caption><p>CAP $k</p></caption>
<table><tr><td>TABLECELL DROPPED</td></tr></table>
<graphic xlink:href="fig${k}a.gif"/>
<graphic xlink:href="fig${k}b.gif"/>
<table-wrap-foot><p>NOTES $k</p></table-wrap-foot></table-wrap>
</body> endbody -->
<back>
<ack><title>Acknowledgments</title><p>THANKS TO $source.</p>
<named-content content-type="facility" xlink:href="FAC${id % 5}">FAC${id % 5}</named-content></ack>
<app-group><app><title>APPENDIX $k</title><p>APP $w0</p></app></app-group>
<ref-list><ref>REFERENCE NOT EXTRACTED</ref></ref-list>
</back></article>"""
  }

  def elsevierXml(id: Long, text: String, source: String): String = {
    val k = key(id)
    val w0 = firstWord(text)
    s"""<doc:document xmlns:doc="http://example.org/doc" xmlns:ja="http://example.org/ja" xmlns:ce="http://example.org/ce">
<ja:article><ja:head><ce:title>TITLE $k</ce:title></ja:head>
<ja:body><ce:sections><ce:section><ce:label>1</ce:label><ce:section-title>Introduction</ce:section-title>
<ce:para>$text</ce:para></ce:section></ce:sections>
<ce:acknowledgment><ce:section-title>Acknowledgments</ce:section-title><ce:para>THANK YOU $source</ce:para></ce:acknowledgment>
<ce:appendices><ce:section><ce:label>Appendix A</ce:label><ce:para>APP $w0</ce:para></ce:section></ce:appendices>
</ja:body>
<ja:tail><ce:bibliography><ce:bib-reference>REFERENCE NOT EXTRACTED</ce:bib-reference></ce:bibliography></ja:tail>
</ja:article></doc:document>"""
  }

  def teiXml(id: Long, text: String, source: String): String = {
    val k = key(id)
    s"""<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><title>TITLE $k</title></teiHeader>
<text><body><div><head>Intro</head><p>$text</p></div>
<div type="acknowledgement"><p>ACK $source</p></div></body></text></TEI>"""
  }

  def htmlMain(id: Long, text: String, source: String): String = {
    val k = key(id)
    s"""<HTML><HEAD><TITLE>TITLE $k</TITLE></HEAD><BODY>
<P>PRE $k JOURNAL</P>
<H3><A NAME="s1">1 Introduction</A></H3>
$text
<P><A HREF="table_$k.html"><STRONG>Table $k:</STRONG></A></P>
<IMG SRC="img$k.gif">
<H2>References</H2>
<UL><LI>REFERENCE NOT EXTRACTED</LI></UL>
<ADDRESS>COPYRIGHT $k</ADDRESS>
</BODY></HTML>"""
  }

  def htmlTable(id: Long): String = {
    val k = key(id)
    s"""<HTML><BODY><DIV><TABLE><CAPTION>Table $k: ONLY IN TABLE $k</CAPTION><TR><TD>CELL $k</TD></TR></TABLE></DIV></BODY></HTML>"""
  }

  /** PDF layout: first ceil(n/2) words in the left column (x=100), rest in the
    * right column (x=1400), one word per line (y = 100*i). An image object
    * sits at the bottom of the left column. Runs are EMITTED in scrambled
    * order (sorted by y then x, i.e. interleaving the columns) so the
    * reading-order reconstruction is actually exercised.
    */
  def pdfSpans(id: Long, text: String): Vector[Span] = {
    val k = key(id)
    val words = text.split(" ").filter(_.nonEmpty)
    val half = (words.length + 1) / 2
    val runs = words.zipWithIndex.map { case (w, i) =>
      if (i < half) (100, 100 * (i + 1), w)
      else (1400, 100 * (i - half + 1), w)
    }
    val image = (100, 100 * (half + 1), null: String) // left-column bottom
    val scrambled = (runs :+ image).sortBy { case (x, y, _) => (y, x) }
    scrambled.zipWithIndex.map { case ((x, y, w), i) =>
      if (w == null) Span("image", null, s"1:$x:$y:pimg$k.png", i)
      else Span("run", w, s"1:$x:$y", i)
    }.toVector
  }

  // --------------------------------------------------------------- documents

  /** A well-formed document (used by the extraction queries). */
  def doc(id: Long, text: String, source: String): Doc = {
    val spans: Vector[Span] = fmtCode(id) match {
      case 0 | 1 | 2 => Vector(Span("raw", text, null, 0))
      case 3 | 4     => Vector(Span("raw", jatsXml(id, text, source), null, 0))
      case 5         => Vector(Span("raw", elsevierXml(id, text, source), null, 0))
      case 6         => Vector(Span("raw", teiXml(id, text, source), null, 0))
      case 7 => Vector(
        Span("raw", htmlMain(id, text, source), null, 0),
        Span("table", htmlTable(id), s"table_${key(id)}.html", 1))
      case _ => pdfSpans(id, text)
    }
    Doc(key(id), format(id), provider(id), sourcePath(id), spans, updateFlag(id), srcMtime(id))
  }

  /** txt docs split into two raw parts (multi-file case, utils.py:286-312). */
  def multipartDoc(id: Long, text: String, source: String): Doc = {
    val (a, b) = splitWords(text)
    doc(id, text, source).copy(spans = Vector(Span("raw", a, null, 0), Span("raw", b, null, 1)))
  }

  // ------------------------------------------------------ checker-side state

  /** force flags planted by id (utils.py:105-111) */
  def updateFlag(id: Long): String =
    if (id % 13 == 0) "FORCE_TO_EXTRACT"
    else if (id % 13 == 1) "FORCE_TO_SEND"
    else null

  /** Checker-corpus variant: plants zero-byte and missing-source docs
    * (checker.py:239-248).
    */
  def checkerDoc(id: Long, text: String, source: String): Doc = {
    val d = doc(id, text, source)
    if (id % 23 == 0) d.copy(spans = null)
    else if (id % 17 == 0) d.copy(spans = Vector(Span("raw", "", null, 0)))
    else d
  }

  final case class PrevState(
      doc_id: String,
      prev_ft_source: String,
      meta_mtime: java.sql.Timestamp,
      fulltext_mtime: java.sql.Timestamp,
      prev_malformed: Boolean
  )

  /** Previous-snapshot row by id (None = never extracted):
    *   id%7==0 no row · 1 fresh · 2 differing path · 3 src newer than meta ·
    *   4 meta newer than fulltext · 5 malformed meta · 6 missing ft_source
    * (meta_needs_update, checker.py:123-192)
    */
  def prevState(id: Long): Option[PrevState] = {
    val day = 86400000L
    val src = srcMtime(id).getTime
    def t(ms: Long) = new java.sql.Timestamp(ms)
    (id % 7) match {
      case 0 => None
      case 1 => Some(PrevState(key(id), sourcePath(id), t(src + day), t(src + 2 * day), prev_malformed = false))
      case 2 => Some(PrevState(key(id), sourcePath(id) + ".old", t(src + day), t(src + 2 * day), prev_malformed = false))
      case 3 => Some(PrevState(key(id), sourcePath(id), t(src - day), t(src + 2 * day), prev_malformed = false))
      case 4 => Some(PrevState(key(id), sourcePath(id), t(src + 2 * day), t(src + day), prev_malformed = false))
      case 5 => Some(PrevState(key(id), sourcePath(id), t(src + day), t(src + 2 * day), prev_malformed = true))
      case _ => Some(PrevState(key(id), null, t(src + day), t(src + 2 * day), prev_malformed = false))
    }
  }
}
