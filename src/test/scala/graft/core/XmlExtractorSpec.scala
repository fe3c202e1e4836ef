package graft.core

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests driven by the reference's own stub corpus (read at test time
  * from the read-only reference checkout; each expectation cites the
  * reference test asserting the same bytes). Skipped cleanly when the
  * reference corpus is not present.
  */
class XmlExtractorSpec extends AnyFunSuite {

  private val unitStub = "/root/reference/tests/test_unit/stub_data"
  private val intStub = "/root/reference/tests/test_integration/stub_data"

  private def load(path: String): String = {
    assume(Files.exists(Paths.get(path)), s"reference stub not present: $path")
    Encoding.decode(Files.readAllBytes(Paths.get(path)))
  }

  private val bodyGolden =
    "I. INTRODUCTION INTRODUCTION GOES HERE " +
      "II. SECTION II THIS SECTION TESTS HTML ENTITIES LIKE Å >. " +
      "III. SECTION III THIS SECTION TESTS THAT THE TAIL IS PRESERVED . " +
      "IV. SECTION IV THIS SECTION TESTS THAT COMMENTS ARE REMOVED. " +
      "V. SECTION V THIS SECTION TESTS THAT CDATA IS REMOVED. " +
      "Manual Entry 1 Manual Entry 2 TABLE I. TEXT a NOTES a TEXT"

  test("JATS body golden (test_extraction.py:333-339 test_body_tag)") {
    val raw = load(s"$unitStub/test.xml")
    val prepared = XmlExtractor.prepare(raw)
    assert(prepared.extractString("//body") == bodyGolden)
  }

  test("JATS per-section goldens: entities, tail, comments, CDATA (test_extraction.py:231-287)") {
    val raw = load(s"$unitStub/test.xml")
    val p = XmlExtractor.prepare(raw)
    assert(p.extractString("//body//sec[@id=\"s2\"]//p") == "THIS SECTION TESTS HTML ENTITIES LIKE Å >.")
    assert(p.extractString("//body//sec[@id=\"s3\"]//p") == "THIS SECTION TESTS THAT THE TAIL IS PRESERVED .")
    assert(p.extractString("//body//sec[@id=\"s4\"]//p") == "THIS SECTION TESTS THAT COMMENTS ARE REMOVED.")
    assert(p.extractString("//body//sec[@id=\"s5\"]//p") == "THIS SECTION TESTS THAT CDATA IS REMOVED.")
  }

  test("JATS table label/caption/footer kept, content dropped (test_extraction.py:289-308)") {
    val raw = load(s"$unitStub/test.xml")
    val p = XmlExtractor.prepare(raw)
    assert(p.extractString("//body//table-wrap") == "TABLE I. TEXT a NOTES a TEXT")
  }

  test("JATS full extraction: fulltext, ack, dataset, facility (test_extraction.py:184-382, test_tasks.py:91-94)") {
    val raw = load(s"$unitStub/test.xml")
    val r = XmlExtractor.extract(raw, "xml")

    assert(r.fulltext ==
      bodyGolden + "\nAPPENDIX: APPENDIX TITLE GOES HERE APPENDIX CONTENT")

    assert(r.acknowledgements ==
      "Acknowledgments WE ACKNOWLEDGE. Facilities: FacilityName1 , FacilityName2 , " +
        "FacilityName3 , FacilityName4 , FacilityName5 , FacilityName6 , FacilityName7" +
        "\nACK INSIDE BODY TAG.")

    assert(r.dataset == Vector("ADS/Sa.CXO#Obs/11458", "ADS/Sa.CXO#Obs/11459"))
    assert(r.facility.sorted ==
      Vector("FacilityID3", "FacilityID4", "FacilityID5", "FacilityID6", "FacilityID7"))
  }

  test("JATS span sequence: media refs interleaved in document order") {
    val raw = load(s"$unitStub/test.xml")
    val r = XmlExtractor.extract(raw, "xml")
    val kinds = r.spans.map(_.kind)
    val medias = r.spans.filter(_.kind == "media").map(_.media_ref)
    // six table graphics interleaved at their position + the floats-group f1 trailing
    assert(medias == Vector(
      "apj523416t3_tb.gif", "apj523416t3_lr.gif", "apj523416t3a_tb.gif",
      "apj523416t3a_lr.gif", "apj523416t3b_tb.gif", "apj523416t3b_lr.gif", "f1"))
    // span text re-joins to the fulltext groups
    val textSpans = r.spans.filter(_.kind == "text").map(_.text)
    assert(textSpans.head.startsWith("I. INTRODUCTION"))
    assert(textSpans.head.endsWith("TABLE I. TEXT a"))
    assert(textSpans.contains("NOTES a TEXT"))
    assert(textSpans.last == "APPENDIX: APPENDIX TITLE GOES HERE APPENDIX CONTENT")
    // offsets dense from 0
    assert(r.spans.map(_.offset) == r.spans.indices.toVector)
    // media spans sit between the body text and the footer text
    assert(kinds.count(_ == "media") == 7)
  }

  test("integration full_test.xml fulltext golden (test_full_range_of_formats.py:137)") {
    val raw = load(s"$intStub/full_test.xml")
    val r = XmlExtractor.extract(raw, "xml")
    assert(r.fulltext ==
      "I. INTRODUCTION INTRODUCTION GOES HERE Manual Entry TABLE I. TEXT a NOTES a TEXT" +
        "\nAPPENDIX: APPENDIX TITLE GOES HERE APPENDIX CONTENT")
  }

  test("Elsevier golden (test_full_range_of_formats.py:138, test_extraction.py:532-726)") {
    val raw = load(s"$intStub/full_test_elsevier.xml")
    val r = XmlExtractor.extract(raw, "xmlelsevier")
    assert(r.fulltext ==
      "1 Introduction JOURNAL CONTENT Acknowledgments THANK YOU Appendix A APPENDIX TITLE APPENDIX")
    assert(r.acknowledgements == "Acknowledgments THANK YOU")
  }

  test("Elsevier unit stub: body contains JOURNAL CONTENT (test_extraction.py:605)") {
    val raw = load(s"$unitStub/test_elsevier.xml")
    val r = XmlExtractor.extract(raw, "xmlelsevier")
    assert(r.fulltext.contains("JOURNAL CONTENT"))
  }

  test("TEI acknowledgements golden (test_extraction.py:518-528)") {
    val raw = load(s"$unitStub/test.astro-ph-0002105.tei.xml")
    val r = XmlExtractor.extract(raw, "teixml")
    val ack = "Acknowledgements. The usefulness of a bibliographic service is only as good as the " +
      "quality and quantity of the data it contains . The ADS project has been lucky in " +
      "benefitting from the skills and dedication of several people who have significantly " +
      "contributed to the creation and management of the underlying datasets. In particular, " +
      "we would like to acknowledge the work of Elizabeth Bohlen, Donna Thompson, Markus " +
      "Demleitner, and Joyce Watson. Funding for this project has been provided by NASA under " +
      "grant NCC5-189."
    assert(r.acknowledgements == ack)
  }

  test("TEI title (test_extraction.py:479-483)") {
    val raw = load(s"$unitStub/test.astro-ph-0002105.tei.xml")
    val p = XmlExtractor.prepare(raw)
    assert(p.extractString("//title") ==
      "ASTRONOMY AND ASTROPHYSICS The NASA Astrophysics Data System: Architecture")
  }

  test("IOP ISO-8859-1 re-encode + article-number (test_extraction.py:92-107)") {
    val raw = load(s"$unitStub/test.stmp_2_1_014010.iop.xml")
    val p = XmlExtractor.prepare(raw)
    assert(p.extractString("//article-number") == "483879")
  }

  test("garbage XML: all parsers fail -> empty body (test_extraction.py:400-434)") {
    val raw = load(s"$unitStub/test_failure.xml")
    val r = XmlExtractor.extract(raw, "xml")
    assert(r.fulltext == "")
    assert(r.acknowledgements == "")
    assert(r.dataset.isEmpty && r.facility.isEmpty)
  }

  test("body-comment unwrap (test_extraction.py:384-398, issue 104)") {
    val raw = "<!-- body <body><p>body content</p></body> endbody -->"
    assert(XmlExtractor.removeSpecialElements(raw) == "<body><p>body content</p></body> ")
  }
}
