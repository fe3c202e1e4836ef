package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Smoke test for the single-doc diagnostic entry (reference run.py
  * --diagnose, run.py:205-224): the report runs the real pipeline on one doc
  * and surfaces each stage's view.
  */
class DiagnoseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("diagnose an XML doc: checker verdict, spans, and fields in the report") {
    // doc 63: 63%10==3 -> xml format, 63%7==0 -> NOT_EXTRACTED_BEFORE
    val r = Diagnose.report(spark, "/root/testdata/sf0.001", 63L)
    assert(r.contains("doc_id:        D000000063"))
    assert(r.contains("format:        xml"))
    assert(r.contains("update_reason: NOT_EXTRACTED_BEFORE"))
    assert(r.contains("spans (5):"))
    assert(r.contains("media"))
    assert(r.contains("I. INTRODUCTION"))
    assert(r.contains("lineage:       diagnose-63/D000000063"))
  }

  test("diagnose a fresh doc: reports the checker skip instead of extracting") {
    // a doc that is current and unforced is dropped by the checker:
    // id%7==1 && id%13>1 && id%17!=0 && id%23!=0 — id 50 qualifies
    val r = Diagnose.report(spark, "/root/testdata/sf0.001", 50L)
    assert(r.contains("SKIPPED"))
  }
}
