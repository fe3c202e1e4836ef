package graft.gen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Doc

/** Spark-side synthesis of the interleaved-span input table from the driver's
  * `documents` parquet (TESTDATA.md). Deterministic: every row's spans are a
  * pure function of (doc_id, text, source) — see [[Synth]].
  */
object SpanGen {

  final case class DocRow(doc_id: Long, text: String, source: String)

  def documents(spark: SparkSession, sfDir: String): Dataset[DocRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
      .as[DocRow]
  }

  /** Well-formed corpus (extraction queries). */
  def docs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    documents(spark, sfDir).map(r => Synth.doc(r.doc_id, r.text, r.source))
  }

  /** Checker corpus: plants zero-byte (id%17==0) and missing-source
    * (id%23==0) docs.
    */
  def checkerDocs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    documents(spark, sfDir).map(r => Synth.checkerDoc(r.doc_id, r.text, r.source))
  }

  /** Previous-snapshot table for the checker join (id%7 families). */
  def prevState(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .flatMap(r => Synth.prevState(r.doc_id))
      .toDF()
  }

  /** txt corpus re-cut into two raw parts per doc (multi-file case). */
  def multipartTxtDocs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    documents(spark, sfDir)
      .filter(col("doc_id") % 10 < 2)
      .map(r => Synth.multipartDoc(r.doc_id, r.text, r.source))
  }
}
