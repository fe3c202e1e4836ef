package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Facility NER side-stage (reference: adsft/ner.py:19-38 + tasks.py:160-196,
  * which runs a spaCy model over acknowledgements and fulltext and set-dedups
  * the entity texts into facility_ner.json).
  *
  * The trained model is not public knowledge, so the recognizer here is the
  * documented gazetteer/regex fallback: entities are `FAC<digits>` tokens and
  * gazetteer names. The STAGE is the operator being re-expressed — scan both
  * text fields, extract, `array_distinct` (the reference's `list(set(...))`,
  * tasks.py:188), side-output one row per doc. Pure column expressions.
  */
object FacilityNer {

  val pattern = "FAC[0-9]+"

  /** input: extracted table with (doc_id, fulltext, acknowledgements).
    * output: (doc_id, facilities array) — deduped, sorted for determinism.
    */
  def identify(extracted: DataFrame): DataFrame =
    extracted.select(
      col("doc_id"),
      array_sort(array_distinct(concat(
        regexp_extract_all(coalesce(col("fulltext"), lit("")), lit(pattern), lit(0)),
        regexp_extract_all(coalesce(col("acknowledgements"), lit("")), lit(pattern), lit(0))
      ))).as("facilities"))
}
