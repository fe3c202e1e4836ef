package graft.core.rules

/** Declarative field-extraction rule tables — the Scala re-expression of the
  * reference's META_CONTENT (adsft/rules.py:4-101). Order matters: results of
  * successive xpaths are appended (with containment dedup) and string fields
  * are '\n'-joined (adsft/extraction.py:885-966, rules.py:1-3 comment).
  */
final case class FieldRule(
    name: String,
    xpaths: Vector[String],
    isList: Boolean,
    attr: String = "xlink:href"
)

object Rules {

  /** JATS/NLM-style publisher XML (rules.py:5-36). */
  val xml: Vector[FieldRule] = Vector(
    FieldRule("fulltext", Vector(
      "//body",
      "//section[@type=\"body\"]",
      "//journalarticle-body",
      "//bdy",
      "//app-group",
      "//section[not(@type=\"acknowledgments\" or @type=\"dataAccess\" or @type=\"dataAvailability\" or @type=\"superSection\")]"
    ), isList = false),
    FieldRule("acknowledgements", Vector(
      "//ack",
      "//section[@type=\"acknowledgments\"]",
      "//subsection[@type=\"acknowledgement\" or @type=\"acknowledgment\"]"
    ), isList = false),
    FieldRule("dataset", Vector("//named-content[@content-type=\"dataset\"]"), isList = true),
    FieldRule("facility", Vector("//named-content[@content-type=\"facility\"]"), isList = true)
  )

  /** Grobid TEI output (rules.py:37-50). */
  val teixml: Vector[FieldRule] = Vector(
    FieldRule("fulltext", Vector("//body"), isList = false),
    FieldRule("acknowledgements", Vector("//div[@type=\"acknowledgement\"]"), isList = false)
  )

  /** Elsevier ja:/ce: XML (rules.py:51-76). */
  val xmlelsevier: Vector[FieldRule] = Vector(
    FieldRule("fulltext", Vector("//body", "//raw-text", "//appendices"), isList = false),
    FieldRule("acknowledgements", Vector(
      "//acknowledgment",
      "//ack",
      "//section[@type=\"acknowledgments\"]",
      "//subsection[@type=\"acknowledgement\" or @type=\"acknowledgment\"]",
      "//*[local-name()=\"acknowledgment\"]"
    ), isList = false),
    FieldRule("dataset", Vector("//named-content[@content-type=\"dataset\"]"), isList = true)
  )

  def forMeta(metaName: String): Vector[FieldRule] = metaName match {
    case "xml"         => xml
    case "teixml"      => teixml
    case "xmlelsevier" => xmlelsevier
    case other         => throw new IllegalArgumentException(s"unknown meta name: $other")
  }

  /** Elements whose subtrees are dropped (tail text preserved) before field
    * extraction (adsft/extraction.py:729-731). The processing-instruction
    * entry of the reference list is handled by the raw-string pre-pass.
    */
  val killList: Vector[String] = Vector(
    "//table", "//graphic", "//disp-formula", "//inline-formula",
    "//formula", "//tex-math", "//bibliography"
  )

  /** Acknowledgment-bearing nodes are moved out of their parent before
    * extraction so body text excludes them (adsft/extraction.py:733-735 —
    * note the reference always uses the *xml* table's ack xpaths here, for
    * every format; mirrored exactly).
    */
  val ackRelocate: Vector[String] =
    xml.find(_.name == "acknowledgements").get.xpaths

  /** HTML extraction xpaths (rules.py:77-95). */
  object Html {
    val introduction: Vector[String] = Vector(
      "//h2[contains(.,\"ntroduction\")]",
      "//h3[contains(.,\"ntroduction\")]",
      "//p[contains(.,\"Abstract\")]"
    )
    val references: Vector[String] = Vector("//h2[contains(.,\"References\")]")
    val table: Vector[String] = Vector("//table")
    def tableLinks(tableName: String): Vector[String] =
      Vector(s"""//a[contains(@href, "$tableName")]""")
  }
}
