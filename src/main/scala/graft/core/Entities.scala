package graft.core

/** HTML/LaTeX entity conversion (reference: adsft/entitydefs.py:1903-1928).
  *
  * The reference replaces every `&name;`, `&#digits;`, `&#xhex;` occurrence by
  * looking the captured token up in a fixed 1,881-entry dictionary (the
  * public W3C/ISO entity sets — HTML5 named references, ISO 8879 SGML sets
  * like isoamsa/isogrk, publisher aliases); tokens NOT present in the
  * dictionary — including all numeric character references — are replaced
  * with the empty string (entitymap returns None for unknown keys and re.sub
  * drops it). We reproduce that exact behavior, including its quirks:
  * the reference table has NO `amp` and NO `lt` entry (so `&amp;`/`&lt;`
  * are deleted outright) and maps both `quot` and `apos` to an apostrophe.
  *
  * The table ships as a generated resource (`graft/entities.tsv`, one
  * `name<TAB>\\uXXXX…` row per entity) so the full public data set is
  * represented without a 2,000-line source file; EntitiesSpec diffs the
  * loaded map against the reference's own data file at test time.
  *
  * Conversion happens on the RAW document string BEFORE parsing
  * (adsft/extraction.py:429, 182), which is why the characters produced
  * here can still be dropped later by the lenient parser (e.g. a bare `<`).
  */
object Entities {

  /** name -> replacement string (possibly multi-char: combining sequences
    * like `nsubseteqq` -> "⫅̸").
    */
  val table: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/entities.tsv")
    require(in != null, "graft/entities.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val tab = line.indexOf('\t')
        val name = line.substring(0, tab)
        val esc = line.substring(tab + 1)
        // value encoded as a run of \uXXXX escapes (ASCII-safe resource)
        val sb = new java.lang.StringBuilder(4)
        var i = 0
        while (i < esc.length) {
          sb.append(Integer.parseInt(esc.substring(i + 2, i + 6), 16).toChar)
          i += 6
        }
        name -> sb.toString
      }.toMap
    } finally src.close()
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  @inline private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Replace entities per the reference regex `&(#\d+|#x[0-9a-fA-F]+|\w+);`
    * (entitydefs.py:1928): known named entity -> its character; anything else
    * (numeric references, unknown names) -> removed. Hand-written scanner
    * instead of java.util.regex — in a Spark JVM the regex engine's predicate
    * lambdas go megamorphic and run ~10x slower (see XmlExtractor note); this
    * runs on every raw document.
    */
  def convert(s: String): String = {
    if (s == null) return null
    var i = s.indexOf('&')
    if (i < 0) return s
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (i >= 0) {
      var j = i + 1
      var rep: String = null
      var end = -1
      if (j < n && s.charAt(j) == '#') {
        j += 1
        val hex = j < n && s.charAt(j) == 'x'
        if (hex) j += 1
        val d0 = j
        while (j < n && (if (hex) isHexDigit(s.charAt(j)) else s.charAt(j) >= '0' && s.charAt(j) <= '9')) j += 1
        if (j > d0 && j < n && s.charAt(j) == ';') { end = j; rep = "" }
      } else {
        val d0 = j
        while (j < n && isWordChar(s.charAt(j))) j += 1
        if (j > d0 && j < n && s.charAt(j) == ';') {
          end = j
          rep = table.getOrElse(s.substring(d0, j), "")
        }
      }
      if (end >= 0) {
        if (sb == null) sb = new java.lang.StringBuilder(n)
        sb.append(s, last, i).append(rep)
        last = end + 1
        i = s.indexOf('&', last)
      } else i = s.indexOf('&', i + 1)
    }
    if (sb == null) s
    else { sb.append(s, last, n); sb.toString }
  }
}
