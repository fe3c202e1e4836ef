package graft.core.xml

import scala.collection.mutable.ArrayBuffer

sealed trait Tok
final case class TStart(name: String, attrs: Vector[(String, String)], selfClose: Boolean) extends Tok
final case class TEnd(name: String) extends Tok
final case class TText(text: String) extends Tok

/** Lenient XML/HTML tokenizer, written from scratch.
  *
  * Behavior notes tied to the reference:
  *  - Entity conversion already ran on the raw string
  *    (adsft/extraction.py:429); any `&` still present is an invalid entity
  *    start which the reference's recovering parsers drop — we drop it too
  *    (observable in the goldens: `&amp;` -> `&` -> gone,
  *    adsft/tests/test_extraction.py:244 expects `LIKE Å >.`).
  *  - Comments / CDATA / processing instructions were removed by the regex
  *    pre-pass (adsft/extraction.py:482-522); the `<!`/`<?` arms here are
  *    lenient leftovers handling (doctype etc.), skipped without output.
  *  - A `<` not starting a name/closer/decl is treated as literal text
  *    (recovering-parser behavior).
  */
object Tokenizer {

  @inline private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'

  @inline private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '.' || c == ':'

  def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = s.length
    var i = 0
    val text = new java.lang.StringBuilder(256)

    def flushText(): Unit = {
      if (text.length > 0) { out += TText(text.toString); text.setLength(0) }
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        i += 1 // dropped (see scaladoc)
      } else if (c != '<') {
        text.append(c); i += 1
      } else if (i + 1 >= n) {
        text.append(c); i += 1
      } else {
        val d = s.charAt(i + 1)
        if (d == '/') {
          // end tag
          var j = i + 2
          val st = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = s.substring(st, j)
          while (j < n && s.charAt(j) != '>') j += 1
          if (name.nonEmpty) { flushText(); out += TEnd(name) }
          i = if (j < n) j + 1 else n
        } else if (d == '!') {
          // markup declaration (doctype; comments were pre-stripped): skip to '>'
          var j = i + 2
          while (j < n && s.charAt(j) != '>') j += 1
          i = if (j < n) j + 1 else n
        } else if (d == '?') {
          // processing instruction leftover: skip to '?>' or '>'
          var j = i + 2
          while (j < n && s.charAt(j) != '>') j += 1
          i = if (j < n) j + 1 else n
        } else if (isNameStart(d)) {
          // start tag
          var j = i + 1
          val st = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = s.substring(st, j)
          val attrs = Vector.newBuilder[(String, String)]
          var selfClose = false
          var done = false
          while (!done && j < n) {
            while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
            if (j >= n) done = true
            else s.charAt(j) match {
              case '>' => j += 1; done = true
              case '/' =>
                j += 1
                if (j < n && s.charAt(j) == '>') { selfClose = true; j += 1; done = true }
              case _ =>
                val as = j
                while (j < n && !Character.isWhitespace(s.charAt(j)) &&
                       s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
                val aname = s.substring(as, j)
                while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
                var avalue = ""
                if (j < n && s.charAt(j) == '=') {
                  j += 1
                  while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
                  if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                    val q = s.charAt(j); j += 1
                    val vs = j
                    while (j < n && s.charAt(j) != q) j += 1
                    avalue = s.substring(vs, j)
                    if (j < n) j += 1
                  } else {
                    val vs = j
                    while (j < n && !Character.isWhitespace(s.charAt(j)) && s.charAt(j) != '>') j += 1
                    avalue = s.substring(vs, j)
                  }
                }
                if (aname.nonEmpty) attrs += (aname -> avalue)
            }
          }
          flushText()
          out += TStart(name, attrs.result(), selfClose)
          i = j
        } else {
          // stray '<': literal text
          text.append(c); i += 1
        }
      }
    }
    flushText()
    out.result()
  }
}
