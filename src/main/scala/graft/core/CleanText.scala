package graft.core

import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.text.Normalizer

/** The text-cleaning kernel (reference: `TextCleaner`, adsft/utils.py:129-284).
  *
  * Four composable scalar operations:
  *  - translate: map a fixed set of Unicode code points to space or delete them
  *    (tables at adsft/utils.py:142-176)
  *  - decode:    bytes -> UTF-8 string, malformed sequences dropped
  *    (adsft/utils.py:212-223, errors="ignore")
  *  - normalise: Unicode NFKC (adsft/utils.py:225-250)
  *  - trimwords: drop whitespace-delimited tokens of >= 100 code points and
  *    re-join with single spaces (adsft/utils.py:252-261)
  *
  * Implemented as pure functions over a precomputed BMP lookup table so the
  * hot path is a single array index per char — this runs once per extracted
  * field per document inside `mapPartitions`.
  */
object CleanText {

  // --- translate tables (adsft/utils.py:142-176) ---------------------------
  // WHITE_SPACE family -> ' '
  private val spaceRanges: Array[(Int, Int)] = Array(
    (0x0b, 0x0d), (0xa0, 0xa0), (0x1680, 0x1680), (0x2000, 0x200a),
    (0x202f, 0x202f), (0x205f, 0x205f), (0x3000, 0x3000)
  )
  // controls / format chars / surrogates / private use / noncharacters -> delete
  private val deleteRangesBmp: Array[(Int, Int)] = Array(
    (0x00, 0x08), (0x0e, 0x1f), (0x7f, 0x84), (0x86, 0x9f), (0xad, 0xad),
    (0x200b, 0x200e), (0x202a, 0x202e), (0x2060, 0x2064), (0x206a, 0x206f),
    (0xd800, 0xdfff), (0xe000, 0xf8ff), (0xfdd0, 0xfddf), (0xfeff, 0xfeff),
    (0xfffe, 0xffff)
  )

  private final val KEEP: Byte = 0
  private final val SPACE: Byte = 1
  private final val DELETE: Byte = 2

  private val bmpTable: Array[Byte] = {
    val t = new Array[Byte](0x10000)
    deleteRangesBmp.foreach { case (a, b) => var i = a; while (i <= b) { t(i) = DELETE; i += 1 } }
    // space mappings take priority over deletions (utils.py:176 merge order)
    spaceRanges.foreach { case (a, b) => var i = a; while (i <= b) { t(i) = SPACE; i += 1 } }
    t
  }

  /** Supplementary-plane deletions: only the per-plane noncharacters
    * U+nFFFE/U+nFFFF (utils.py:160-168). Everything else above BMP is kept.
    */
  @inline private def deleteSupplementary(cp: Int): Boolean = (cp & 0xfffe) == 0xfffe

  /** Remove/replace escape and control characters (reference `translate`). */
  def translate(s: String): String = {
    if (s == null) return null
    val n = s.length
    // fast path: nothing to change (the common case for clean prose) —
    // avoids an allocation per call in the per-document hot loop
    var scan = 0
    while (scan < n && bmpTable(s.charAt(scan).toInt) == KEEP) scan += 1
    if (scan == n) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c) && i + 1 < n && Character.isLowSurrogate(s.charAt(i + 1))) {
        val cp = Character.toCodePoint(c, s.charAt(i + 1))
        if (!deleteSupplementary(cp)) sb.appendCodePoint(cp)
        i += 2
      } else {
        bmpTable(c.toInt) match {
          case KEEP   => sb.append(c)
          case SPACE  => sb.append(' ')
          case DELETE => ()
        }
        i += 1
      }
    }
    sb.toString
  }

  /** UTF-8 decode with malformed input dropped (reference `decode`, errors="ignore"). */
  def decodeUtf8Ignore(bytes: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** NFKC normalisation (reference `normalise`). NFKC is the identity on
    * pure-ASCII text; the scan is far cheaper than Normalizer's allocations,
    * and most real prose is ASCII-dominated.
    */
  def normalise(s: String): String = {
    if (s == null) return null
    var i = 0
    val n = s.length
    while (i < n && s.charAt(i) < 0x80) i += 1
    if (i == n) s else Normalizer.normalize(s, Normalizer.Form.NFKC)
  }

  /** Python-compatible whitespace predicate for `str.split()` semantics:
    * Java isWhitespace plus the Unicode Zs spaces Python treats as whitespace
    * (NBSP etc.) minus U+2007 FIGURE SPACE (non-breaking, not whitespace in
    * Python), plus U+0085 NEL.
    */
  @inline private[core] def isPyWhitespace(c: Char): Boolean =
    c == '\u0085' || Character.isWhitespace(c) ||
      (Character.isSpaceChar(c) && c != '\u2007')

  /** Drop tokens of >= maxLength code points; collapse whitespace runs to a
    * single space (reference `trimwords`, adsft/utils.py:252-261; threshold
    * 100 in the python pipeline — the java PDFBox path used 200,
    * src/main/java/org/adslabs/adsfulltext/PDFExtract.java:66 — tests pin 100).
    */
  def trimwords(s: String, maxLength: Int = 100): String = {
    if (s == null) return null
    val n = s.length
    // fast path: already single-space-separated short tokens, no lead/trail ws
    var scan = 0
    var tokLen = 0
    var prevSpace = true
    var clean = n > 0
    while (clean && scan < n) {
      val c = s.charAt(scan)
      if (c == ' ') {
        if (prevSpace) clean = false // leading or double space
        prevSpace = true
        tokLen = 0
      } else if (isPyWhitespace(c)) clean = false
      else {
        prevSpace = false
        tokLen += 1
        if (tokLen >= maxLength) clean = false
      }
      scan += 1
    }
    if (clean && !prevSpace) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var first = true
    while (i < n) {
      while (i < n && isPyWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isPyWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        if (s.codePointCount(start, i) < maxLength) {
          if (!first) sb.append(' ')
          sb.append(s, start, i)
          first = false
        }
      }
    }
    sb.toString
  }

  /** Composition wrapper mirroring TextCleaner.run (adsft/utils.py:263-284).
    * (`decode` is a no-op on an already-decoded String; the byte-level variant
    * is `decodeUtf8Ignore`.)
    */
  def run(text: String, translateFlag: Boolean = true, normaliseFlag: Boolean = true,
          trimFlag: Boolean = true): String = {
    if (text == null) return ""
    var t = text
    if (translateFlag) t = translate(t)
    if (normaliseFlag) t = normalise(t)
    if (trimFlag) t = trimwords(t)
    t
  }
}
