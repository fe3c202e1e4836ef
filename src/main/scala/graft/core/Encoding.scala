package graft.core

import java.nio.charset.{CharacterCodingException, StandardCharsets}

/** Charset sniffing + decode (reference: UnicodeDammit usage,
  * adsft/extraction.py:418-425 — "detect the encoding of the xml file
  * (Latin-1, UTF-8, etc.)" then decode with errors='ignore').
  *
  * Our synthetic input arrives as UTF-8 strings, but the operator is kept for
  * binary sources: BOM detection, an XML-declaration encoding hint, strict
  * UTF-8 validation, Latin-1 fallback (which never fails).
  */
object Encoding {

  private val declRe =
    """(?s)^.{0,6}<\?xml[^>]*encoding=["']([A-Za-z0-9._-]+)["']""".r

  def detect(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
        (bytes(2) & 0xff) == 0xbf) return "UTF-8"
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff) return "UTF-16BE"
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe) return "UTF-16LE"
    // XML declaration hint (ASCII-compatible prefix)
    val head = new String(bytes.take(256), StandardCharsets.ISO_8859_1)
    declRe.findFirstMatchIn(head).foreach { m =>
      val enc = m.group(1)
      if (java.nio.charset.Charset.isSupported(enc)) return java.nio.charset.Charset.forName(enc).name()
    }
    // strict UTF-8 validation, else Latin-1
    try {
      StandardCharsets.UTF_8.newDecoder().decode(java.nio.ByteBuffer.wrap(bytes))
      "UTF-8"
    } catch { case _: CharacterCodingException => "ISO-8859-1" }
  }

  /** Decode with detected charset, dropping malformed sequences (errors="ignore"). */
  def decode(bytes: Array[Byte]): String = {
    val cs = java.nio.charset.Charset.forName(detect(bytes))
    val body =
      if (cs == StandardCharsets.UTF_8 && bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
          (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf) bytes.drop(3)
      else bytes
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.IGNORE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.IGNORE)
    dec.decode(java.nio.ByteBuffer.wrap(body)).toString
  }
}
