package graft.core

/** Grobid PDF extractor (reference GrobidPDFExtractor,
  * adsft/extraction.py:1133-1173) — the E12 operator, previously a stub.
  *
  * Semantics mirrored:
  *  - POST the raw PDF payload to the configured Grobid service as a
  *    multipart file field named "input", 120 s timeout
  *    (extraction.py:1138, :1151)
  *  - HTTP 200 -> the response body (the TEI XML string) IS the fulltext:
  *    the reference stores the XML verbatim rather than parsing it
  *    (extraction.py:1160-1161), and its writer lands it as
  *    `grobid_fulltext.xml` with the meta file skipped (writer.py:167-176)
  *  - non-200 / timeout / transport error / unconfigured service -> EMPTY
  *    fulltext, not a failure: every error branch in the reference logs and
  *    falls through to the cleaner with "" (extraction.py:1146-1167)
  *  - the cleaning kernel runs with translate=False, decode=True,
  *    normalise=True, trim=True (extraction.py:1168-1171)
  *
  * The transport is injectable exactly like [[HttpExtractor.Transport]] so
  * the extractor is unit-testable without a network; [[defaultTransport]]
  * is a real JDK multipart POST for deployments with a Grobid service.
  */
object GrobidExtractor {

  /** (serviceUrl, fileFieldName, payload) => response */
  type Transport = (String, String, Array[Byte]) => HttpExtractor.Response

  /** Reference request timeout (extraction.py:1138). */
  val TimeoutMs: Int = 120 * 1000

  /** Post `payload` to the service and clean the TEI response. Returns the
    * cleaned fulltext — empty on any failure or when no service is
    * configured, mirroring the reference's never-fail contract.
    */
  def extract(payload: Array[Byte], service: Option[String],
      transport: Transport): String = {
    val xml = service match {
      case None => "" // "Grobid service not defined" (extraction.py:1166-1167)
      case Some(url) =>
        try {
          val resp = transport(url, "input", payload)
          if (resp.status == 200) Option(resp.body).getOrElse("")
          else "" // "Grobid service response error" (extraction.py:1162-1164)
        } catch {
          // a task kill/cancel must propagate, not become a "successful"
          // empty extraction — restore the interrupt flag and rethrow
          case ie: InterruptedException =>
            Thread.currentThread().interrupt(); throw ie
          case scala.util.control.NonFatal(_) =>
            "" // timeout / request exception (extraction.py:1150-1156)
        }
    }
    CleanText.run(xml, translateFlag = false, normaliseFlag = true, trimFlag = true)
  }

  /** Real multipart/form-data POST (JDK HttpClient). Unused in the sandbox
    * (zero egress) — injected by a deployment with a Grobid service.
    */
  lazy val defaultTransport: Transport = {
    // ONE shared client per JVM: HttpClient owns a selector thread and a
    // connection pool — per-request construction would churn threads/FDs
    // and defeat keep-alive to the single Grobid endpoint. Created on first
    // request (lazy) so referencing the transport costs nothing.
    lazy val client = java.net.http.HttpClient.newHttpClient()
    (url, field, payload) => {
      val boundary = "----graft-" + java.util.UUID.randomUUID().toString
      val head = (s"--$boundary\r\n" +
        s"""Content-Disposition: form-data; name="$field"; filename="input.pdf"\r\n""" +
        "Content-Type: application/octet-stream\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val tail = s"\r\n--$boundary--\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val body = new Array[Byte](head.length + payload.length + tail.length)
      System.arraycopy(head, 0, body, 0, head.length)
      System.arraycopy(payload, 0, body, head.length, payload.length)
      System.arraycopy(tail, 0, body, head.length + payload.length, tail.length)
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", s"multipart/form-data; boundary=$boundary")
        .timeout(java.time.Duration.ofMillis(TimeoutMs))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpExtractor.Response(resp.statusCode(), resp.body())
    }
  }
}
