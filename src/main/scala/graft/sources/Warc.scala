package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingestion — the crawl-native front door: every
  * CommonCrawl-derived pipeline starts from WARC segment files, not
  * from pre-extracted text. This reader turns a directory of `.warc`
  * (optionally gzipped) files into one row per record with the HTTP
  * response parsed out, ready for [[graft.operators.Html.extractMainText]] /
  * [[graft.operators.Html.extractLinks]] and the rest of the curation
  * stack (battery q115 parses, q116 composes WARC → main-content
  * extraction end to end).
  *
  * Format handled (the subset CommonCrawl actually emits):
  *  - `WARC/1.0` / `WARC/1.1` version line, CRLF header block,
  *    `Content-Length`-delimited payload (NEVER separator-scanned —
  *    payloads are arbitrary bytes), `\r\n\r\n` record terminator;
  *  - `response` records carry an HTTP/1.x message: status line,
  *    headers, `\r\n\r\n`, body — status code, `Content-Type`, and
  *    body are split out; other record types (`warcinfo`, `request`,
  *    `metadata`) surface with a NULL http side so callers can filter
  *    by `warc_type` without a second parse;
  *  - whole-file gzip and per-record-member gzip both decompress
  *    through the multi-member `GZIPInputStream` path (sniffed by
  *    magic bytes, not extension);
  *  - malformed records degrade, never throw: parsing stops at the
  *    first unrecoverable corruption in a file and whatever parsed
  *    stays (the quarantine philosophy — a torn tail must not kill
  *    the segment).
  *
  * Scale shape: `binaryFile` read + one kernel pass per segment file.
  * Parallelism is PER FILE — exactly how WARC is consumed everywhere
  * (CommonCrawl ships ~1 GB segments precisely so that one task per
  * segment saturates a cluster); the kernel is a single forward scan,
  * O(bytes), no regex, bounded buffers per record. Body bytes stay
  * `binary`; decode to text only after a charset decision — q116 uses
  * the ASCII/UTF-8 fast path. */
object Warc {

  /** One parsed record. `http_status`/`http_content_type`/`body` are
    * NULL for non-response records (and for responses whose HTTP
    * block is torn). */
  final case class WarcRecord(segment_path: String, record_index: Int,
                              warc_type: String, target_uri: String,
                              warc_date: String, content_length: Long,
                              http_status: Option[Int],
                              http_content_type: Option[String],
                              body: Array[Byte])

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte

  private[sources] def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] = {
    if (!isGzip(bytes)) return bytes
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](1 << 16)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => () } // torn tail: keep prefix
    out.toByteArray
  }

  /** Read one CRLF- (or bare-LF-) terminated ASCII line starting at
    * `pos`; returns (line without terminator, next pos), or null line
    * at end of input. */
  private def readLine(b: Array[Byte], pos: Int): (String, Int) = {
    if (pos >= b.length) return (null, pos)
    var i = pos
    while (i < b.length && b(i) != '\n'.toByte) i += 1
    val end = if (i > pos && b(i - 1) == '\r'.toByte) i - 1 else i
    val line = new String(b, pos, end - pos, java.nio.charset.StandardCharsets.ISO_8859_1)
    (line, math.min(i + 1, b.length))
  }

  /** The segment-parsing kernel: records in file order; stops at the
    * first unrecoverable corruption. */
  private[sources] def parseSegment(path: String,
                                    raw: Array[Byte]): Seq[WarcRecord] = {
    val b = gunzipIfNeeded(raw)
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    var ok = true
    while (ok && pos < b.length) {
      // skip inter-record blank lines
      var (line, p) = readLine(b, pos)
      while (line != null && line.isEmpty && p < b.length) {
        val r = readLine(b, p); line = r._1; p = r._2
      }
      if (line == null || !line.startsWith("WARC/")) {
        ok = false
      } else {
        // WARC header block
        var wtype: String = null
        var uri: String = null
        var date: String = null
        var clen = -1L
        var h = readLine(b, p)
        while (h._1 != null && h._1.nonEmpty) {
          val ci = h._1.indexOf(':')
          if (ci > 0) {
            val k = h._1.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
            val v = h._1.substring(ci + 1).trim
            k match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "content-length" =>
                try clen = v.toLong catch { case _: NumberFormatException => () }
              case _ => ()
            }
          }
          h = readLine(b, h._2)
        }
        val payloadStart = h._2
        if (clen < 0 || payloadStart + clen > b.length) {
          ok = false // torn record: keep what parsed so far
        } else {
          val payload = java.util.Arrays.copyOfRange(
            b, payloadStart, payloadStart + clen.toInt)
          val (status, ctype, body) =
            if (wtype == "response") parseHttp(payload)
            else (None, None, null)
          out += WarcRecord(path, idx, wtype, uri, date, clen,
            status, ctype, body)
          idx += 1
          pos = payloadStart + clen.toInt
        }
      }
    }
    out.result()
  }

  /** Split an HTTP/1.x response payload into (status, content-type,
    * body); (None, None, null) when the message is torn. */
  private[sources] def parseHttp(payload: Array[Byte])
      : (Option[Int], Option[String], Array[Byte]) = {
    val (statusLine, p0) = readLine(payload, 0)
    if (statusLine == null || !statusLine.startsWith("HTTP/"))
      return (None, None, null)
    val parts = statusLine.split(" ")
    val status = if (parts.length >= 2)
      try Some(parts(1).toInt) catch { case _: NumberFormatException => None }
    else None
    var ctype: Option[String] = None
    var h = readLine(payload, p0)
    while (h._1 != null && h._1.nonEmpty) {
      val ci = h._1.indexOf(':')
      if (ci > 0 &&
          h._1.substring(0, ci).trim.equalsIgnoreCase("content-type"))
        ctype = Some(h._1.substring(ci + 1).trim)
      h = readLine(payload, h._2)
    }
    val body = java.util.Arrays.copyOfRange(payload, h._2, payload.length)
    (status, ctype, body)
  }

  /** Build WARC segment bytes from `(warc_type, target_uri, payload)`
    * triples — the fixture/export half (and what the q115 oracle
    * replays): records in input order, CRLF framing, exact
    * Content-Lengths. `date` is a fixed literal by default so fixture
    * bytes are a pure function of the inputs. */
  def buildSegment(records: Seq[(String, String, Array[Byte])],
                   date: String = "2026-01-01T00:00:00Z"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val crlf = "\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    records.foreach { case (wtype, uri, payload) =>
      val hdr = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $wtype\r\n")
      if (uri != null) hdr.append(s"WARC-Target-URI: $uri\r\n")
      hdr.append(s"WARC-Date: $date\r\n")
        .append(s"Content-Length: ${payload.length}\r\n")
        .append("\r\n")
      out.write(hdr.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.write(payload)
      out.write(crlf); out.write(crlf)
    }
    out.toByteArray
  }

  /** An HTTP/1.1 200 response payload around a body — the fixture
    * complement of [[parseHttp]]. */
  def httpResponse(body: Array[Byte],
                   contentType: String = "text/html"): Array[Byte] = {
    val hdr = (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    hdr ++ body
  }

  /** Read a directory (or glob) of WARC segments: one row per record,
    * `(segment_path, record_index, warc_type, target_uri, warc_date,
    * content_length, http_status, http_content_type, body)`. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseSegment(p, bytes) }
      .toDF()
  }
}
