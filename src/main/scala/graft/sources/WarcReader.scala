package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream
import scala.util.control.NonFatal

import graft.core.Page

/** Hand-written WARC (ISO 28500) reader — the Common-Crawl container
  * format, so a real crawl archive can feed the pipeline directly
  * (`Ingest.fromWarc`). Scope: WARC/1.0 and /1.1 `response` records; the
  * HTTP payload after the response headers becomes the page's `html`
  * bytes, `WARC-Target-URI` the url, `WARC-Date` the timestamp.
  *
  * Deterministic and never-throw. Malformed records (bad header line,
  * unparseable/oversized Content-Length, truncated body) are SKIPPED and
  * the reader RESYNCS by scanning forward to the next `\r\n\r\nWARC/`
  * record boundary — one bad record in a real crawl archive must not lose
  * the file's tail. The skip count is surfaced via [[recordsWithStats]].
  * Handles plain and gzip-compressed files, including the Common-Crawl
  * layout of one gzip MEMBER per record (GZIPInputStream reads
  * concatenated members transparently).
  */
object WarcReader {

  /** Per-record payload cap — the 100 MB nginx body-cap analog. */
  val MaxPayload: Int = 100 * 1024 * 1024
  val MaxHeaderBytes = 64 * 1024
  val MaxRecordsPerFile = 1 << 20

  /** Parse every response record of one WARC file (plain or gzip). */
  def records(fileBytes: Array[Byte]): Vector[Page] =
    recordsWithStats(fileBytes)._1

  /** Response records plus the count of malformed records skipped over
    * (framing recovered by boundary resync). */
  def recordsWithStats(fileBytes: Array[Byte]): (Vector[Page], Long) = {
    try {
      val in: InputStream =
        if (fileBytes.length >= 2 && (fileBytes(0) & 0xff) == 0x1f &&
            (fileBytes(1) & 0xff) == 0x8b)
          new GZIPInputStream(new ByteArrayInputStream(fileBytes), 1 << 16)
        else new ByteArrayInputStream(fileBytes)
      try readAll(in) finally in.close()
    } catch { case NonFatal(_) => (Vector.empty, 0L) }
  }

  private sealed trait Rec
  private final case class RecPage(p: Page) extends Rec
  private case object RecSkipped extends Rec // valid framing, non-response
  private case object RecMalformed extends Rec // framing lost: resync needed
  private case object RecEof extends Rec

  private def readAll(in0: InputStream): (Vector[Page], Long) = {
    val in = new PushbackInputStream(in0, 8)
    val out = Vector.newBuilder[Page]
    var skipped = 0L
    var n = 0
    var eof = false
    while (!eof && n < MaxRecordsPerFile) {
      readRecord(in) match {
        case RecEof => eof = true
        case RecPage(p) => out += p; n += 1
        case RecSkipped => n += 1
        case RecMalformed =>
          skipped += 1
          n += 1
          if (!resync(in)) eof = true
      }
    }
    (out.result(), skipped)
  }

  private val WarcMagic = "WARC/".getBytes(StandardCharsets.US_ASCII)

  /** Scan forward to the next `\r\n\r\nWARC/` boundary; push the `WARC/`
    * back so the next header read starts clean. False at end of stream.
    * Matching uses a rolling last-9-bytes window (not a restart-on-
    * mismatch state machine, whose naive restart loses self-overlapping
    * prefixes — e.g. an extra CRLF before the boundary would skip a
    * recoverable record). */
  private def resync(in: PushbackInputStream): Boolean = {
    val pat = "\r\n\r\nWARC/".getBytes(StandardCharsets.US_ASCII)
    val ring = new Array[Int](pat.length)
    var filled = 0
    var idx = 0
    var b = in.read()
    while (b >= 0) {
      ring(idx) = b
      idx = (idx + 1) % pat.length
      if (filled < pat.length) filled += 1
      if (filled == pat.length) {
        var k = 0
        while (k < pat.length && ring((idx + k) % pat.length) == (pat(k) & 0xff))
          k += 1
        if (k == pat.length) { in.unread(WarcMagic); return true }
      }
      b = in.read()
    }
    false
  }

  /** One WARC record. */
  private def readRecord(in: PushbackInputStream): Rec = {
    val headerBlock = readUntilBlankLine(in) match {
      case null => return RecEof // clean end of stream
      case "" => return RecMalformed // truncated/oversized header
      case h => h
    }
    val lines = headerBlock.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return RecMalformed
    var warcType: String = null
    var uri: String = null
    var date: String = null
    var len = -1L
    lines.iterator.drop(1).foreach { line =>
      val c = line.indexOf(':')
      if (c > 0) {
        val k = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = line.substring(c + 1).trim
        k match {
          case "warc-type" => warcType = v
          case "warc-target-uri" => uri = v.stripPrefix("<").stripSuffix(">")
          case "warc-date" => date = v
          case "content-length" =>
            len = try v.toLong catch { case _: NumberFormatException => -1L }
          case _ =>
        }
      }
    }
    if (len < 0 || len > MaxPayload) return RecMalformed // framing lost
    val body = readFully(in, len.toInt) match {
      case null => return RecMalformed // truncated body
      case b => b
    }
    skipRecordSeparator(in)
    if (warcType != "response" || uri == null || date == null)
      return RecSkipped // warcinfo/request/metadata records: skipped
    // body = HTTP response; payload starts after the header terminator
    val split = indexOfDoubleCrlf(body)
    val payload =
      if (split < 0) body // non-HTTP response content: take as-is
      else java.util.Arrays.copyOfRange(body, split + 4, body.length)
    val ts = parseWarcDate(date).getOrElse(return RecSkipped)
    RecPage(Page(uri, ts, payload, null, null))
  }

  /** Header block up to and excluding the blank line; null at clean EOF
    * (no bytes), "" when truncated or oversized. */
  private def readUntilBlankLine(in: InputStream): String = {
    val buf = new scala.collection.mutable.ArrayBuffer[Byte](512)
    var b = in.read()
    // skip leading CRLFs between records
    while (b == '\r' || b == '\n') b = in.read()
    if (b < 0) return null
    while (b >= 0 && buf.length < MaxHeaderBytes) {
      buf += b.toByte
      if (buf.length >= 4 &&
          buf(buf.length - 4) == '\r' && buf(buf.length - 3) == '\n' &&
          buf(buf.length - 2) == '\r' && buf(buf.length - 1) == '\n')
        return new String(buf.dropRight(4).toArray, StandardCharsets.ISO_8859_1)
      b = in.read()
    }
    "" // truncated/oversized header
  }

  private def readFully(in: InputStream, len: Int): Array[Byte] = {
    val b = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val n = in.read(b, off, len - off)
      if (n < 0) return null
      off += n
    }
    b
  }

  /** Consume the `\r\n\r\n` record separator; a non-CRLF byte (malformed
    * separator) is PUSHED BACK so the next record's header is intact. */
  private def skipRecordSeparator(in: PushbackInputStream): Unit = {
    try {
      var k = 0
      while (k < 4) {
        val b = in.read()
        if (b < 0) k = 4
        else if (b == '\r' || b == '\n') k += 1
        else { in.unread(b); k = 4 }
      }
    } catch { case _: EOFException => }
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** WARC-Date is ISO-8601 UTC (e.g. 2025-01-01T00:00:05Z). */
  private[sources] def parseWarcDate(s: String): Option[java.sql.Timestamp] =
    try Some(java.sql.Timestamp.from(java.time.Instant.parse(s)))
    catch { case NonFatal(_) => None }
}
