package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.core.Page

/** Deterministic minimal WARC/1.0 writer — closes WarcReader's input
  * domain the way PdfGen/ZipGen do for their parsers: the ingest tests
  * round-trip PagesGen pages through a generated archive. Emits a
  * warcinfo record (skipped by the reader) followed by one response
  * record per page, HTTP-framed. Optional per-archive gzip. */
object WarcGen {

  private def iso(ts: java.sql.Timestamp): String =
    java.time.Instant.ofEpochMilli(ts.getTime).toString

  /** Build one WARC archive from pages. */
  def build(pages: Seq[Page], gzip: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(1 << 16)
    def write(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))

    val info = "software: graft-warcgen\r\n"
    write("WARC/1.0\r\n")
    write("WARC-Type: warcinfo\r\n")
    write("WARC-Date: 2025-01-01T00:00:00Z\r\n")
    write(s"Content-Length: ${info.length}\r\n")
    write("Content-Type: application/warc-fields\r\n\r\n")
    write(info)
    write("\r\n\r\n")

    pages.foreach { p =>
      val httpHead = "HTTP/1.1 200 OK\r\n" +
        s"Content-Length: ${p.html.length}\r\n" +
        "Content-Type: application/octet-stream\r\n\r\n"
      val bodyLen = httpHead.length + p.html.length
      write("WARC/1.0\r\n")
      write("WARC-Type: response\r\n")
      write(s"WARC-Target-URI: ${p.url}\r\n")
      write(s"WARC-Date: ${iso(p.warc_ts)}\r\n")
      write("Content-Type: application/http; msgtype=response\r\n")
      write(s"Content-Length: $bodyLen\r\n\r\n")
      write(httpHead)
      out.write(p.html)
      write("\r\n\r\n")
    }
    val plain = out.toByteArray
    if (!gzip) plain
    else {
      val gz = new ByteArrayOutputStream(plain.length / 2)
      val g = new java.util.zip.GZIPOutputStream(gz, 1 << 16)
      g.write(plain)
      g.close()
      gz.toByteArray
    }
  }
}
