package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Deterministic minimal PDF writer. Closes the PDF parser's input domain
  * (SURVEY.md §7 M0): the synthetic corpus embeds PDFs produced here, so
  * graft.extract.PdfParser's coverage of the corpus is total by construction
  * — the strategy the reference applies with its fixture corpus
  * (docsbox/docs/tests/inputs/, test7.pdf etc.).
  *
  * Emits uncompressed PDF 1.4: catalog, page tree, one content stream per
  * page with BT/Tf/Td/Tj text operators, a Type1 font, correct xref.
  * Variants mirror the reference's fixture categories:
  *  - `pdfaMarker`: XMP metadata with pdfaid:part (PDF/A analog ->
  *    non-convertable, views.py:130-137, config.yml:216-218)
  *  - `encrypted`: /Encrypt in trailer (utils.py:241-256 analog)
  *  - `badCoords`: out-of-range Td operands (test39.pdf analog,
  *    test_dependencies.py:248-258)
  *  - `attachments`: /EmbeddedFiles name tree + filespecs
  *    (utils.py:440-461 analog)
  */
object PdfGen {

  case class PdfSpec(
      pages: Seq[Seq[String]], // text lines per page
      encrypted: Boolean = false,
      /** Encrypted with an EMPTY user password: /U carries the spec's
        * 32-byte padding string -> "password-protected-partial"
        * (utils.py:247-255 decrypt("") analog). */
      encryptedPartial: Boolean = false,
      pdfaMarker: Boolean = false,
      badCoords: Boolean = false,
      attachments: Seq[(String, Array[Byte])] = Nil)

  /** PDF 32000-1 7.6.3.3 padding string as hex (= empty user password /U). */
  private val PadHex: String = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(b => f"$b%02X").mkString

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' || c == '(' || c == ')') { sb.append('\\'); sb.append(c) }
      else if (c < 0x20 || c > 0x7e) sb.append(' ') // content strings kept ASCII
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  def build(spec: PdfSpec): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()

    def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    def write(s: String): Unit = out.write(bytes(s))

    // object ids:
    // 1 catalog, 2 pages, font 3, per page i: page(4+2i), content(5+2i)
    // then optional: metadata, encrypt, per attachment: filespec + stream
    val nPages = spec.pages.length
    val fontId = 3
    def pageId(i: Int) = 4 + 2 * i
    def contentId(i: Int) = 5 + 2 * i
    var nextId = 4 + 2 * nPages
    val metaId = if (spec.pdfaMarker) { val v = nextId; nextId += 1; v } else -1
    val encId =
      if (spec.encrypted || spec.encryptedPartial) { val v = nextId; nextId += 1; v }
      else -1
    val attIds = spec.attachments.map { _ =>
      val fs = nextId; val st = nextId + 1; nextId += 2; (fs, st)
    }
    val nObjs = nextId - 1

    write("%PDF-1.4\n%âãÏÓ\n")

    def obj(id: Int)(body: => Unit): Unit = {
      while (offsets.length < id) offsets += 0L
      offsets(id - 1) = out.size().toLong
      write(s"$id 0 obj\n")
      body
      write("endobj\n")
    }

    // 1: catalog
    obj(1) {
      val names =
        if (attIds.nonEmpty) {
          val entries = spec.attachments.zip(attIds)
            .map { case ((name, _), (fs, _)) => s"(${esc(name)}) $fs 0 R" }
            .mkString(" ")
          s" /Names << /EmbeddedFiles << /Names [ $entries ] >> >>"
        } else ""
      val meta = if (metaId > 0) s" /Metadata $metaId 0 R" else ""
      write(s"<< /Type /Catalog /Pages 2 0 R$names$meta >>\n")
    }
    // 2: pages
    obj(2) {
      val kids = (0 until nPages).map(i => s"${pageId(i)} 0 R").mkString(" ")
      write(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\n")
    }
    // 3: font
    obj(fontId) {
      write("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n")
    }
    // pages + content streams
    for (i <- 0 until nPages) {
      obj(pageId(i)) {
        write(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontId 0 R >> >> /Contents ${contentId(i)} 0 R >>\n")
      }
      val lines = spec.pages(i)
      val sb = new java.lang.StringBuilder
      sb.append("BT\n/F1 12 Tf\n")
      val x0 = if (spec.badCoords && i == 0) 999999 else 72
      sb.append(s"$x0 720 Td\n")
      var first = true
      for (line <- lines) {
        if (!first) sb.append("0 -14 Td\n")
        sb.append(s"(${esc(line)}) Tj\n")
        first = false
      }
      sb.append("ET\n")
      val content = sb.toString
      obj(contentId(i)) {
        write(s"<< /Length ${content.length} >>\nstream\n")
        write(content)
        write("endstream\n")
      }
    }
    // metadata (PDF/A marker)
    if (metaId > 0) {
      val xmp =
        """<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
          |<x:xmpmeta xmlns:x="adobe:ns:meta/">
          | <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
          |  <rdf:Description rdf:about="" xmlns:pdfaid="http://www.aiim.org/pdfa/ns/id/">
          |   <pdfaid:part>1</pdfaid:part>
          |   <pdfaid:conformance>B</pdfaid:conformance>
          |  </rdf:Description>
          | </rdf:RDF>
          |</x:xmpmeta>
          |<?xpacket end="w"?>""".stripMargin
      obj(metaId) {
        write(s"<< /Type /Metadata /Subtype /XML /Length ${xmp.length} >>\nstream\n")
        write(xmp)
        write("\nendstream\n")
      }
    }
    // encryption dict (structure only; content not actually encrypted —
    // the parser short-circuits on /Encrypt like pdf_protection_status)
    if (encId > 0) {
      val u = if (spec.encryptedPartial) PadHex
        else "00" * 32
      obj(encId) {
        write("<< /Filter /Standard /V 2 /R 3 /Length 128 /P -3904 " +
          "/O <0000000000000000000000000000000000000000000000000000000000000000> " +
          s"/U <$u> >>\n")
      }
    }
    // attachments — filespec props mirror the reference's preserved keys
    // (utils.py:488-495: /Desc, /CreationDate)
    spec.attachments.zip(attIds).foreach { case ((name, data), (fsId, stId)) =>
      obj(fsId) {
        write(s"<< /Type /Filespec /F (${esc(name)}) /UF (${esc(name)}) " +
          s"/Desc (attachment ${esc(name)}) /CreationDate (D:20250101000000Z) " +
          s"/EF << /F $stId 0 R >> >>\n")
      }
      obj(stId) {
        write(s"<< /Type /EmbeddedFile /Length ${data.length} >>\nstream\n")
        out.write(data)
        write("\nendstream\n")
      }
    }

    // xref
    val xrefOff = out.size().toLong
    write(s"xref\n0 ${nObjs + 1}\n")
    write("0000000000 65535 f \n")
    for (i <- 0 until nObjs) {
      write(f"${offsets(i)}%010d 00000 n \n")
    }
    val enc = if (encId > 0) s" /Encrypt $encId 0 R" else ""
    write(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R$enc >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
