package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

/** Deterministic minimal writers for zip-contained document formats (docx,
  * pptx, xlsx, odt) — closes OoxmlParser's input domain the way PdfGen does
  * for PdfParser. All entries are STORED (no deflate) with a fixed DOS
  * timestamp so the bytes are a pure function of the content — byte-stable
  * across JVMs, timezones, and zlib versions (corpus invariant #3). */
object ZipGen {

  private val FixedTime = java.time.LocalDateTime.of(2025, 1, 1, 0, 0, 0)

  /** A zip of STORED entries in the given order. */
  def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4096)
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.STORED)
      e.setSize(data.length.toLong)
      e.setCompressedSize(data.length.toLong)
      val crc = new CRC32
      crc.update(data)
      e.setCrc(crc.getValue)
      e.setTimeLocal(FixedTime) // writes DOS time directly; TZ-independent
      zos.putNextEntry(e)
      zos.write(data)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def escXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="xml" ContentType="application/xml"/>
      |</Types>""".stripMargin

  /** Minimal docx: [Content_Types].xml + word/document.xml with one w:p
    * per paragraph, each a single w:t run. */
  def docx(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p =>
      s"<w:p><w:r><w:t>${escXml(p)}</w:t></w:r></w:p>").mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body>$body</w:body></w:document>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" -> utf8(ContentTypes),
      "word/document.xml" -> utf8(doc)))
  }

  /** Minimal pptx: one slideN.xml per slide, a:p paragraphs of a:t runs. */
  def pptx(slides: Seq[Seq[String]]): Array[Byte] = {
    val members = slides.zipWithIndex.map { case (paras, i) =>
      val body = paras.map(p =>
        s"<a:p><a:r><a:t>${escXml(p)}</a:t></a:r></a:p>").mkString
      val xml =
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
           | xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
           |<p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""".stripMargin
      s"ppt/slides/slide${i + 1}.xml" -> utf8(xml)
    }
    zip(("[Content_Types].xml" -> utf8(ContentTypes)) +: members)
  }

  /** Minimal xlsx: workbook + sharedStrings with one si/t per string. */
  def xlsx(strings: Seq[String]): Array[Byte] = {
    val sst = strings.map(t => s"<si><t>${escXml(t)}</t></si>").mkString
    val shared =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.length}" uniqueCount="${strings.length}">$sst</sst>""".stripMargin
    val wb =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="s1" sheetId="1"/></sheets></workbook>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" -> utf8(ContentTypes),
      "xl/workbook.xml" -> utf8(wb),
      "xl/sharedStrings.xml" -> utf8(shared)))
  }

  /** Minimal odt: uncompressed "mimetype" FIRST member (the ODF spec rule
    * the sniffer relies on) + content.xml with text:h + text:p elements. */
  def odt(heading: String, paragraphs: Seq[String]): Array[Byte] = {
    val body = s"<text:h text:outline-level=\"1\">${escXml(heading)}</text:h>" +
      paragraphs.map(p => s"<text:p>${escXml(p)}</text:p>").mkString
    odfPackage("application/vnd.oasis.opendocument.text",
      s"<office:text>$body</office:text>")
  }

  /** Shared ODF package shape: mimetype member + content.xml wrapping
    * `bodyInner` in office:body. */
  private def odfPackage(mime: String, bodyInner: String): Array[Byte] = {
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
         | xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
         | xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
         | xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0">
         |<office:body>$bodyInner</office:body></office:document-content>""".stripMargin
    zip(Seq(
      "mimetype" -> mime.getBytes(StandardCharsets.US_ASCII),
      "content.xml" -> utf8(content)))
  }

  /** Minimal ods: one table, one cell per string, text:p inside the cell
    * (the ODF spreadsheet text nesting; includes the text:page-* style
    * tags whose PREFIX collides with text:p — parser boundary-check food). */
  def ods(cells: Seq[String]): Array[Byte] = {
    val rows = cells.map(c =>
      s"<table:table-row><table:table-cell><text:p>${escXml(c)}</text:p></table:table-cell></table:table-row>").mkString
    odfPackage("application/vnd.oasis.opendocument.spreadsheet",
      s"""<office:spreadsheet><table:table table:name="s1">$rows</table:table></office:spreadsheet>""")
  }

  /** Minimal odp: draw pages with frames of text:p paragraphs. */
  def odp(slides: Seq[Seq[String]]): Array[Byte] = {
    val pages = slides.map { paras =>
      val body = paras.map(p => s"<text:p>${escXml(p)}</text:p>").mkString
      s"""<draw:page><draw:frame><draw:text-box>$body<text:page-number/></draw:text-box></draw:frame></draw:page>"""
    }.mkString
    odfPackage("application/vnd.oasis.opendocument.presentation",
      s"<office:presentation>$pages</office:presentation>")
  }

  /** Minimal odg: one drawing page of text frames. */
  def odg(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p =>
      s"<draw:frame><draw:text-box><text:p>${escXml(p)}</text:p></draw:text-box></draw:frame>").mkString
    odfPackage("application/vnd.oasis.opendocument.graphics",
      s"<office:drawing><draw:page>$body</draw:page></office:drawing>")
  }

  /** StarOffice/OpenOffice-1.x sx* package (reference config.yml:75-89):
    * same mimetype-member + content.xml layout, text:p/text:h vocabulary.
    * `app` is writer | calc | impress | draw. */
  def sx(app: String, paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p => s"<text:p>${escXml(p)}</text:p>").mkString
    odfPackage(s"application/vnd.sun.xml.$app",
      s"<office:text>$body</office:text>")
  }

  /** iWork'13+ bundle shape: protobuf-snappy .iwa members (opaque junk
    * here — classification is by member NAME layout; reference registry
    * config.yml:90-110). `app` is pages | keynote | numbers. */
  def iwork(app: String, junk: Array[Byte]): Array[Byte] = {
    val members = app match {
      case "keynote" => Seq("Index/Document.iwa" -> junk, "Index/Slide-1.iwa" -> junk)
      case "numbers" => Seq("Index/Document.iwa" -> junk, "Index/Tables/DataList.iwa" -> junk)
      case _ => Seq("Index/Document.iwa" -> junk)
    }
    zip(members :+ ("Metadata/Properties.plist" -> junk))
  }

  /** Minimal epub: mimetype member (application/epub+zip, OCF spec) +
    * container + one xhtml chapter. */
  def epub(paragraphs: Seq[String]): Array[Byte] = {
    val xhtml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<html xmlns="http://www.w3.org/1999/xhtml"><body>
         |${paragraphs.map(p => s"<p>${escXml(p)}</p>").mkString("\n")}
         |</body></html>""".stripMargin
    zip(Seq(
      "mimetype" -> "application/epub+zip".getBytes(StandardCharsets.US_ASCII),
      "META-INF/container.xml" -> utf8("""<?xml version="1.0"?><container/>"""),
      "OEBPS/chapter1.xhtml" -> utf8(xhtml)))
  }
}
