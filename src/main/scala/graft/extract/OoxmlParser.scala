package graft.extract

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import graft.core.Span

/** Text extraction from zip-contained document formats: OOXML (docx, pptx,
  * xlsx) and ODF (odt) — the formats the reference's msooxml signature table
  * detects and LibreOffice converts (docsbox/config/msooxml.txt:1-30,
  * config/config.yml:34-153). Hand-written streaming scans over the inner
  * XML, no DOM — same philosophy as HtmlParser.
  *
  * Scope (documented, deterministic): paragraph text runs only — w:t runs
  * per w:p (docx), a:t runs per a:p per slide (pptx), shared-string items
  * (xlsx), text:p/text:h elements (odt). Field codes, footnotes, headers,
  * embedded objects are out of scope.
  *
  * Never throws: all failures are error-as-value results. Unzip work is
  * bounded (entry count / per-entry bytes / total bytes caps — zip-bomb
  * guard, the job-timeout analog of config/config.yml:7).
  */
object OoxmlParser {

  sealed trait Result
  final case class OoxmlText(text: String, spans: Vector[Span]) extends Result
  final case class OoxmlFailure(message: String) extends Result

  private val MaxEntries = 512
  private val MaxEntryBytes = 8 << 20
  private val MaxTotalBytes = 32 << 20

  /** Read members whose name satisfies `wanted`, bounded. */
  private def members(payload: Array[Byte], wanted: String => Boolean): Vector[(String, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    val zin = new ZipInputStream(new ByteArrayInputStream(payload))
    var entries = 0
    var total = 0L
    try {
      var e = zin.getNextEntry
      while (e != null && entries < MaxEntries && total < MaxTotalBytes) {
        entries += 1
        if (!e.isDirectory && wanted(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream(4096)
          val tmp = new Array[Byte](8192)
          var n = zin.read(tmp)
          while (n > 0 && buf.size() < MaxEntryBytes && total < MaxTotalBytes) {
            buf.write(tmp, 0, n)
            total += n
            n = zin.read(tmp)
          }
          out += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Decode the five XML entities plus numeric character references. */
  private[graft] def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          s.substring(i + 1, semi) match {
            case "amp" => sb.append('&'); i = semi + 1
            case "lt" => sb.append('<'); i = semi + 1
            case "gt" => sb.append('>'); i = semi + 1
            case "quot" => sb.append('"'); i = semi + 1
            case "apos" => sb.append('\''); i = semi + 1
            case ref if ref.startsWith("#") =>
              val cp = try {
                if (ref.startsWith("#x") || ref.startsWith("#X"))
                  Integer.parseInt(ref.substring(2), 16)
                else Integer.parseInt(ref.substring(1))
              } catch { case _: NumberFormatException => -1 }
              if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp)) {
                sb.appendCodePoint(cp); i = semi + 1
              } else { sb.append(c); i += 1 }
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Bodies of `<tag ...>...</tag>` elements, in document order.
    * Self-closing `<tag/>` elements are skipped. */
  private def elements(xml: String, tag: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val close = "</" + tag + ">"
    var i = xml.indexOf("<" + tag)
    while (i >= 0) {
      val after = i + 1 + tag.length
      // exact tag match: next char must close the open tag or start attrs
      val ch = if (after < xml.length) xml.charAt(after) else ' '
      if (ch == '>' || ch == ' ' || ch == '/' || ch == '\t' || ch == '\n') {
        val gt = xml.indexOf('>', after)
        if (gt < 0) return out.result()
        if (xml.charAt(gt - 1) != '/') { // not self-closing
          val end = xml.indexOf(close, gt + 1)
          if (end < 0) return out.result()
          out += xml.substring(gt + 1, end)
          i = xml.indexOf("<" + tag, end + close.length)
        } else i = xml.indexOf("<" + tag, gt + 1)
      } else i = xml.indexOf("<" + tag, after)
    }
    out.result()
  }

  /** All tags removed, entities decoded. */
  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') inTag = true
      else if (c == '>') inTag = false
      else if (!inTag) sb.append(c)
      i += 1
    }
    decodeXml(sb.toString)
  }

  /** Concatenated decoded text runs (`<run>...</run>` bodies) of a segment. */
  private def runText(segment: String, run: String): String = {
    val runs = elements(segment, run)
    if (runs.isEmpty) "" else runs.map(decodeXml).mkString
  }

  private[extract] def paragraphsToResult(paras: Seq[String], kind: String): Result = {
    val nonEmpty = paras.filter(_.nonEmpty)
    if (nonEmpty.isEmpty) return OoxmlFailure("no text content")
    val sb = new java.lang.StringBuilder(1024)
    val spans = new ArrayBuffer[Span](nonEmpty.length)
    var off = 0L
    var first = true
    nonEmpty.foreach { p =>
      if (!first) { sb.append('\n'); off += 1 }
      val blen = Boilerplate.utf8Len(p)
      spans += Span(kind, off, off + blen)
      sb.append(p)
      off += blen
      first = false
    }
    OoxmlText(sb.toString, spans.toVector)
  }

  private def xmlOf(payload: Array[Byte], member: String): Option[String] =
    try {
      members(payload, _ == member).headOption
        .map(m => new String(m._2, StandardCharsets.UTF_8))
    } catch { case NonFatal(_) | _: StackOverflowError => None }

  /** docx: word/document.xml, one span per w:p, text = concatenated w:t runs. */
  def extractDocx(payload: Array[Byte]): Result =
    try {
      xmlOf(payload, "word/document.xml") match {
        case None => OoxmlFailure("no word/document.xml member")
        case Some(xml) =>
          paragraphsToResult(elements(xml, "w:p").map(runText(_, "w:t")), "p")
      }
    } catch { case NonFatal(_) | _: StackOverflowError => OoxmlFailure("docx parse error") }

  /** pptx: ppt/slides/slideN.xml in slide-number order; one span per a:p. */
  def extractPptx(payload: Array[Byte]): Result =
    try {
      val slides = members(payload, n =>
          n.startsWith("ppt/slides/slide") && n.endsWith(".xml") &&
            n.indexOf('/', "ppt/slides/".length) < 0)
        .sortBy { case (n, _) =>
          val num = n.stripPrefix("ppt/slides/slide").stripSuffix(".xml")
          (num.length, num) // numeric order without parse risk: 2 < 10
        }
      if (slides.isEmpty) OoxmlFailure("no slide members")
      else {
        val paras = slides.flatMap { case (_, data) =>
          elements(new String(data, StandardCharsets.UTF_8), "a:p")
            .map(runText(_, "a:t"))
        }
        paragraphsToResult(paras, "p")
      }
    } catch { case NonFatal(_) | _: StackOverflowError => OoxmlFailure("pptx parse error") }

  /** xlsx: xl/sharedStrings.xml items; one span per shared string. */
  def extractXlsx(payload: Array[Byte]): Result =
    try {
      xmlOf(payload, "xl/sharedStrings.xml") match {
        case None => OoxmlFailure("no xl/sharedStrings.xml member")
        case Some(xml) =>
          paragraphsToResult(elements(xml, "si").map(runText(_, "t")), "cell")
      }
    } catch { case NonFatal(_) | _: StackOverflowError => OoxmlFailure("xlsx parse error") }

  /** ODF (odt/ods/odp/odg — content.xml is format-common, reference
    * config.yml:134-153) and StarOffice sx* (same element vocabulary):
    * text:p / text:h elements (tags stripped, entities decoded) in document
    * order. Spreadsheet cells and presentation frames nest their text in
    * text:p, so the single scan covers the whole family. */
  def extractOdt(payload: Array[Byte]): Result =
    try {
      xmlOf(payload, "content.xml") match {
        case None => OoxmlFailure("no content.xml member")
        case Some(xml) =>
          // next TRUE opener of `tag` at/after `from`: the prefix must end
          // at a tag boundary ('>', whitespace, '/'), else <text:p matches
          // <text:page-number> and the scan hunts a mismatched close tag
          def nextOpen(from: Int, tag: String): Int = {
            var j = xml.indexOf("<" + tag, from)
            while (j >= 0) {
              val after = j + 1 + tag.length
              val ch = if (after < xml.length) xml.charAt(after) else ' '
              if (ch == '>' || ch == ' ' || ch == '/' || ch == '\t' ||
                  ch == '\n' || ch == '\r') return j
              j = xml.indexOf("<" + tag, j + 1)
            }
            -1
          }
          // merge p and h in document order: scan once for either opener
          val paras = Vector.newBuilder[String]
          var i = 0
          while (i >= 0 && i < xml.length) {
            val p = nextOpen(i, "text:p")
            val h = nextOpen(i, "text:h")
            val at = if (p < 0) h else if (h < 0) p else math.min(p, h)
            if (at < 0) i = -1
            else {
              val tag = if (at == h && h >= 0) "text:h" else "text:p"
              val gt = xml.indexOf('>', at)
              if (gt < 0) i = -1
              else if (xml.charAt(gt - 1) == '/') i = gt + 1
              else {
                val end = xml.indexOf("</" + tag + ">", gt)
                if (end < 0) i = -1
                else {
                  paras += stripTags(xml.substring(gt + 1, end))
                  i = end + tag.length + 3
                }
              }
            }
          }
          paragraphsToResult(paras.result(), "p")
      }
    } catch { case NonFatal(_) | _: StackOverflowError => OoxmlFailure("odt parse error") }
}
