package graft.extract

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

import graft.core.Span

/** Positional PDF layout parser (PDFBox-style, per north_star): walks content
  * streams, executes the text-positioning/showing operators (Tf, Td, TD, Tm,
  * T-star, Tj, TJ, quote), reconstructs reading order by line position. Hand-written —
  * no PDFBox offline (SURVEY.md §0).
  *
  * Reference analogs:
  *  - encryption probe -> password-protected: docsbox/docs/utils.py:241-256
  *  - PDF/A detection -> non-convertable: utils.py:223-238, views.py:130-137
  *  - out-of-range coordinate failure (exact message the reference's test
  *    corpus expects for test39.pdf): tasks.py:122-126,
  *    tests/test_dependencies.py:248-258
  *  - embedded-file (attachment) walk: utils.py:440-461
  *
  * Never throws to callers: all failures are error-as-value PdfResult.
  */
object PdfParser {

  sealed trait PdfResult
  final case class PdfText(
      text: String,
      spans: Vector[Span],
      attachments: Vector[String],
      pageCount: Int) extends PdfResult
  final case class PdfEncrypted() extends PdfResult
  final case class PdfAlreadyPdfa() extends PdfResult
  final case class PdfFailure(message: String) extends PdfResult

  /** PDF 32000-1:2008 implementation limit on coordinate magnitude. */
  val CoordLimit = 14400.0

  private final class OutOfRange extends RuntimeException("out-of-range coordinates")

  def parse(payload: Array[Byte]): PdfResult = {
    try {
      val s = new String(payload, StandardCharsets.ISO_8859_1)
      if (!s.startsWith("%PDF-")) return PdfFailure("not a PDF payload")
      if (!s.contains("%%EOF")) return PdfFailure("truncated payload")
      if (s.contains("/Encrypt")) return PdfEncrypted()
      if (s.contains("pdfaid:part")) return PdfAlreadyPdfa()

      val streams = contentStreams(s)
      val pageTexts = new ArrayBuffer[Vector[(Double, Double, String)]]()
      var sawText = false
      for (data <- streams) {
        if (data.contains("BT")) {
          sawText = true
          pageTexts += runTextOps(data)
        }
      }
      if (!sawText) return PdfFailure("no content streams")

      val sb = new java.lang.StringBuilder(1024)
      val spans = new ArrayBuffer[Span](16)
      var byteOff = 0L
      var emitted = 0
      for (chunks <- pageTexts) {
        // reading order: top-to-bottom (y desc), left-to-right (x asc);
        // stable sort keeps emission order for exact ties.
        val lines = chunks
          .groupBy(_._2).toSeq
          .sortBy { case (y, _) => -y }
          .map { case (_, cs) => cs.sortBy(_._1).map(_._3).mkString(" ") }
          .filter(_.nonEmpty)
        for (line <- lines) {
          if (emitted > 0) { sb.append('\n'); byteOff += 1 }
          val blen = Boilerplate.utf8Len(line)
          spans += Span("line", byteOff, byteOff + blen)
          sb.append(line)
          byteOff += blen
          emitted += 1
        }
      }
      PdfText(sb.toString, spans.toVector, attachmentNames(s), pageTexts.length)
    } catch {
      case _: OutOfRange => PdfFailure("out-of-range coordinates")
      case e: Throwable =>
        PdfFailure(s"pdf parse error: ${e.getClass.getSimpleName}")
    }
  }

  /** All decoded stream bodies that are plausibly content streams. */
  private def contentStreams(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = s.indexOf("stream")
    while (i >= 0) {
      // require the keyword to be followed by an EOL (PDF spec)
      var dataStart = i + 6
      if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < s.length && s.charAt(dataStart) == '\n') {
        dataStart += 1
        val end = s.indexOf("endstream", dataStart)
        val dataEnd = if (end < 0) s.length else end
        // the governing dict: from the enclosing "N 0 obj" to "stream"
        val objStart = s.lastIndexOf(" obj", i)
        val dict = if (objStart < 0) "" else s.substring(objStart, i)
        val raw = s.substring(dataStart, dataEnd)
        val isXml = dict.contains("/Subtype /XML") || dict.contains("/Metadata")
        if (!isXml) {
          val body =
            if (dict.contains("/FlateDecode")) inflate(raw)
            else raw
          if (body != null) out += body
        }
        i = s.indexOf("stream", if (end < 0) s.length else end + 9)
      } else {
        i = s.indexOf("stream", i + 6)
      }
    }
    out.result()
  }

  private def inflate(raw: String): String = {
    try {
      val in = raw.getBytes(StandardCharsets.ISO_8859_1)
      val inf = new java.util.zip.Inflater()
      inf.setInput(in)
      val out = new java.io.ByteArrayOutputStream(in.length * 4)
      val buf = new Array[Byte](8192)
      var guard = 0
      while (!inf.finished() && guard < (1 << 14)) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) guard = 1 << 14 // truncated
        else out.write(buf, 0, n)
        guard += 1
      }
      inf.end()
      new String(out.toByteArray, StandardCharsets.ISO_8859_1)
    } catch { case _: Throwable => null }
  }

  /** Execute text operators of one content stream; returns (x, y, text). */
  private def runTextOps(data: String): Vector[(Double, Double, String)] = {
    val chunks = Vector.newBuilder[(Double, Double, String)]
    val len = data.length
    var i = 0
    // operand stack of recent numbers; strings handled separately
    val nums = new ArrayBuffer[Double](8)
    var lastString: String = null
    var tjAccum: java.lang.StringBuilder = null // inside [...] for TJ
    var lx = 0.0
    var ly = 0.0
    var leading = 0.0

    def checkRange(): Unit =
      if (math.abs(lx) > CoordLimit || math.abs(ly) > CoordLimit)
        throw new OutOfRange

    def emit(str: String): Unit =
      if (str != null && str.nonEmpty) chunks += ((lx, ly, str))

    var steps = 0
    val maxSteps = 4 << 20 // bounded work per stream
    while (i < len && steps < maxSteps) {
      steps += 1
      val c = data.charAt(i)
      if (c == '(') {
        // literal string with \-escapes and nested parens
        val sb = new java.lang.StringBuilder(32)
        var depth = 1
        i += 1
        while (i < len && depth > 0) {
          val ch = data.charAt(i)
          if (ch == '\\' && i + 1 < len) {
            val e = data.charAt(i + 1)
            e match {
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case '(' => sb.append('(')
              case ')' => sb.append(')')
              case '\\' => sb.append('\\')
              case d if d >= '0' && d <= '7' =>
                var oct = 0
                var k = 0
                while (k < 3 && i + 1 + k < len && {
                  val dd = data.charAt(i + 1 + k); dd >= '0' && dd <= '7'
                }) { oct = oct * 8 + (data.charAt(i + 1 + k) - '0'); k += 1 }
                sb.append(oct.toChar)
                i += k - 1
              case other => sb.append(other)
            }
            i += 2
          } else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            if (depth > 0) sb.append(ch)
            i += 1
          }
        }
        val str = sb.toString
        if (tjAccum != null) tjAccum.append(str) else lastString = str
      } else if (c == '<' && i + 1 < len && data.charAt(i + 1) != '<') {
        // hex string
        val end = data.indexOf('>', i + 1)
        val hex = if (end < 0) data.substring(i + 1) else data.substring(i + 1, end)
        val sb = new java.lang.StringBuilder(hex.length / 2)
        var k = 0
        while (k + 1 < hex.length) {
          val hi = Character.digit(hex.charAt(k), 16)
          val lo = Character.digit(hex.charAt(k + 1), 16)
          if (hi >= 0 && lo >= 0) sb.append(((hi << 4) | lo).toChar)
          k += 2
        }
        val str = sb.toString
        if (tjAccum != null) tjAccum.append(str) else lastString = str
        i = if (end < 0) len else end + 1
      } else if (c == '[') {
        tjAccum = new java.lang.StringBuilder(64)
        i += 1
      } else if (c == ']') {
        lastString = if (tjAccum != null) tjAccum.toString else null
        tjAccum = null
        i += 1
      } else if (c == '<') { // '<<' dict inside stream (inline image params)
        i += 2
      } else if (c == '/') {
        i += 1
        while (i < len && !isDelim(data.charAt(i))) i += 1
      } else if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        val st = i
        i += 1
        while (i < len && { val x = data.charAt(i); x == '.' || (x >= '0' && x <= '9') }) i += 1
        try nums += java.lang.Double.parseDouble(data.substring(st, i))
        catch { case _: NumberFormatException => }
      } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '\'' || c == '"' || c == '*') {
        val st = i
        i += 1
        while (i < len && { val x = data.charAt(i)
          (x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z') || x == '*' || (x >= '0' && x <= '9')
        }) i += 1
        val op = data.substring(st, i)
        op match {
          case "BT" => lx = 0.0; ly = 0.0; nums.clear()
          case "ET" => nums.clear()
          case "Td" =>
            if (nums.length >= 2) { lx += nums(nums.length - 2); ly += nums(nums.length - 1) }
            nums.clear(); checkRange()
          case "TD" =>
            if (nums.length >= 2) {
              leading = -nums(nums.length - 1)
              lx += nums(nums.length - 2); ly += nums(nums.length - 1)
            }
            nums.clear(); checkRange()
          case "Tm" =>
            if (nums.length >= 6) { lx = nums(nums.length - 2); ly = nums(nums.length - 1) }
            nums.clear(); checkRange()
          case "TL" =>
            if (nums.nonEmpty) leading = nums(nums.length - 1)
            nums.clear()
          case "T" => // T* tokenizes as "T*" actually; kept for safety
            nums.clear()
          case "T*" =>
            ly -= leading; nums.clear(); checkRange()
          case "Tj" =>
            emit(lastString); lastString = null; nums.clear()
          case "TJ" =>
            emit(lastString); lastString = null; nums.clear()
          case "'" =>
            ly -= leading; checkRange(); emit(lastString); lastString = null; nums.clear()
          case "\"" =>
            ly -= leading; checkRange(); emit(lastString); lastString = null; nums.clear()
          case _ => nums.clear()
        }
      } else {
        i += 1
      }
    }
    chunks.result()
  }

  private def isDelim(c: Char): Boolean =
    Character.isWhitespace(c) || c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** Embedded-file names from /Filespec objects (utils.py:440-461 analog). */
  private def attachmentNames(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = s.indexOf("/Filespec")
    while (i >= 0) {
      val f = s.indexOf("/F (", i)
      if (f >= 0 && f < i + 200) {
        var j = f + 4
        val sb = new java.lang.StringBuilder(16)
        while (j < s.length && s.charAt(j) != ')') {
          if (s.charAt(j) == '\\' && j + 1 < s.length) { sb.append(s.charAt(j + 1)); j += 2 }
          else { sb.append(s.charAt(j)); j += 1 }
        }
        out += sb.toString
      }
      i = s.indexOf("/Filespec", i + 9)
    }
    out.result()
  }
}
