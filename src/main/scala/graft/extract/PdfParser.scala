package graft.extract

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import graft.core.{Attachment, Span}

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
      attachments: Vector[Attachment],
      pageCount: Int) extends PdfResult
  /** `partial` = the empty user password decrypts (reference's
    * "password-protected-partial", utils.py:241-256). */
  final case class PdfEncrypted(partial: Boolean) extends PdfResult
  /** `version` = pdfaid part + conformance, e.g. "1B" (utils.py:118-125). */
  final case class PdfAlreadyPdfa(version: String) extends PdfResult
  final case class PdfFailure(message: String) extends PdfResult

  /** PDF 32000-1:2008 implementation limit on coordinate magnitude. */
  val CoordLimit = 14400.0

  private final class OutOfRange extends RuntimeException("out-of-range coordinates")

  def parse(payload: Array[Byte]): PdfResult = {
    try {
      // ISO-8859-1 chars map 1:1 to bytes, and JDK compact strings store
      // Latin-1 as byte[] — this "String" costs ~1x payload, not 2x
      val s = new String(payload, StandardCharsets.ISO_8859_1)
      if (!s.startsWith("%PDF-")) return PdfFailure("not a PDF payload")
      if (!s.contains("%%EOF")) return PdfFailure("truncated payload")
      // probes are RESTRICTED to the governing structures — a content
      // stream whose TEXT mentions "/Encrypt" or "pdfaid:part" must not
      // flip the document's state (round-1 false-positive risk), and
      // keywords inside ATTACHED file bytes must not read as outer objects
      val ext = new StreamExtents(s)
      encryptionState(s, ext) match {
        case EncNone =>
        case EncPartial => return PdfEncrypted(partial = true)
        case EncFull => return PdfEncrypted(partial = false)
      }
      val pdfa = pdfaVersion(s, ext)
      if (pdfa.nonEmpty) return PdfAlreadyPdfa(pdfa)

      val streams = contentStreams(s, ext)
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
      PdfText(sb.toString, spans.toVector, attachments(s, ext), pageTexts.length)
    } catch {
      case _: OutOfRange => PdfFailure("out-of-range coordinates")
      // never-throw within reason: NonFatal + StackOverflowError (deep
      // nesting protection). OOM/interrupts PROPAGATE — an executor OOM
      // must not become a quiet 'failed' row, and task kills must land.
      case _: StackOverflowError => PdfFailure("pdf parse error: StackOverflowError")
      case NonFatal(e) =>
        PdfFailure(s"pdf parse error: ${e.getClass.getSimpleName}")
    }
  }

  // ------------------------------------------------- structural probes

  private sealed trait EncState
  private case object EncNone extends EncState
  private case object EncFull extends EncState
  private case object EncPartial extends EncState

  /** PDF 32000-1 7.6.3.3 padding string: for RC4 /R2, /U equal to this
    * padding means the user password is empty — the deterministic analog of
    * the reference's decrypt("") succeeding (utils.py:247-255). */
  private val PadBytes: Array[Int] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A)

  /** Balanced `<< ... >>` dict starting at or after `from`; empty if none. */
  private def dictAfter(s: String, from: Int, searchLimit: Int = 512): String = {
    val start = s.indexOf("<<", from)
    if (start < 0 || start - from > searchLimit) return ""
    var depth = 0
    var i = start
    while (i + 1 < s.length) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return s.substring(start, i)
      } else i += 1
    }
    ""
  }

  /** The dict of object `num 0 obj` (outside stream data); empty if absent. */
  private def objDict(s: String, num: Int, ext: StreamExtents): String = {
    val key = s"$num 0 obj"
    var i = s.indexOf(key)
    while (i >= 0) {
      // require a non-digit before the number so "12 0 obj" != "2 0 obj";
      // ignore matches inside stream bodies (an attached PDF's own objects)
      if ((i == 0 || !Character.isDigit(s.charAt(i - 1))) && !ext.inside(i))
        return dictAfter(s, i + key.length)
      i = s.indexOf(key, i + 1)
    }
    ""
  }

  /** One walk's worth of stream objects: (dict, dataStart, dataEnd) for
    * every stream, shared by all structural probes (the walk is an index
    * scan of the whole payload — doing it once instead of once per probe
    * matters at 100 TB). Probes must ignore keywords ("trailer",
    * "/Filespec", "N 0 obj") that occur INSIDE stream data (e.g. inside an
    * attached PDF's bytes) — `inside` answers that. */
  private final class StreamExtents(s: String) {
    val all: ArrayBuffer[(String, Int, Int)] = {
      val b = ArrayBuffer.empty[(String, Int, Int)]
      streamWalk(s)((d, a, e) => b += ((d, a, e)))
      b
    }
    // extents are produced in ascending, non-overlapping order (the walk
    // resumes after each stream's end) — binary search instead of a linear
    // scan: `inside` is called inside indexOf loops (objDict, trailer scan,
    // attachments), so an adversarial PDF packed with `stream`/`Filespec`
    // keywords would otherwise cost O(occurrences x streams)
    private val starts: Array[Int] = all.map(_._2).toArray
    private val ends: Array[Int] = all.map(_._3).toArray
    def inside(p: Int): Boolean = {
      var lo = 0
      var hi = starts.length - 1
      var idx = -1
      while (lo <= hi) { // greatest start <= p
        val mid = (lo + hi) >>> 1
        if (starts(mid) <= p) { idx = mid; lo = mid + 1 } else hi = mid - 1
      }
      idx >= 0 && p < ends(idx)
    }
  }

  /** Classify the /Encrypt entry found at `e` inside `dict`: resolve the
    * "N 0 R" reference (or inline dict) and check /U for the
    * empty-user-password padding. */
  private def encFromDict(s: String, dict: String, e: Int, ext: StreamExtents): EncState = {
    var i = e + 8
    // any PDF whitespace may separate key and value ('/Encrypt\n3 0 R')
    while (i < dict.length && Character.isWhitespace(dict.charAt(i))) i += 1
    val st = i
    while (i < dict.length && Character.isDigit(dict.charAt(i))) i += 1
    val encDict =
      if (i > st) objDict(s, dict.substring(st, i).toInt, ext)
      else dictAfter(dict, e) // inline encryption dict
    if (uIsPadding(encDict)) EncPartial else EncFull
  }

  /** Encryption state from the GOVERNING dicts only — classic `trailer`
    * dicts AND cross-reference stream dicts (/Type /XRef, PDF 1.5+, which
    * carry the trailer entries and may leave no `trailer` keyword at all).
    * Content that merely mentions "/Encrypt" never flips the state. */
  private def encryptionState(s: String, ext: StreamExtents): EncState = {
    var t = s.indexOf("trailer")
    while (t >= 0) {
      if (!ext.inside(t)) {
        val dict = dictAfter(s, t + 7)
        val e = dict.indexOf("/Encrypt")
        if (e >= 0) return encFromDict(s, dict, e, ext)
      }
      t = s.indexOf("trailer", t + 7)
    }
    // xref streams: the stream object's dict IS the trailer dict
    ext.all.foreach { case (dict, _, _) =>
      if (dict.contains("/XRef")) {
        val e = dict.indexOf("/Encrypt")
        if (e >= 0) return encFromDict(s, dict, e, ext)
      }
    }
    EncNone
  }

  /** True if the /U hex string's first 32 bytes equal the spec padding. */
  private def uIsPadding(encDict: String): Boolean = {
    val u = encDict.indexOf("/U")
    if (u < 0) return false
    var i = u + 2
    while (i < encDict.length && encDict.charAt(i) == ' ') i += 1
    if (i >= encDict.length || encDict.charAt(i) != '<') return false
    i += 1
    var k = 0
    while (k < 32) {
      if (i + 1 >= encDict.length) return false
      val hi = Character.digit(encDict.charAt(i), 16)
      val lo = Character.digit(encDict.charAt(i + 1), 16)
      if (hi < 0 || lo < 0) return false
      if (((hi << 4) | lo) != PadBytes(k)) return false
      i += 2
      k += 1
    }
    true
  }

  /** PDF/A version ("1B") from XMP METADATA streams only (dict marked
    * /Metadata or /Subtype /XML) — utils.py:223-238 + get_pdfa_version.
    * Embedded-file streams are excluded by the /Length-aware walk: an
    * ATTACHED PDF/A file must not mark the outer document. */
  private def pdfaVersion(s: String, ext: StreamExtents): String = {
    ext.all.foreach { case (dict, dataStart, dataEnd) =>
      if (!dict.contains("/EmbeddedFile") &&
          (dict.contains("/Metadata") || dict.contains("/Subtype /XML"))) {
        val body = s.substring(dataStart, dataEnd)
        val part = xmpValue(body, "pdfaid:part")
        if (part.nonEmpty)
          return part + xmpValue(body, "pdfaid:conformance")
      }
    }
    ""
  }

  /** `<name>value</...>` element or `name="value"` attribute form. */
  private def xmpValue(xmp: String, name: String): String = {
    val el = xmp.indexOf(name + ">")
    if (el >= 0) {
      val st = el + name.length + 1
      val end = xmp.indexOf('<', st)
      if (end > st) return xmp.substring(st, end).trim
    }
    val at = xmp.indexOf(name + "=\"")
    if (at >= 0) {
      val st = at + name.length + 2
      val end = xmp.indexOf('"', st)
      if (end > st) return xmp.substring(st, end).trim
    }
    ""
  }

  /** Walk every stream object: (dict, dataStart, dataEnd) -> callback.
    * The extent honors /Length when present — CRITICAL for embedded-file
    * streams that themselves contain "stream"/"endstream" keywords (an
    * attached PDF): scanning for the first "endstream" would truncate the
    * body and resume the walk INSIDE the attachment, leaking its content
    * streams into the outer document. Falls back to the endstream scan for
    * malformed /Length. */
  private def streamWalk(s: String)(f: (String, Int, Int) => Unit): Unit = {
    var i = s.indexOf("stream")
    while (i >= 0) {
      // require the keyword to be followed by an EOL (PDF spec)
      var dataStart = i + 6
      if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < s.length && s.charAt(dataStart) == '\n') {
        dataStart += 1
        // the governing dict: from the enclosing "N 0 obj" to "stream"
        val objStart = s.lastIndexOf(" obj", i)
        val dict = if (objStart < 0) "" else s.substring(objStart, i)
        val lenEnd = {
          val l = dict.indexOf("/Length")
          if (l < 0) -1
          else {
            var j = l + 7
            while (j < dict.length && dict.charAt(j) == ' ') j += 1
            val st = j
            while (j < dict.length && Character.isDigit(dict.charAt(j))) j += 1
            if (j == st) -1
            else {
              val e = dataStart + dict.substring(st, j).toLong
              // trust /Length only if "endstream" actually follows it
              // (within an EOL or two)
              val idx = if (e >= 0 && e <= s.length - 9) s.indexOf("endstream", e.toInt) else -1
              if (idx >= 0 && idx - e <= 2) e.toInt else -1
            }
          }
        }
        val dataEnd =
          if (lenEnd >= 0) lenEnd
          else { val e = s.indexOf("endstream", dataStart); if (e < 0) s.length else e }
        f(dict, dataStart, dataEnd)
        val resume = s.indexOf("endstream", dataEnd)
        i = s.indexOf("stream", if (resume < 0) s.length else resume + 9)
      } else {
        i = s.indexOf("stream", i + 6)
      }
    }
  }

  /** All decoded stream bodies that are plausibly content streams.
    * XMP/metadata and embedded-file (attachment payload) streams are
    * excluded — their bytes are NOT document content. */
  private def contentStreams(s: String, ext: StreamExtents): Vector[String] = {
    val out = Vector.newBuilder[String]
    ext.all.foreach { case (dict, dataStart, dataEnd) =>
      val skip = dict.contains("/Subtype /XML") || dict.contains("/Metadata") ||
        dict.contains("/EmbeddedFile")
      if (!skip) {
        val raw = s.substring(dataStart, dataEnd)
        val body =
          if (dict.contains("/FlateDecode")) inflate(raw)
          else raw
        if (body != null) out += body
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

  /** Literal string `(...)` starting at `open`; de-escaped. */
  private def pdfLiteral(s: String, open: Int): String = {
    var j = open + 1
    val sb = new java.lang.StringBuilder(16)
    while (j < s.length && s.charAt(j) != ')') {
      if (s.charAt(j) == '\\' && j + 1 < s.length) { sb.append(s.charAt(j + 1)); j += 2 }
      else { sb.append(s.charAt(j)); j += 1 }
    }
    sb.toString
  }

  /** `/Key (literal)` value inside a dict, or null. */
  private def literalProp(dict: String, key: String): String = {
    val k = dict.indexOf(key + " (")
    if (k < 0) null else pdfLiteral(dict, k + key.length + 1)
  }

  /** Embedded files from /Filespec objects — name, PAYLOAD BYTES from the
    * referenced /EF embedded-file stream, and the filespec props that
    * survive a re-attach (utils.py:440-461, 488-495: /Desc, /CreationDate,
    * /ModDate). Stream length is taken from /Length (exact bytes). */
  private def attachments(s: String, ext: StreamExtents): Vector[Attachment] = {
    val out = Vector.newBuilder[Attachment]
    var i = s.indexOf("/Filespec")
    while (i >= 0) {
      if (!ext.inside(i)) { // skip filespecs inside attached-PDF bytes
        val objStart = s.lastIndexOf(" obj", i)
        val dict = dictAfter(s, if (objStart < 0) i else objStart, searchLimit = 2048)
        val name = literalProp(dict, "/F")
        if (name != null) {
          val props = Map.newBuilder[String, String]
          Seq("/Desc", "/CreationDate", "/ModDate").foreach { k =>
            val v = literalProp(dict, k)
            if (v != null) props += k.stripPrefix("/") -> v
          }
          out += Attachment(name, embeddedFileBytes(s, dict, ext), props.result())
        }
      }
      i = s.indexOf("/Filespec", i + 9)
    }
    out.result()
  }

  /** Resolve `/EF << /F N 0 R >>` -> object N's stream body (exact /Length). */
  private def embeddedFileBytes(s: String, filespecDict: String,
      ext: StreamExtents): Array[Byte] = {
    val ef = filespecDict.indexOf("/EF")
    if (ef < 0) return Array.emptyByteArray
    val fRef = filespecDict.indexOf("/F ", ef)
    if (fRef < 0) return Array.emptyByteArray
    var i = fRef + 3
    while (i < filespecDict.length && filespecDict.charAt(i) == ' ') i += 1
    val st = i
    while (i < filespecDict.length && Character.isDigit(filespecDict.charAt(i))) i += 1
    if (i == st) return Array.emptyByteArray
    val num = filespecDict.substring(st, i).toInt
    // locate object num's dict + stream data (outside other streams' bytes)
    val key = s"$num 0 obj"
    var o = s.indexOf(key)
    while (o >= 0 && ((o > 0 && Character.isDigit(s.charAt(o - 1))) || ext.inside(o)))
      o = s.indexOf(key, o + 1)
    if (o < 0) return Array.emptyByteArray
    val dict = dictAfter(s, o + key.length)
    val lenStr = {
      val l = dict.indexOf("/Length")
      if (l < 0) return Array.emptyByteArray
      var j = l + 7
      while (j < dict.length && dict.charAt(j) == ' ') j += 1
      val ls = j
      while (j < dict.length && Character.isDigit(dict.charAt(j))) j += 1
      dict.substring(ls, j)
    }
    if (lenStr.isEmpty) return Array.emptyByteArray
    val len = lenStr.toInt
    var ds = s.indexOf("stream", o)
    if (ds < 0) return Array.emptyByteArray
    ds += 6
    if (ds < s.length && s.charAt(ds) == '\r') ds += 1
    if (ds < s.length && s.charAt(ds) == '\n') ds += 1
    if (ds + len > s.length) return Array.emptyByteArray
    val bytes = new Array[Byte](len)
    var k = 0
    while (k < len) { bytes(k) = s.charAt(ds + k).toByte; k += 1 }
    bytes
  }
}
