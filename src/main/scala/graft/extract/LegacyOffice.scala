package graft.extract

import java.nio.charset.{Charset, StandardCharsets}
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import OoxmlParser.{OoxmlFailure, Result}

/** Text extraction from the legacy OLE2 Office binary formats the
  * reference converts via LibreOffice (docsbox/config/config.yml:40-70):
  * MS-DOC (Word 97-2003), BIFF8 (.xls), MS-PPT (.ppt). Hand-written over
  * [[CfbReader]] — no POI offline (SURVEY.md §0).
  *
  * Scope (deterministic, documented):
  *  - .doc: the main-document text range, located via the FIB and the Clx
  *    piece table in the Table stream — BOTH piece encodings (compressed
  *    cp1252 and UTF-16LE) decode; paragraph marks (\r), line breaks
  *    (0x0B), cell/row marks (0x07) and page breaks (0x0C) become
  *    newlines; field/control bytes are stripped. Headers, footnotes and
  *    fast-saved revision content beyond ccpText are out of scope.
  *  - .xls: the SST shared-string table of the Workbook stream (the BIFF8
  *    analog of xlsx's sharedStrings.xml); rich-run and ext-string
  *    payloads are skipped per spec. Continue-record splits abort the
  *    current string safely rather than mis-decoding.
  *  - .ppt: every TextCharsAtom / TextBytesAtom in the PowerPoint
  *    Document record tree, in document order.
  *
  * Never throws: failures are error-as-value results. Bounded work.
  */
object LegacyOffice {

  private val Cp1252: Charset = Charset.forName("windows-1252")

  // --------------------------------------------------------------- .doc

  def extractDoc(payload: Array[Byte]): Result =
    try {
      val streams = CfbReader.streams(payload)
      val word = streams.getOrElse("WordDocument", null)
      if (word == null) return OoxmlFailure("no WordDocument stream")
      if (word.length < 1024) return OoxmlFailure("WordDocument stream truncated")
      def u16(o: Int): Int = (word(o) & 0xff) | ((word(o + 1) & 0xff) << 8)
      def u32(o: Int): Long =
        (word(o) & 0xffL) | ((word(o + 1) & 0xffL) << 8) |
          ((word(o + 2) & 0xffL) << 16) | ((word(o + 3) & 0xffL) << 24)
      if (u16(0) != 0xa5ec) return OoxmlFailure("not a Word binary file")
      val flags = u16(10)
      if ((flags & 0x0100) != 0) // fEncrypted
        return OoxmlFailure("encrypted Word binary file")
      val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
      val table = streams.getOrElse(tableName, null)
      if (table == null) return OoxmlFailure(s"no $tableName stream")

      // FIB variable-length structure: base(32) | csw, fibRgW | cslw,
      // fibRgLw | cbRgFcLcb, fibRgFcLcbBlob
      val csw = u16(32)
      val cslwOff = 32 + 2 + csw * 2
      if (cslwOff + 2 > word.length) return OoxmlFailure("FIB truncated")
      val cslw = u16(cslwOff)
      val rgLwOff = cslwOff + 2
      if (cslw < 4 || rgLwOff + cslw * 4 > word.length)
        return OoxmlFailure("FIB truncated")
      val ccpText = u32(rgLwOff + 12) // FibRgLw97.ccpText
      val cbOff = rgLwOff + cslw * 4
      if (cbOff + 2 > word.length) return OoxmlFailure("FIB truncated")
      val cb = u16(cbOff)
      if (cb < 34) return OoxmlFailure("FIB too old: no Clx pointer")
      val blobOff = cbOff + 2
      val fcClxOff = blobOff + 33 * 8
      if (fcClxOff + 8 > word.length) return OoxmlFailure("FIB truncated")
      val fcClx = u32(fcClxOff)
      val lcbClx = u32(fcClxOff + 4)
      if (fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > table.length)
        return OoxmlFailure("piece table out of bounds")

      // Clx: Prc entries (clxt=1) then the Pcdt (clxt=2) with the PlcPcd
      var i = fcClx.toInt
      val end = (fcClx + lcbClx).toInt
      def tu16(o: Int): Int = (table(o) & 0xff) | ((table(o + 1) & 0xff) << 8)
      def tu32(o: Int): Long =
        (table(o) & 0xffL) | ((table(o + 1) & 0xffL) << 8) |
          ((table(o + 2) & 0xffL) << 16) | ((table(o + 3) & 0xffL) << 24)
      var guard = 0
      while (i < end && table(i) == 1 && guard < 4096) {
        i += 1 + 2 + tu16(i + 1) // skip Prc
        guard += 1
      }
      if (i >= end || table(i) != 2) return OoxmlFailure("no Pcdt in Clx")
      val lcb = tu32(i + 1)
      val plc = i + 5
      // the whole PlcPcd [plc, plc+lcb) must lie inside the declared Clx
      // range (an off-by-one here let a crafted lcb read at table.length)
      if (lcb < 16 || plc + lcb > end) return OoxmlFailure("Pcdt out of bounds")
      val n = ((lcb - 4) / 12).toInt // pieces
      if (n <= 0 || n > (1 << 16)) return OoxmlFailure("piece count out of range")

      // HARD output cap: ccpText and the piece CP ranges are input-
      // controlled and pieces may alias the same bytes — without the cap a
      // small crafted file could grow the builder without bound (OOM on
      // bad input = invariant-4 violation, not a status row)
      val maxChars = math.min(ccpText, 4L << 20).toInt
      val sb = new java.lang.StringBuilder(math.min(maxChars, 1 << 16))
      var p = 0
      var cpDone = 0L
      while (p < n && cpDone < ccpText && sb.length < maxChars) {
        val cpStart = tu32(plc + p * 4)
        val cpNext = tu32(plc + (p + 1) * 4)
        val pcd = plc + (n + 1) * 4 + p * 8
        val fcRaw = tu32(pcd + 2)
        val compressed = (fcRaw & 0x40000000L) != 0
        val fcBase = fcRaw & 0x3fffffffL
        val fc = if (compressed) fcBase / 2 else fcBase
        val chars = math.min(math.min(cpNext, ccpText) - cpStart,
          (maxChars - sb.length).toLong)
        if (chars > 0 && fc >= 0) {
          val byteLen = chars * (if (compressed) 1 else 2)
          if (fc + byteLen <= word.length) {
            val s =
              if (compressed)
                new String(word, fc.toInt, byteLen.toInt, Cp1252)
              else
                new String(word, fc.toInt, byteLen.toInt, StandardCharsets.UTF_16LE)
            sb.append(s)
            cpDone += chars
          }
        }
        p += 1
      }
      // the claimed main-text range was not fully consumed: SURFACE it
      // (r3 verdict) — whether the output cap stopped appending or the
      // piece table pointed outside the WordDocument stream, a silently
      // shortened 'finished' text would be scored by downstream
      // dedup/quality ops as if it were the whole document
      if (cpDone < ccpText)
        return OoxmlFailure(
          if (sb.length >= maxChars) "text exceeds the extraction cap"
          else "piece table incomplete")
      if (sb.length == 0) return OoxmlFailure("no text content")
      OoxmlParser.paragraphsToResult(normalizeDocText(sb.toString), "p")
    } catch {
      case NonFatal(_) | _: StackOverflowError => OoxmlFailure("doc parse error")
    }

  /** Word control characters -> plain text: \r (paragraph mark), 0x0B
    * (line break), 0x0C (page break), 0x07 (cell/row mark) all split
    * paragraphs; field bytes (0x13/0x14/0x15) and other C0 controls are
    * dropped; \t kept. */
  private def normalizeDocText(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder(128)
    def flush(): Unit = { out += cur.toString; cur.setLength(0) }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r' || c == 0x0b.toChar || c == '\f' || c == 0x07.toChar) flush()
      else if (c == '\t' || c >= ' ') cur.append(c)
      i += 1
    }
    flush()
    out.toSeq
  }

  // --------------------------------------------------------------- .xls

  def extractXls(payload: Array[Byte]): Result =
    try {
      val streams = CfbReader.streams(payload)
      val wb = streams.get("Workbook").orElse(streams.get("Book")).orNull
      if (wb == null) return OoxmlFailure("no Workbook stream")
      def u16(o: Int): Int = (wb(o) & 0xff) | ((wb(o + 1) & 0xff) << 8)
      def u32(o: Int): Long =
        (wb(o) & 0xffL) | ((wb(o + 1) & 0xffL) << 8) |
          ((wb(o + 2) & 0xffL) << 16) | ((wb(o + 3) & 0xffL) << 24)
      val cells = ArrayBuffer.empty[String]
      var i = 0
      var guard = 0
      while (i + 4 <= wb.length && guard < (1 << 20)) {
        guard += 1
        val op = u16(i)
        val len = u16(i + 2)
        val body = i + 4
        if (body + len > wb.length) { i = wb.length } // truncated record
        else {
          if (op == 0x00fc && len >= 8) { // SST
            val cstUnique = u32(body + 4)
            var o = body + 8
            var k = 0L
            while (k < cstUnique && o + 3 <= body + len) {
              val cch = u16(o)
              val fl = wb(o + 2) & 0xff
              var ho = o + 3
              val rich = (fl & 0x08) != 0
              val ext = (fl & 0x04) != 0
              val wide = (fl & 0x01) != 0
              val cRun = if (rich) { val v = u16(ho); ho += 2; v } else 0
              val cbExt = if (ext) { val v = u32(ho); ho += 4; v } else 0L
              val charBytes = cch * (if (wide) 2 else 1)
              // forward-progress guard: cstUnique and cbExt are raw input
              // fields — a zero-advance entry (e.g. cch=0 with a wrapped
              // cbExt) must stop the loop, not spin it cstUnique times
              val next = ho.toLong + charBytes + cRun.toLong * 4 + cbExt
              if (ho + charBytes > body + len || next <= o) {
                k = cstUnique // Continue split / malformed entry: stop
              } else {
                cells += (if (wide)
                  new String(wb, ho, charBytes, StandardCharsets.UTF_16LE)
                else new String(wb, ho, charBytes, Cp1252))
                // a rich/ext TAIL that continues into the next (Continue)
                // record still stops the walk, but AFTER keeping the
                // fully-in-record string text
                if (next > (body + len).toLong) k = cstUnique
                else { o = next.toInt; k += 1 }
              }
            }
          }
          if (op == 0x000a && len == 0) i = wb.length // EOF record
          else i = body + len
        }
      }
      if (cells.isEmpty) OoxmlFailure("no text content")
      else OoxmlParser.paragraphsToResult(cells.toSeq, "cell")
    } catch {
      case NonFatal(_) | _: StackOverflowError => OoxmlFailure("xls parse error")
    }

  // --------------------------------------------------------------- .ppt

  def extractPpt(payload: Array[Byte]): Result =
    try {
      val streams = CfbReader.streams(payload)
      val doc = streams.getOrElse("PowerPoint Document", null)
      if (doc == null) return OoxmlFailure("no PowerPoint Document stream")
      def u16(o: Int): Int = (doc(o) & 0xff) | ((doc(o + 1) & 0xff) << 8)
      def u32(o: Int): Long =
        (doc(o) & 0xffL) | ((doc(o + 1) & 0xffL) << 8) |
          ((doc(o + 2) & 0xffL) << 16) | ((doc(o + 3) & 0xffL) << 24)
      val paras = ArrayBuffer.empty[String]
      var steps = 0
      def walk(from: Int, to: Int, depth: Int): Unit = {
        var i = from
        while (i + 8 <= to && steps < (1 << 20)) {
          steps += 1
          val ver = u16(i)
          val typ = u16(i + 2)
          val len = u32(i + 4)
          val body = i + 8
          if (len < 0 || body + len > to) return // truncated record
          if ((ver & 0xf) == 0xf && depth < 32) walk(body, (body + len).toInt, depth + 1)
          else if (typ == 0x0fa0) // TextCharsAtom: UTF-16LE
            paras += new String(doc, body, len.toInt & ~1, StandardCharsets.UTF_16LE)
          else if (typ == 0x0fa8) // TextBytesAtom: high-byte-zero chars
            paras += new String(doc, body, len.toInt, Cp1252)
          i = (body + len).toInt
        }
      }
      walk(0, doc.length, 0)
      // PPT text atoms use \r between paragraphs within one atom
      val split = paras.flatMap(_.split("[\r]", -1))
      if (split.forall(_.isEmpty)) OoxmlFailure("no text content")
      else OoxmlParser.paragraphsToResult(split.toSeq, "p")
    } catch {
      case NonFatal(_) | _: StackOverflowError => OoxmlFailure("ppt parse error")
    }
}
