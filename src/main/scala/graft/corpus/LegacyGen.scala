package graft.corpus

import java.nio.charset.{Charset, StandardCharsets}
import scala.collection.mutable.ArrayBuffer

/** Deterministic writers for the legacy-format corpus categories: OLE2/CFB
  * compound files (the .doc/.xls/.ppt container, MS-CFB) with REAL Office
  * content streams — MS-DOC FIB + piece table, BIFF8 SST, PPT text atoms —
  * and RTF. Closes the CfbReader/DocParser/XlsParser/PptParser input
  * domains the way PdfGen/ZipGen do for their parsers. Byte-stable pure
  * functions of their arguments. */
object LegacyGen {

  private val SectorSize = 512
  private val FreeSect = 0xffffffff
  private val EndOfChain = 0xfffffffe
  private val FatSect = 0xfffffffd
  private val MiniCutoff = 4096
  private val MiniSector = 64

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  /** One 128-byte CFB directory entry. */
  private def dirEntry(name: String, objType: Int, startSector: Int,
      size: Int, childId: Int = -1, rightSib: Int = -1): Array[Byte] = {
    val e = new Array[Byte](128)
    val n = name.take(31)
    var i = 0
    while (i < n.length) { le16(e, i * 2, n.charAt(i).toInt); i += 1 }
    le16(e, 64, (n.length + 1) * 2) // name length incl. UTF-16 NUL
    e(66) = objType.toByte // 5 = root storage, 2 = stream, 0 = unused
    e(67) = 1 // color: black
    le32(e, 68, -1) // left sibling
    le32(e, 72, rightSib)
    le32(e, 76, childId)
    le32(e, 116, startSector)
    le32(e, 120, size)
    e
  }

  /** Back-compat single-stream CFB (fuzz + unknown-compound fixtures). */
  def cfb(streamName: String, payload: Array[Byte]): Array[Byte] =
    cfbMulti(Seq(streamName -> payload))

  /** Structurally-valid CFB v3 with any number of streams. Streams below
    * the 4096 B cutoff go through the MINI stream + mini FAT (exercising
    * the reader's mini path — real Office Table streams are small); larger
    * ones get regular FAT chains. */
  def cfbMulti(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val (small, big) = streams.partition(_._2.length < MiniCutoff)

    // ---- mini stream: small streams padded to 64 B mini sectors
    val miniChunks = small.map { case (_, d) =>
      math.max(1, (d.length + MiniSector - 1) / MiniSector)
    }
    val miniTotal = miniChunks.sum
    val miniStream = new Array[Byte](miniTotal * MiniSector)
    val miniStarts = new Array[Int](small.length)
    var mc = 0
    small.zipWithIndex.foreach { case ((_, d), i) =>
      miniStarts(i) = mc
      d.copyToArray(miniStream, mc * MiniSector, d.length)
      mc += miniChunks(i)
    }
    // mini FAT: one chain per small stream
    val miniFatEntries = new Array[Int](miniTotal)
    small.indices.foreach { i =>
      val st = miniStarts(i)
      val n = miniChunks(i)
      var j = 0
      while (j < n) {
        miniFatEntries(st + j) = if (j == n - 1) EndOfChain else st + j + 1
        j += 1
      }
    }

    // ---- regular-sector components, in layout order after the FAT:
    // directory, miniFAT, ministream, each big stream
    def sectorsFor(len: Int): Int = math.max(1, (len + SectorSize - 1) / SectorSize)
    val nEntries = 1 + streams.length
    val dirSectors = sectorsFor(nEntries * 128)
    val miniFatSectors = if (miniTotal == 0) 0 else sectorsFor(miniFatEntries.length * 4)
    val miniStreamSectors = if (miniTotal == 0) 0 else sectorsFor(miniStream.length)
    val bigSectors = big.map { case (_, d) => sectorsFor(d.length) }
    val nonFat = dirSectors + miniFatSectors + miniStreamSectors + bigSectors.sum
    var fatCount = 1
    while (fatCount * (SectorSize / 4) < fatCount + nonFat) fatCount += 1

    val total = fatCount + nonFat
    val out = new Array[Byte](SectorSize * (1 + total))
    val fat = new Array[Int](total)

    var next = fatCount // next free sector index
    def placeChain(data: Array[Byte], nSectors: Int): Int = {
      val start = next
      data.copyToArray(out, SectorSize * (1 + start), data.length)
      var j = 0
      while (j < nSectors) {
        fat(start + j) = if (j == nSectors - 1) EndOfChain else start + j + 1
        j += 1
      }
      next += nSectors
      start
    }

    // directory content needs the start sectors — compute placement first
    val dirStart = next; next += dirSectors
    (0 until dirSectors).foreach { j =>
      fat(dirStart + j) = if (j == dirSectors - 1) EndOfChain else dirStart + j + 1
    }
    val miniFatStart = if (miniTotal == 0) EndOfChain else {
      val mfBytes = new Array[Byte](miniFatEntries.length * 4)
      miniFatEntries.zipWithIndex.foreach { case (v, i) => le32(mfBytes, i * 4, v) }
      placeChain(mfBytes, miniFatSectors)
    }
    val miniStreamStart = if (miniTotal == 0) EndOfChain else
      placeChain(miniStream, miniStreamSectors)
    val bigStarts = big.zip(bigSectors).map { case ((_, d), n) => placeChain(d, n) }

    // FAT sectors mark themselves
    (0 until fatCount).foreach(i => fat(i) = FatSect)

    // ---- directory: Root + one entry per stream (flat right-sibling chain)
    var smallIdx = 0
    var bigIdx = 0
    val entryBytes = new ArrayBuffer[Array[Byte]](nEntries)
    entryBytes += dirEntry("Root Entry", 5,
      if (miniTotal == 0) EndOfChain else miniStreamStart,
      miniStream.length, childId = if (streams.nonEmpty) 1 else -1)
    streams.zipWithIndex.foreach { case ((name, d), i) =>
      val right = if (i == streams.length - 1) -1 else i + 2
      val start =
        if (d.length < MiniCutoff) { val s = miniStarts(smallIdx); smallIdx += 1; s }
        else { val s = bigStarts(bigIdx); bigIdx += 1; s }
      entryBytes += dirEntry(name, 2, start, d.length, rightSib = right)
    }
    entryBytes.zipWithIndex.foreach { case (e, i) =>
      e.copyToArray(out, SectorSize * (1 + dirStart) + i * 128, 128)
    }

    // ---- FAT sectors
    fat.zipWithIndex.foreach { case (v, i) =>
      le32(out, SectorSize * (1 + i / (SectorSize / 4)) + (i % (SectorSize / 4)) * 4, v)
    }
    // pad unused FAT slots with FREESECT
    var slot = fat.length
    while (slot < fatCount * (SectorSize / 4)) {
      le32(out, SectorSize * (1 + slot / (SectorSize / 4)) + (slot % (SectorSize / 4)) * 4, FreeSect)
      slot += 1
    }

    // ---- header
    val magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    var i = 0
    while (i < 8) { out(i) = magic(i).toByte; i += 1 }
    le16(out, 24, 0x3e) // minor version
    le16(out, 26, 3) // major version 3 (512 B sectors)
    le16(out, 28, 0xfffe) // little-endian BOM
    le16(out, 30, 9) // sector shift: 2^9
    le16(out, 32, 6) // mini sector shift
    le32(out, 40, dirSectors) // number of directory sectors (v4 field; ok 0/any in v3)
    le32(out, 44, fatCount)
    le32(out, 48, dirStart)
    le32(out, 56, MiniCutoff)
    le32(out, 60, if (miniTotal == 0) EndOfChain else miniFatStart)
    le32(out, 64, miniFatSectors)
    le32(out, 68, EndOfChain) // no DIFAT sectors (fatCount <= 109 always here)
    le32(out, 72, 0)
    require(fatCount <= 109, "corpus CFB files never need chained DIFAT")
    (0 until fatCount).foreach(f => le32(out, 76 + f * 4, f))
    (fatCount until 109).foreach(f => le32(out, 76 + f * 4, FreeSect))
    out
  }

  // ------------------------------------------------------------- MS-DOC

  private val Cp1252 = Charset.forName("windows-1252")

  /** Word 97 binary .doc: WordDocument stream with a FIB + text, 1Table
    * stream with the Clx piece table. TWO pieces — the first stored
    * compressed (cp1252), the second UTF-16LE — so both piece encodings
    * are exercised. Paragraphs end with the Word paragraph mark (\r). */
  def doc(paragraphs: Seq[String]): Array[Byte] = {
    val text = paragraphs.map(_ + "\r").mkString
    val splitAt = text.length / 2
    // piece 1 must survive cp1252: swap any unmappable char for '?'
    val p1 = text.substring(0, splitAt).map(c => if (c <= 0xff) c else '?')
    val p2 = text.substring(splitAt)
    val fibLen = 1024
    val p1Bytes = p1.toString.getBytes(Cp1252)
    val p1Off = fibLen
    var p2Off = p1Off + p1Bytes.length
    if ((p2Off & 1) != 0) p2Off += 1 // UTF-16 text starts even-aligned
    val p2Bytes = p2.getBytes(StandardCharsets.UTF_16LE)
    val word = new Array[Byte](p2Off + p2Bytes.length)
    p1Bytes.copyToArray(word, p1Off)
    p2Bytes.copyToArray(word, p2Off)

    val ccpText = p1.length + p2.length
    // FIB: base + fibRgW(csw=0x0E) + fibRgLw(cslw=0x16) + fibRgFcLcb97(0x5D)
    le16(word, 0, 0xa5ec) // wIdent
    le16(word, 2, 0x00c1) // nFib (Word 97)
    le16(word, 10, 0x0200) // flags: fWhichTblStm = 1 -> "1Table"
    le16(word, 32, 0x000e) // csw
    val cslwOff = 32 + 2 + 0x0e * 2 // = 62
    le16(word, cslwOff, 0x0016) // cslw
    val rgLwOff = cslwOff + 2 // = 64
    le32(word, rgLwOff + 12, ccpText) // FibRgLw97.ccpText (dword index 3)
    val cbOff = rgLwOff + 0x16 * 4 // = 152
    le16(word, cbOff, 0x005d) // cbRgFcLcb (93 pairs)
    val blobOff = cbOff + 2 // = 154
    val fcClxOff = blobOff + 33 * 8 // fcClx is FcLcb pair 33 (offset 0x1A2)
    // Clx lives at offset 0 of the 1Table stream
    val clx = buildClx(ccpText, p1.length,
      fc1 = (p1Off * 2) | 0x40000000, fc2 = p2Off)
    le32(word, fcClxOff, 0)
    le32(word, fcClxOff + 4, clx.length)

    cfbMulti(Seq(
      "WordDocument" -> word,
      "1Table" -> clx,
      "\u0005SummaryInformation" -> new Array[Byte](64)))
  }

  /** Clx: a Pcdt (clxt=2) holding a PlcPcd with two pieces. */
  private def buildClx(ccpText: Int, cp1: Int, fc1: Int, fc2: Int): Array[Byte] = {
    val n = 2
    val lcb = 4 * (n + 1) + 8 * n
    val clx = new Array[Byte](1 + 4 + lcb)
    clx(0) = 2 // clxt = Pcdt
    le32(clx, 1, lcb)
    le32(clx, 5, 0) // cp[0]
    le32(clx, 9, cp1) // cp[1]
    le32(clx, 13, ccpText) // cp[2]
    // PCD: u16 flags, u32 fc, u16 prm
    le16(clx, 17, 0); le32(clx, 19, fc1); le16(clx, 23, 0)
    le16(clx, 25, 0); le32(clx, 27, fc2); le16(clx, 31, 0)
    clx
  }

  // -------------------------------------------------------------- BIFF8

  /** Excel 97 binary .xls: Workbook stream with BOF + SST (one non-rich
    * XLUnicodeRichExtendedString per input, alternating 8-bit/UTF-16
    * encodings by content) + EOF. */
  def xls(strings: Seq[String]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream(1024)
    def record(op: Int, payload: Array[Byte]): Unit = {
      val h = new Array[Byte](4)
      le16(h, 0, op); le16(h, 2, payload.length)
      body.write(h, 0, 4); body.write(payload, 0, payload.length)
    }
    val bof = new Array[Byte](16)
    le16(bof, 0, 0x0600) // BIFF8
    le16(bof, 2, 0x0005) // workbook globals
    record(0x0809, bof)
    val sst = new java.io.ByteArrayOutputStream(512)
    val cnt = new Array[Byte](8)
    le32(cnt, 0, strings.length); le32(cnt, 4, strings.length)
    sst.write(cnt, 0, 8)
    strings.foreach { s0 =>
      val s = s0.take(255)
      val wide = s.exists(_ > 0xff)
      val h = new Array[Byte](3)
      le16(h, 0, s.length)
      h(2) = if (wide) 1 else 0 // fHighByte only; not rich, no ext
      sst.write(h, 0, 3)
      val chars = if (wide) s.getBytes(StandardCharsets.UTF_16LE)
        else s.getBytes(Cp1252)
      sst.write(chars, 0, chars.length)
    }
    record(0x00fc, sst.toByteArray)
    record(0x000a, Array.emptyByteArray) // EOF
    cfbMulti(Seq("Workbook" -> body.toByteArray))
  }

  // -------------------------------------------------------------- MS-PPT

  /** PowerPoint 97 binary .ppt: "PowerPoint Document" stream — a document
    * container holding one container per slide, each with TextCharsAtom
    * (UTF-16LE) or TextBytesAtom (8-bit) paragraphs, plus the customary
    * "Current User" stream. */
  def ppt(slides: Seq[Seq[String]]): Array[Byte] = {
    def recHeader(verInst: Int, typ: Int, len: Int): Array[Byte] = {
      val h = new Array[Byte](8)
      le16(h, 0, verInst); le16(h, 2, typ); le32(h, 4, len)
      h
    }
    def atom(text: String): Array[Byte] = {
      val wide = text.exists(_ > 0xff)
      val data = if (wide) text.getBytes(StandardCharsets.UTF_16LE)
        else text.getBytes(Cp1252)
      val typ = if (wide) 0x0fa0 else 0x0fa8 // TextCharsAtom / TextBytesAtom
      recHeader(0x0000, typ, data.length) ++ data
    }
    val slideBytes = slides.map { paras =>
      val inner = paras.toArray.flatMap(atom)
      recHeader(0x000f, 0x03ee, inner.length) ++ inner // SlideContainer
    }
    val docInner = slideBytes.toArray.flatten
    val doc = recHeader(0x000f, 0x03e8, docInner.length) ++ docInner
    cfbMulti(Seq(
      "PowerPoint Document" -> doc,
      "Current User" -> new Array[Byte](24)))
  }

  // ---------------------------------------------------------------- RTF

  /** RTF document: one `\par`-separated paragraph per input string, cp1252
    * preamble with font/color/info destination groups (so the parser's
    * group skipping is exercised), non-ASCII as `\uN?` escapes. */
  def rtf(paragraphs: Seq[String]): Array[Byte] = {
    val esc = paragraphs.map(_.flatMap {
      case '\\' => "\\\\"
      case '{' => "\\{"
      case '}' => "\\}"
      case c if c > 127 => s"\\u${c.toInt}?"
      case c => c.toString
    })
    ("{\\rtf1\\ansi\\ansicpg1252\\deff0" +
      "{\\fonttbl{\\f0\\fnil\\fcharset0 Times New Roman;}}" +
      "{\\colortbl;\\red0\\green0\\blue0;}" +
      "{\\info{\\author graft}{\\title synthetic}}" +
      "{\\*\\generator graft corpus}\n" +
      "\\viewkind4\\uc1\\pard\\f0\\fs24 " +
      esc.mkString("\\par\n") + "\\par}")
      .getBytes(StandardCharsets.ISO_8859_1)
  }
}
