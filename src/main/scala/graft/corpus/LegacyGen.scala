package graft.corpus

import java.nio.charset.StandardCharsets

/** Deterministic writers for the legacy-format corpus categories: OLE2/CFB
  * compound files (the .doc/.xls/.ppt container, MS-CFB spec) and RTF —
  * closing the Sniffer/RtfParser input domain the way PdfGen/ZipGen do for
  * their parsers. Byte-stable pure functions of their arguments. */
object LegacyGen {

  private val SectorSize = 512
  private val FreeSect = 0xffffffff
  private val EndOfChain = 0xfffffffe
  private val FatSect = 0xfffffffd

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  /** One 128-byte CFB directory entry. */
  private def dirEntry(name: String, objType: Int, startSector: Int,
      size: Int, childId: Int = -1): Array[Byte] = {
    val e = new Array[Byte](128)
    val n = name.take(31)
    var i = 0
    while (i < n.length) { le16(e, i * 2, n.charAt(i).toInt); i += 1 }
    le16(e, 64, (n.length + 1) * 2) // name length incl. UTF-16 NUL
    e(66) = objType.toByte // 5 = root storage, 2 = stream, 0 = unused
    e(67) = 1 // color: black
    le32(e, 68, -1) // left sibling
    le32(e, 72, -1) // right sibling
    le32(e, 76, childId)
    le32(e, 116, startSector)
    le32(e, 120, size)
    e
  }

  /** Minimal structurally-plausible CFB: 512 B header + FAT sector +
    * directory sector (Root Entry + one named stream) + the stream's data
    * sectors. `streamName` is what classifies the file ("WordDocument",
    * "Workbook", "PowerPoint Document"). */
  def cfb(streamName: String, payload: Array[Byte]): Array[Byte] = {
    val dataSectors = math.max(1, (payload.length + SectorSize - 1) / SectorSize)
    val totalSectors = 2 + dataSectors // FAT, directory, data...
    val out = new Array[Byte](SectorSize * (1 + totalSectors))

    // ---- header (sector -1)
    val magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    var i = 0
    while (i < 8) { out(i) = magic(i).toByte; i += 1 }
    le16(out, 24, 0x3e) // minor version
    le16(out, 26, 3) // major version 3 (512 B sectors)
    le16(out, 28, 0xfffe) // little-endian BOM
    le16(out, 30, 9) // sector shift: 2^9
    le16(out, 32, 6) // mini sector shift
    le32(out, 44, 1) // number of FAT sectors
    le32(out, 48, 1) // first directory sector
    le32(out, 56, 0x1000) // mini-stream cutoff
    le32(out, 60, EndOfChain) // first mini-FAT sector: none
    le32(out, 68, EndOfChain) // first DIFAT sector: none
    le32(out, 76, 0) // DIFAT[0] = FAT sector 0
    i = 80
    while (i < SectorSize) { le32(out, i, FreeSect); i += 4 } // DIFAT rest

    // ---- sector 0: the FAT
    val fat = SectorSize
    le32(out, fat, FatSect) // sector 0 is the FAT itself
    le32(out, fat + 4, EndOfChain) // sector 1: directory chain
    var sct = 0
    while (sct < dataSectors) { // data chain 2..n
      val next = if (sct == dataSectors - 1) EndOfChain else 3 + sct
      le32(out, fat + 8 + sct * 4, next)
      sct += 1
    }
    i = fat + 8 + dataSectors * 4
    while (i < fat + SectorSize) { le32(out, i, FreeSect); i += 4 }

    // ---- sector 1: directory (Root Entry + stream + 2 unused)
    val dir = SectorSize * 2
    dirEntry("Root Entry", 5, EndOfChain, 0, childId = 1)
      .copyToArray(out, dir)
    dirEntry(streamName, 2, 2, payload.length).copyToArray(out, dir + 128)

    // ---- sectors 2..: stream payload (zero-padded)
    payload.copyToArray(out, SectorSize * 3, payload.length)
    out
  }

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
