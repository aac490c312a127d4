package graft.extract

/** Byte-signature MIME detection. Spark-side analog of the reference's
  * detection cascade exiftool -> libmagic -> 2KiB signature table
  * (docsbox/docs/utils.py:179-220, config/msooxml.txt:1-30): here a single
  * pure-Scala sniffer over the payload's leading bytes, run inside the typed
  * map stage so the cheap gate precedes the expensive extraction
  * (operator-ordering analog of views.py:133-137 early gating).
  */
object Sniffer {
  val MimeHtml = "text/html"
  val MimePdf = "application/pdf"
  val MimeText = "text/plain"
  val MimeUnknown = "Unknown/Corrupted"
  val MimeZip = "application/zip"
  val MimeDocx = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
  val MimePptx = "application/vnd.openxmlformats-officedocument.presentationml.presentation"
  val MimeXlsx = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
  val MimeOdt = "application/vnd.oasis.opendocument.text"
  // legacy OLE2/CFB Office (reference config.yml:40-70) + generic compound
  val MimeDoc = "application/msword"
  val MimeXls = "application/vnd.ms-excel"
  val MimePpt = "application/vnd.ms-powerpoint"
  val MimeCfb = "application/x-cfb"
  val MimeRtf = "text/rtf" // reference config.yml:71-74
  val MimeCsv = "text/csv" // reference magic fallback table, config.yml:191

  /** Type family for a detected mimetype — the routing key the dispatcher
    * uses and a user-facing column (detect-result analog, views.py:82-95). */
  def kindOf(mime: String): String = mime match {
    case MimeHtml => "html"
    case MimePdf => "pdf"
    case MimeText | MimeCsv => "text"
    case MimeRtf => "rtf"
    case MimeDocx | MimePptx | MimeXlsx => "ooxml"
    case MimeDoc | MimeXls | MimePpt | MimeCfb => "ole2"
    // ODF + its StarOffice/OpenOffice-1.x predecessors share the
    // content.xml extraction path (config.yml:75-110,134-153)
    case m if m.startsWith("application/vnd.oasis.opendocument") => "odf"
    case m if m.startsWith("application/vnd.sun.xml") => "odf"
    case m if m.startsWith("application/x-iwork") => "iwork"
    case "application/epub+zip" => "epub"
    case MimeZip => "zip"
    case m if m.startsWith("image/") => "image"
    case m if m.startsWith("audio/") => "audio"
    case m if m.startsWith("video/") => "video"
    case _ => "unknown"
  }

  private def startsWith(b: Array[Byte], sig: Array[Int], off: Int = 0): Boolean = {
    if (b.length < off + sig.length) return false
    var i = 0
    while (i < sig.length) {
      if (sig(i) >= 0 && (b(off + i) & 0xff) != sig(i)) return false
      i += 1
    }
    true
  }

  private def ascii(s: String): Array[Int] = s.map(_.toInt).toArray

  private val SigPdf = ascii("%PDF-")
  private val SigPng = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
  private val SigJpeg = Array(0xff, 0xd8, 0xff)
  private val SigGif = ascii("GIF8")
  private val SigZip = Array(0x50, 0x4b, 0x03, 0x04)
  private val SigFlac = ascii("fLaC")
  private val SigFtyp = ascii("ftyp") // mp4/heif family, at offset 4
  private val SigRiff = ascii("RIFF")
  private val SigOggS = ascii("OggS")
  private val SigCfb = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
  private val SigRtf = ascii("{\\rtf")
  private val SigTiffLe = Array(0x49, 0x49, 0x2a, 0x00) // II*\0
  private val SigTiffBe = Array(0x4d, 0x4d, 0x00, 0x2a) // MM\0*

  private val HtmlMarkers = Array(
    "<!doctype html", "<html", "<head", "<body", "<title", "<div", "<p>",
    "<p ", "<article", "<br", "<h1", "<meta", "<span", "<a href")

  /** Lowercased ASCII view of the first n bytes (non-ASCII -> NUL). */
  private def lowerPrefix(b: Array[Byte], n: Int): String = {
    val m = math.min(b.length, n)
    val arr = new Array[Char](m)
    var i = 0
    while (i < m) {
      val c = (b(i) & 0xff).toChar
      arr(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c < 0x80) c else '\u0000'
      i += 1
    }
    new String(arr)
  }

  private def looksHtml(b: Array[Byte]): Boolean = {
    val p = lowerPrefix(b, 2048)
    var i = 0
    while (i < HtmlMarkers.length) {
      if (p.contains(HtmlMarkers(i))) return true
      i += 1
    }
    false
  }

  /** Mostly printable ASCII / plausible UTF-8, no NULs in the first 512 B. */
  private def looksText(b: Array[Byte]): Boolean = {
    val m = math.min(b.length, 512)
    if (m == 0) return false
    var ok = 0
    var i = 0
    while (i < m) {
      val v = b(i) & 0xff
      if (v == 0) return false
      if (v == 0x09 || v == 0x0a || v == 0x0d || (v >= 0x20 && v < 0x7f) || v >= 0x80)
        ok += 1
      i += 1
    }
    ok.toDouble / m >= 0.95
  }

  /** Detect the payload's mimetype from magic bytes; unknown/empty ->
    * "Unknown/Corrupted" (utils.py:208-209 analog). Order matters: binary
    * signatures first (cheap, exact), then the HTML marker scan, then the
    * plain-text fallback — the short-circuit cost cascade of utils.py:179-220.
    */
  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length == 0) MimeUnknown
    else if (startsWith(b, SigPdf)) MimePdf
    else if (startsWith(b, SigPng)) "image/png"
    else if (startsWith(b, SigJpeg)) "image/jpeg"
    else if (startsWith(b, SigGif)) "image/gif"
    else if (startsWith(b, SigZip)) sniffZip(b)
    else if (startsWith(b, SigCfb)) sniffCfb(b)
    else if (startsWith(b, SigRtf)) MimeRtf
    else if (startsWith(b, SigTiffLe) || startsWith(b, SigTiffBe)) "image/tiff"
    else if (startsWith(b, SigFlac)) "audio/flac"
    else if (startsWith(b, SigOggS)) "audio/ogg"
    else if (startsWith(b, SigRiff)) riffKind(b)
    else if (startsWith(b, SigFtyp, off = 4)) ftypKind(b)
    else if (looksHtml(b)) MimeHtml
    else if (looksText(b)) { if (looksCsv(b)) MimeCsv else MimeText }
    else MimeUnknown
  }

  /** text/csv naming on the plain-text branch (the reference's magic
    * fallback table names text/csv, config.yml:191). Conservative shape
    * test so prose with commas stays text/plain: at least THREE complete
    * lines in the first 512 bytes (header + two data rows — two short
    * comma-bearing prose lines must not qualify), every line non-empty
    * and carrying the same nonzero comma count. */
  private def looksCsv(b: Array[Byte]): Boolean = {
    val m = math.min(b.length, 512)
    val s = new java.lang.String(b, 0, m, java.nio.charset.StandardCharsets.ISO_8859_1)
    // drop the possibly-truncated final line when the payload was cut
    val complete =
      if (m < b.length) s.substring(0, math.max(0, s.lastIndexOf('\n'))) else s
    val lines = complete.split("\n").map { l =>
      if (l.nonEmpty && l.charAt(l.length - 1) == '\r') l.substring(0, l.length - 1) else l
    }
    if (lines.length < 3 || lines.exists(_.isEmpty)) return false
    def commas(l: String): Int = { var n = 0; var i = 0
      while (i < l.length) { if (l.charAt(i) == ',') n += 1; i += 1 }; n }
    val c0 = commas(lines(0))
    c0 >= 1 && lines.forall(commas(_) == c0)
  }

  /** ISO-BMFF `ftyp` major brand at offset 8: the container is shared by
    * mp4 video, HEIF/HEIC images (reference registry image/heif+heic,
    * config.yml:119-133) and m4a audio — the brand disambiguates. */
  private def ftypKind(b: Array[Byte]): String = {
    if (b.length < 12) return "video/mp4"
    new java.lang.String(b, 8, 4, java.nio.charset.StandardCharsets.US_ASCII) match {
      case "heic" | "heix" | "hevc" | "heim" | "heis" | "hevm" | "hevs" => "image/heic"
      case "mif1" | "msf1" => "image/heif"
      case "M4A " => "audio/mp4"
      case _ => "video/mp4"
    }
  }

  /** OLE2/CFB compound files (legacy Office): classify doc/xls/ppt by the
    * characteristic directory stream names ("WordDocument",
    * "Workbook"/"Book", "PowerPoint Document"). Primary path: a REAL
    * directory walk (CfbReader — exact, immune to look-alike bytes in
    * stream content). Fallback for containers too mangled to walk: a
    * bounded UTF-16LE byte scan over the payload, so a truncated .doc
    * still surfaces typed rather than Unknown/Corrupted.
    *
    * Known cost: a legacy Office doc walks the container here AND again in
    * LegacyOffice's extraction (2x FAT+directory parse). Accepted: the
    * walk is header-bounded and tiny next to the text work, and threading
    * parsed state through the sniff->dispatch seam would couple every
    * format's detection to its extractor. */
  private def sniffCfb(b: Array[Byte]): String = {
    val names = CfbReader.streamNames(b)
    def classify(has: String => Boolean): String =
      if (has("WordDocument")) MimeDoc
      else if (has("Workbook") || has("Book")) MimeXls
      else if (has("PowerPoint Document")) MimePpt
      else MimeCfb
    if (names.nonEmpty) classify(names.contains)
    // fallback probes require the directory entry's trailing UTF-16 NUL:
    // a short name like "Book" would otherwise match inside ordinary
    // stream text (e.g. "Notebook" as UTF-16 content)
    else classify(n => containsUtf16(b, n + "\u0000"))
  }

  private val MaxCfbScan = 4 << 20 // directory sectors live well before 4 MB

  /** Bounded scan for the UTF-16LE encoding of `name`. */
  private def containsUtf16(b: Array[Byte], name: String): Boolean = {
    val n = math.min(b.length, MaxCfbScan)
    val m = name.length
    if (m == 0 || n < m * 2) return false
    var i = 0
    val limit = n - m * 2
    while (i <= limit) {
      var k = 0
      while (k < m && b(i + 2 * k) == name.charAt(k).toByte && b(i + 2 * k + 1) == 0)
        k += 1
      if (k == m) return true
      i += 1
    }
    false
  }

  /** RIFF containers carry their form type at offset 8 — WAVE is audio,
    * but WEBP images and AVI videos share the RIFF signature and must not
    * sniff as wav. */
  private def riffKind(b: Array[Byte]): String = {
    if (b.length < 12) return MimeUnknown
    val form = new java.lang.String(b, 8, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    form match {
      case "WAVE" => "audio/wav"
      case "WEBP" => "image/webp"
      case "AVI " => "video/x-msvideo"
      case _ => MimeUnknown
    }
  }

  /** Zip member probe — the msooxml signature-table analog (reference
    * docsbox/config/msooxml.txt:1-30, utils.py:196-206): OOXML carries no
    * top-level mimetype member, so the member NAMES distinguish docx/pptx/
    * xlsx ("word/", "ppt/", "xl/"); ODF stores an uncompressed "mimetype"
    * member whose CONTENT is the mimetype. Walks up to `MaxMembers` local
    * file headers (skipping by the recorded compressed size — works for
    * non-streaming zips; a streaming zip with zero sizes just stops the
    * walk), never inflates anything, touches at most a few KB. */
  private val MaxMembers = 32 // real-world OOXML can lead with docProps/
  // _rels/customXml members; the walk stays a few KB regardless

  private def sniffZip(b: Array[Byte]): String = {
    var off = 0
    var seen = 0
    // iWork'13+ bundles carry no mimetype member; classify by the .iwa
    // member layout AFTER the walk (Index/Document.iwa is common to all
    // three apps — only Slide/Tables members disambiguate)
    var iworkDoc = false
    var iworkSlide = false
    var iworkTables = false
    while (seen < MaxMembers && off + 30 <= b.length &&
        startsWith(b, SigZip, off)) {
      def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      def u32(i: Int): Long =
        (u16(i).toLong & 0xffffL) | ((u16(i + 2).toLong & 0xffffL) << 16)
      val flags = u16(off + 6)
      val method = u16(off + 8)
      val compSize = u32(off + 18)
      val nameLen = u16(off + 26)
      val extraLen = u16(off + 28)
      val nameStart = off + 30
      if (nameStart + nameLen > b.length) return MimeZip
      val name = new java.lang.String(b, nameStart, nameLen,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      if (name.startsWith("word/")) return MimeDocx
      if (name.startsWith("ppt/")) return MimePptx
      if (name.startsWith("xl/")) return MimeXlsx
      if (name == "mimetype" && method == 0 && compSize > 0 && compSize < 256) {
        val cs = nameStart + nameLen + extraLen
        if (cs + compSize <= b.length) {
          val m = new java.lang.String(b, cs, compSize.toInt,
            java.nio.charset.StandardCharsets.ISO_8859_1).trim
          if (m.startsWith("application/")) return m
        }
        return MimeZip
      }
      if (name.startsWith("Index/Document.iwa")) iworkDoc = true
      else if (name.startsWith("Index/Slide")) iworkSlide = true
      else if (name.startsWith("Index/Tables/") ||
        name.startsWith("Index/CalculationEngine")) iworkTables = true
      // streaming entry (bit 3): sizes are 0 in the local header — cannot
      // skip reliably; classify on what we have seen so far
      if ((flags & 0x8) != 0 && compSize == 0 && !name.endsWith("/"))
        return iworkMime(iworkDoc, iworkSlide, iworkTables)
      // compSize is u32: guard the skip against int overflow (a 4 GB entry
      // would wrap `off` negative and read out of bounds)
      val next = nameStart.toLong + nameLen + extraLen + compSize
      if (next <= off || next > Int.MaxValue)
        return iworkMime(iworkDoc, iworkSlide, iworkTables)
      off = next.toInt
      seen += 1
    }
    iworkMime(iworkDoc, iworkSlide, iworkTables)
  }

  /** Apple iWork mimetypes (reference registry config.yml:90-110). */
  private def iworkMime(doc: Boolean, slide: Boolean, tables: Boolean): String =
    if (slide) "application/x-iwork-keynote-sffkey"
    else if (tables) "application/x-iwork-numbers-sffnumbers"
    else if (doc) "application/x-iwork-pages-sffpages"
    else MimeZip
}
