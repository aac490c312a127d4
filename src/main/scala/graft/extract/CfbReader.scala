package graft.extract

import java.nio.charset.StandardCharsets
import scala.collection.mutable
import scala.util.control.NonFatal

/** OLE2/CFB compound-file reader (MS-CFB): FAT/DIFAT walk, directory
  * parse, regular + mini-stream extraction — the container under legacy
  * Office .doc/.xls/.ppt, which the reference converts via LibreOffice
  * (docsbox/config/config.yml:40-70). Hand-written like the other parsers
  * (no POI offline, SURVEY.md §0).
  *
  * Scope: returns every STREAM entry by name (storage hierarchy flattened —
  * the Office text streams live at the root). Bounded (sector-count and
  * stream-size caps), never throws: malformed input yields an empty map.
  */
object CfbReader {

  private val MaxSectors = 1 << 16 // 32 MB of 512 B sectors
  private val MaxStreamBytes = 32 << 20
  /** WHOLE-FILE extraction budget: a crafted directory can declare
    * thousands of large streams whose chains alias the same (or cyclic)
    * sectors — per-stream caps alone would still let a kilobyte input
    * expand to gigabytes of output (invariant 4: bad input must become a
    * status row, never an executor OOM). */
  private val MaxTotalBytes = 64 << 20
  private val EndOfChain = 0xfffffffeL

  /** Stream names only (directory walk, no data reads) — the cheap probe
    * the sniffer classifies legacy Office files with. */
  def streamNames(b: Array[Byte]): Set[String] =
    core(b, readData = false).keySet

  /** All stream entries (name -> bytes); empty on malformed input. */
  def streams(b: Array[Byte]): Map[String, Array[Byte]] =
    core(b, readData = true)

  private def core(b: Array[Byte], readData: Boolean): Map[String, Array[Byte]] = {
    try {
      if (b.length < 512) return Map.empty
      if ((b(0) & 0xff) != 0xd0 || (b(1) & 0xff) != 0xcf ||
          (b(2) & 0xff) != 0x11 || (b(3) & 0xff) != 0xe0) return Map.empty

      def u16(off: Int): Int =
        if (off + 2 > b.length) -1 else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      def u32(off: Int): Long =
        if (off + 4 > b.length) -1L
        else (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

      val shift = u16(30)
      if (shift != 9 && shift != 12) return Map.empty
      val sectorSize = 1 << shift
      def sectorOff(sect: Long): Long = (sect + 1) * sectorSize

      // ---- FAT via the DIFAT (header slots + chained DIFAT sectors)
      val numFat = u32(44)
      val fatSectors = mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < 109 && fatSectors.length < numFat) {
        val s = u32(76 + i * 4)
        if (s < 0xfffffffcL) fatSectors += s
        i += 1
      }
      var difat = u32(68)
      var guard = 0
      while (difat < 0xfffffffcL && guard < 4096 && fatSectors.length < numFat) {
        val base = sectorOff(difat)
        val perSector = sectorSize / 4 - 1
        var j = 0
        while (j < perSector && fatSectors.length < numFat) {
          val s = u32((base + j * 4).toInt)
          if (s < 0xfffffffcL) fatSectors += s
          j += 1
        }
        difat = u32((base + perSector * 4).toInt)
        guard += 1
      }
      val entriesPerFat = sectorSize / 4
      val fat = new Array[Long](math.min(fatSectors.length * entriesPerFat, MaxSectors))
      var k = 0
      while (k < fat.length) {
        val fs = fatSectors(k / entriesPerFat)
        fat(k) = u32((sectorOff(fs) + (k % entriesPerFat) * 4).toInt)
        k += 1
      }

      var budget = MaxTotalBytes.toLong // shared across ALL stream reads

      /** Follow a FAT chain from `start`, reading up to `size` bytes.
        * The buffer GROWS with the actual chain — `size` is an input-
        * controlled claim (and the directory/miniFAT reads pass the max),
        * so pre-allocating it would zero-fill up to 32 MB per call: that
        * alone made legacy-Office extraction ~25 ms/doc before this. */
      def readChain(start: Long, size: Long): Array[Byte] = {
        val cap = math.min(math.min(size, MaxStreamBytes), budget).toInt
        if (cap <= 0) return Array.emptyByteArray
        val out = new java.io.ByteArrayOutputStream(
          math.min(cap, 4 * sectorSize))
        var sect = start
        var written = 0
        var steps = 0
        var truncated = false
        while (!truncated && sect < 0xfffffffcL && written < cap &&
            steps < MaxSectors) {
          val off = sectorOff(sect)
          val n = math.min(sectorSize.toLong, (cap - written).toLong).toInt
          if (off + n > b.length) truncated = true
          else {
            out.write(b, off.toInt, n)
            written += n
            sect = if (sect < fat.length) fat(sect.toInt) else EndOfChain
            steps += 1
          }
        }
        budget -= written
        out.toByteArray
      }

      // ---- directory entries
      val dirBytes = readChain(u32(48), MaxStreamBytes.toLong)
      case class Entry(name: String, objType: Int, start: Long, size: Long)
      val entries = mutable.ArrayBuffer.empty[Entry]
      var e = 0
      while (e + 128 <= dirBytes.length && entries.length < 4096) {
        val off = e
        def du16(o: Int): Int = (dirBytes(off + o) & 0xff) | ((dirBytes(off + o + 1) & 0xff) << 8)
        def du32(o: Int): Long =
          (dirBytes(off + o) & 0xffL) | ((dirBytes(off + o + 1) & 0xffL) << 8) |
            ((dirBytes(off + o + 2) & 0xffL) << 16) | ((dirBytes(off + o + 3) & 0xffL) << 24)
        val nameLen = du16(64) // bytes incl. UTF-16 NUL
        val objType = dirBytes(off + 66) & 0xff
        if (nameLen >= 2 && nameLen <= 64 && (objType == 2 || objType == 5)) {
          val name = new String(dirBytes, off, nameLen - 2, StandardCharsets.UTF_16LE)
          entries += Entry(name, objType, du32(116), du32(120))
        }
        e += 128
      }
      if (entries.isEmpty) return Map.empty

      // ---- mini stream (streams below the cutoff live in 64 B mini
      // sectors inside the ROOT entry's chain, mapped by the mini FAT)
      val miniCutoff = u32(56)
      val root = entries.find(_.objType == 5)
      lazy val miniStream: Array[Byte] =
        root.map(r => readChain(r.start, r.size)).getOrElse(Array.emptyByteArray)
      lazy val miniFat: Array[Byte] = readChain(u32(60), MaxStreamBytes.toLong)
      def miniFatEntry(i: Int): Long = {
        val o = i * 4
        if (o + 4 > miniFat.length) EndOfChain
        else (miniFat(o) & 0xffL) | ((miniFat(o + 1) & 0xffL) << 8) |
          ((miniFat(o + 2) & 0xffL) << 16) | ((miniFat(o + 3) & 0xffL) << 24)
      }
      def readMiniChain(start: Long, size: Long): Array[Byte] = {
        val cap = math.min(math.min(size, MaxStreamBytes), budget).toInt
        if (cap <= 0) return Array.emptyByteArray
        val out = new java.io.ByteArrayOutputStream(math.min(cap, 4096))
        var sect = start
        var written = 0
        var steps = 0
        var truncated = false
        while (!truncated && sect < 0xfffffffcL && written < cap &&
            steps < MaxSectors) {
          val off = sect * 64
          val n = math.min(64L, (cap - written).toLong).toInt
          if (off + n > miniStream.length) truncated = true
          else {
            out.write(miniStream, off.toInt, n)
            written += n
            sect = miniFatEntry(sect.toInt)
            steps += 1
          }
        }
        budget -= written
        out.toByteArray
      }

      entries.iterator
        .filter(en => en.objType == 2 && en.size > 0)
        .map { en =>
          val data =
            if (!readData) Array.emptyByteArray
            else if (en.size < miniCutoff) readMiniChain(en.start, en.size)
            else readChain(en.start, en.size)
          en.name -> data
        }
        .toMap
    } catch {
      case NonFatal(_) | _: StackOverflowError => Map.empty
    }
  }
}
