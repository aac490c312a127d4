package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.extract.Sniffer

/** Multimodal columns for a training-data pipeline: image/audio/video travel
  * as opaque `binary` columns with typed metadata extracted Spark-side.
  *
  * The DECODE step is STUBBED (this container has no image/audio codecs):
  * `decodeFeaturesStub` produces a deterministic fake feature vector from
  * the payload bytes and is clearly marked as the seam where a real decoder
  * (or a `mapInPandas` Pandas-UDF batch in PySpark) plugs in. Everything
  * around the stub is real and tested: schema, header parsing, the
  * batch-shaped mapPartitions plumbing, partitioning behavior.
  *
  * Batch shape: payloads are processed in bounded batches of `BatchSize`
  * inside each partition — the exact contract of `mapInPandas`/Arrow
  * record batches (bounded memory per batch, vectorizable decode), so the
  * stub swaps for a real batched decoder without a plan change.
  */
object Multimodal {

  val BatchSize = 64

  case class MediaMeta(
      url: String,
      mediaType: String, // image/png, video/mp4, audio/flac, ...
      byteLen: Long,
      width: Int, // -1 when not parseable / not an image
      height: Int,
      sampleRate: Int, // -1 when not parseable / not audio
      channels: Int)

  case class MediaFeature(
      url: String,
      mediaType: String,
      feature: Array[Float], // stub "embedding" of the decoded payload
      frames: Int) // frame-sample count (video) or 1

  private def beInt(b: Array[Byte], off: Int): Int =
    if (b.length < off + 4) -1
    else ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Real header parse: PNG IHDR width/height (bytes 16..23 after the
    * 8-byte signature + IHDR chunk header). */
  def pngDims(b: Array[Byte]): (Int, Int) =
    if (b.length >= 24 && (b(12) & 0xff) == 'I' && (b(13) & 0xff) == 'H')
      (beInt(b, 16), beInt(b, 20))
    else (-1, -1)

  private def le16(b: Array[Byte], off: Int): Int =
    if (b.length < off + 2) -1 else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    if (b.length < off + 4) -1
    else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def be16(b: Array[Byte], off: Int): Int =
    if (b.length < off + 2) -1 else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Real header parse: GIF logical-screen width/height (LE16 at 6/8). */
  def gifDims(b: Array[Byte]): (Int, Int) =
    if (b.length >= 10) (le16(b, 6), le16(b, 8)) else (-1, -1)

  /** Real header parse: JPEG — walk marker segments to the first SOF frame
    * header (any of C0-C3, C5-C7, C9-CB, CD-CF — baseline, progressive,
    * differential and arithmetic variants); height BE16 at +5, width at +7.
    * Handles spec-legal 0xFF fill bytes between markers, standalone
    * markers (TEM, RSTn), and stops at SOS/EOI (entropy data follows —
    * scanning past it would match spurious byte patterns). */
  def jpegDims(b: Array[Byte]): (Int, Int) = {
    var i = 2 // past FFD8
    var guard = 0
    while (i + 4 <= b.length && guard < 256) {
      guard += 1
      if ((b(i) & 0xff) != 0xff) return (-1, -1)
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) i += 1 // fill byte, spec-legal padding
      else if (isSof(marker)) {
        // need the full 9-byte frame header; a truncated SOF must yield
        // (-1,-1), never a half-valid pair
        return if (i + 9 <= b.length) (be16(b, i + 7), be16(b, i + 5))
        else (-1, -1)
      }
      else if (marker == 0xda || marker == 0xd9) return (-1, -1) // SOS/EOI
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2 // standalone
      else {
        val len = be16(b, i + 2)
        if (len < 2) return (-1, -1)
        i += 2 + len
      }
    }
    (-1, -1)
  }

  /** SOF markers carrying frame dimensions: C0-CF except DHT (C4),
    * JPG-extension (C8), and DAC (CC). */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** Real header parse: TIFF — byte-order mark (II little / MM big endian),
    * first IFD via the offset at byte 4, entries scanned for ImageWidth
    * (tag 256) and ImageLength (tag 257); SHORT(3) and LONG(4) value types,
    * inline left-justified values per TIFF 6.0 §2. */
  def tiffDims(b: Array[Byte]): (Int, Int) = {
    if (b.length < 8) return (-1, -1)
    val le = b(0) == 'I'
    // bounds in SUBTRACTION form: `o + 2 > length` wraps negative for a
    // crafted IFD offset near Int.MaxValue and would pass the guard
    def u16(o: Int): Int = if (o < 0 || o > b.length - 2) -1
      else if (le) le16(b, o) else be16(b, o)
    def u32(o: Int): Int = if (o < 0 || o > b.length - 4) -1
      else if (le) le32(b, o) else beInt(b, o)
    val ifd = u32(4)
    if (ifd < 0 || ifd > b.length - 2) return (-1, -1)
    val n = u16(ifd)
    if (n < 0) return (-1, -1)
    var w = -1
    var h = -1
    var i = 0
    while (i < n && i < 256) {
      val e = ifd + 2 + i * 12 // ifd <= length, i <= 256: no overflow
      if (e > b.length - 12) return (w, h)
      val tag = u16(e)
      val typ = u16(e + 2)
      val v = if (typ == 3) u16(e + 8) else u32(e + 8)
      if (tag == 256) w = v
      else if (tag == 257) h = v
      i += 1
    }
    (w, h)
  }

  /** Real header parse: WebP VP8X extended-format chunk — canvas size as
    * 24-bit LE minus-one fields at offsets 24/27 (lossy VP8 / lossless VP8L
    * variants are left unparsed: (-1,-1)). */
  def webpDims(b: Array[Byte]): (Int, Int) = {
    if (b.length >= 30 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'X') {
      val w = 1 + ((b(24) & 0xff) | ((b(25) & 0xff) << 8) | ((b(26) & 0xff) << 16))
      val h = 1 + ((b(27) & 0xff) | ((b(28) & 0xff) << 8) | ((b(29) & 0xff) << 16))
      (w, h)
    } else (-1, -1)
  }

  /** Real header parse: HEIF/HEIC — ISO-BMFF box walk to the image
    * spatial-extents property: meta (FullBox) -> iprp -> ipco -> ispe
    * (FullBox: width u32, height u32). Bounded depth/steps; any malformed
    * size yields (-1,-1). */
  def heifDims(b: Array[Byte]): (Int, Int) = {
    def u32(o: Int): Long =
      if (o < 0 || o > b.length - 4) -1L
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    // containers to descend into; meta/ispe are FullBoxes (4 extra bytes)
    val containers = Set("meta", "iprp", "ipco")
    def walk(from: Int, to: Int, depth: Int): (Int, Int) = {
      var i = from
      var steps = 0
      while (i >= 0 && i + 8 <= to && steps < 256) {
        steps += 1
        val size = u32(i)
        val typ = new java.lang.String(b, i + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        // size 0 = to end of enclosing box; size 1 (64-bit largesize) and
        // other sub-header sizes are treated as malformed
        val end = if (size == 0) to.toLong else i + size
        if (size != 0 && (size < 8 || end > to)) return (-1, -1)
        if (typ == "ispe") {
          val w = u32(i + 12) // past header + FullBox version/flags
          val h = u32(i + 16)
          if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
            return (w.toInt, h.toInt)
          return (-1, -1)
        }
        if (containers.contains(typ) && depth < 8) {
          val bodyOff = if (typ == "meta") i + 12 else i + 8 // FullBox skip
          val r = walk(bodyOff, end.toInt, depth + 1)
          if (r != ((-1, -1))) return r
        }
        i = end.toInt
      }
      (-1, -1)
    }
    walk(0, b.length, 0)
  }

  /** Real header parse: WAV fmt chunk — (sampleRate, channels); the fmt
    * chunk is at offset 12 in canonical RIFF/WAVE files (walks chunks). */
  def wavMeta(b: Array[Byte]): (Int, Int) = {
    if (b.length < 36 || !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return (-1, -1)
    var i = 12
    var guard = 0
    while (i + 8 <= b.length && guard < 32) {
      guard += 1
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
      val size = le32(b, i + 4)
      if (isFmt) return (le32(b, i + 12), le16(b, i + 10))
      if (size < 0) return (-1, -1)
      i += 8 + size + (size & 1)
    }
    (-1, -1)
  }

  /** STUB decode -> feature vector. Deterministic pure function of the
    * payload bytes (splittable-hash expansion) standing in for a real
    * decode+embed; swap body for the actual codec call. */
  def decodeFeaturesStub(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val h0 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      payload, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, payload.length, 42L)
    Array.tabulate(dim) { i =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h0 + i, 7L)
      ((h >>> 11) * 1.1102230246251565e-16).toFloat * 2f - 1f
    }
  }

  /** STUB frame sample count for video payloads: deterministic in [1, 8]. */
  def frameCountStub(payload: Array[Byte]): Int =
    1 + (math.abs(payload.length * 2654435761L) % 8L).toInt

  /** Typed metadata for every media payload in a (url, binary) table —
    * narrow map, no shuffle; header parse only, no decode. */
  def mediaMeta(docs: DataFrame, urlCol: String = "url", binCol: String = "html"): Dataset[MediaMeta] = {
    import docs.sparkSession.implicits._
    docs.select(col(urlCol), col(binCol)).mapPartitions { it =>
      it.flatMap { r =>
        val url = r.getString(0)
        val b = r.getAs[Array[Byte]](1)
        val mime = Sniffer.sniff(b)
        if (mime.startsWith("image/") || mime.startsWith("video/") || mime.startsWith("audio/")) {
          val (w, h) = mime match {
            case "image/png" => pngDims(b)
            case "image/gif" => gifDims(b)
            case "image/jpeg" => jpegDims(b)
            case "image/tiff" => tiffDims(b)
            case "image/webp" => webpDims(b)
            case "image/heic" | "image/heif" => heifDims(b)
            case _ => (-1, -1)
          }
          val (rate, ch) = if (mime == "audio/wav") wavMeta(b) else (-1, -1)
          Some(MediaMeta(url, mime, b.length.toLong, w, h, rate, ch))
        } else None
      }
    }
  }

  /** Batched stub decode -> features. Processes payloads in BatchSize groups
    * per partition (the mapInPandas batch contract). */
  def mediaFeatures(docs: DataFrame, urlCol: String = "url", binCol: String = "html"): Dataset[MediaFeature] = {
    import docs.sparkSession.implicits._
    docs.select(col(urlCol), col(binCol)).mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch boundary = where a real vectorized decoder would run once
        batch.iterator.flatMap { r =>
          val url = r.getString(0)
          val b = r.getAs[Array[Byte]](1)
          val mime = Sniffer.sniff(b)
          if (mime.startsWith("image/") || mime.startsWith("video/") || mime.startsWith("audio/")) {
            val frames = if (mime.startsWith("video/")) frameCountStub(b) else 1
            Some(MediaFeature(url, mime, decodeFeaturesStub(b), frames))
          } else None
        }
      }
    }
  }
}
