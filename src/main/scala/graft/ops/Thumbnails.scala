package graft.ops

import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.ExtractedRow

/** Thumbnail artifact fan-out — the Spark re-expression of the reference's
  * per-document preview generation sized by the `thumbnails=WxH` option
  * (docsbox/docs/utils.py:99-115 get_thumbnails, tasks.py:186-201): one REAL
  * WxH PNG per finished document, its pixels a deterministic function of the
  * extracted text (the sandbox stand-in for rasterizing the page — no
  * renderer offline, but the artifact is a spec-valid PNG whose IHDR
  * round-trips through Multimodal.pngDims).
  *
  * Scale shape: a narrow map over the already-extracted rows (no re-parse,
  * no shuffle); the PNG encode is O(W*H) per doc and the option matrix caps
  * W,H via JobOptions. Output rows are (url, width, height, png).
  */
object Thumbnails {

  case class Thumb(url: String, width: Int, height: Int, png: Array[Byte])

  /** One thumbnail per finished doc; pixel pattern seeded by xxhash64(text)
    * so the artifact is deterministic and content-dependent. */
  def generate(extracted: Dataset[ExtractedRow], w: Int, h: Int): DataFrame = {
    import extracted.sparkSession.implicits._
    require(w > 0 && h > 0, s"thumbnail size must be positive: ${w}x$h")
    extracted
      .filter(col("status") === "finished")
      .select(col("url"), col("text"))
      .mapPartitions { it =>
        it.map { r =>
          val url = r.getString(0)
          val text = r.getAs[Array[Byte]](1)
          val seed = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            text, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, text.length, 42L)
          Thumb(url, w, h, png(w, h, seed))
        }
      }
      .toDF()
  }

  /** Spec-valid truecolor PNG (bit depth 8, no interlace): signature +
    * IHDR + one zlib-deflated IDAT of filter-0 scanlines + IEND. */
  def png(w: Int, h: Int, seed: Long): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w)) // per-row filter byte + RGB
    var y = 0
    var i = 0
    while (y < h) {
      raw(i) = 0 // filter: None
      i += 1
      var x = 0
      while (x < w) {
        // cheap splittable hash of (seed, x, y) -> stable RGB pattern
        var z = seed ^ (x * 0x9e3779b97f4a7c15L) ^ (y * 0xc2b2ae3d27d4eb4fL)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        raw(i) = (z >>> 16).toByte
        raw(i + 1) = (z >>> 32).toByte
        raw(i + 2) = (z >>> 48).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    val idat = deflate(raw)
    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    out.write(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), 0, 8)
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // truecolor
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    be32(len, 0, data.length)
    out.write(len, 0, 4)
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(t)
    crc.update(data)
    val c = new Array[Byte](4)
    be32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }
}
