package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusWriter
import graft.ops.Multimodal

/** Multimodal plumbing: typed metadata over opaque binary columns, real PNG
  * header parsing, deterministic stub decode in mapInPandas-style batches. */
class MultimodalSpec extends AnyFunSuite {

  test("media metadata: types detected, image dims + wav format parsed") {
    val spark = TestSpark.spark
    // 500 rows: media-junk variants rotate PER ROW (c8), so all 9 —
    // mp4, flac, png, gif, jpeg, wav, tiff, webp, heif/heic — appear
    val pages = CorpusWriter.pagesDs(spark, 500L, partitions = 4)
    val meta = Multimodal.mediaMeta(pages).collect()
    assert(meta.nonEmpty)
    val types = meta.map(_.mediaType).toSet
    assert(Set("video/mp4", "audio/flac", "image/png", "image/gif",
      "image/jpeg", "audio/wav", "image/tiff", "image/webp").subsetOf(types),
      s"got $types")
    assert(types.contains("image/heic") || types.contains("image/heif"),
      s"corpus must exercise the heif/heic ftyp branch: $types")
    // EVERY image row — incl. heif's ispe walk — parses real dims
    val imgs = meta.filter(_.mediaType.startsWith("image/"))
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      assert(m.width >= 16 && m.width < 16 + 2048, s"${m.mediaType} width ${m.width}")
      assert(m.height >= 16 && m.height < 16 + 2048, s"${m.mediaType} height ${m.height}")
    }
    val wavs = meta.filter(_.mediaType == "audio/wav")
    assert(wavs.nonEmpty)
    wavs.foreach { m =>
      assert(Set(8000, 16000, 22050, 44100, 48000).contains(m.sampleRate), m)
      assert(m.channels == 1 || m.channels == 2, m)
    }
    // non-media payloads excluded
    assert(meta.forall(m => !m.mediaType.startsWith("text/")))
  }

  test("tiff dims: big-endian + LONG-typed entries parse; junk never throws") {
    val be = Array[Byte]('M', 'M', 0, 0x2a, 0, 0, 0, 8,
      0, 2, // 2 entries
      1, 0, 0, 4, 0, 0, 0, 1, 0, 0, 2, 0, // tag 256 LONG 512
      1, 1, 0, 3, 0, 0, 0, 1, 1, 0, 0, 0, // tag 257 SHORT 256
      0, 0, 0, 0)
    assert(Multimodal.tiffDims(be) == ((512, 256)))
    assert(Multimodal.tiffDims(Array[Byte]('I', 'I', 0x2a, 0)) == ((-1, -1)))
    // IFD offset pointing out of bounds / negative: safe
    assert(Multimodal.tiffDims(Array[Byte]('I', 'I', 0x2a, 0,
      -1, -1, -1, -1)) == ((-1, -1)))
    // IFD offset near Int.MaxValue: the bounds check must not overflow
    assert(Multimodal.tiffDims(Array[Byte]('I', 'I', 0x2a, 0,
      -2, -1, -1, 0x7f)) == ((-1, -1)))
    assert(Multimodal.webpDims("RIFF0000WEBPVP8 ".getBytes ++
      new Array[Byte](16)) == ((-1, -1)))
  }

  test("heif dims: box walk to meta/iprp/ipco/ispe; malformed sizes safe") {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ typ.getBytes ++ payload
    val ispe = box("ispe", be32(0) ++ be32(640) ++ be32(480)) // v/flags, w, h
    val meta = box("meta", be32(0) ++ box("iprp", box("ipco", ispe)))
    val ftyp = box("ftyp", "heicmif1".getBytes)
    val heic = ftyp ++ meta
    assert(graft.extract.Sniffer.sniff(heic) == "image/heic")
    assert(Multimodal.heifDims(heic) == ((640, 480)))
    // malformed: truncated, zero-size inner loop, size beyond bounds
    assert(Multimodal.heifDims(java.util.Arrays.copyOf(heic, 20)) == ((-1, -1)))
    val bad = heic.clone(); be32(3).copyToArray(bad, ftyp.length) // meta size 3
    assert(Multimodal.heifDims(bad) == ((-1, -1)))
    assert(Multimodal.heifDims(Array.emptyByteArray) == ((-1, -1)))
  }

  test("stub decode: deterministic features, fixed dim, video frame samples") {
    val spark = TestSpark.spark
    val pages = CorpusWriter.pagesDs(spark, 500L, partitions = 4)
    val a = Multimodal.mediaFeatures(pages).collect().map(f =>
      f.url -> (f.feature.toVector, f.frames)).toMap
    val b = Multimodal.mediaFeatures(pages).collect().map(f =>
      f.url -> (f.feature.toVector, f.frames)).toMap
    assert(a == b, "stub decode must be deterministic")
    assert(a.nonEmpty)
    a.values.foreach { case (vec, frames) =>
      assert(vec.length == 16)
      assert(vec.forall(v => v >= -1f && v <= 1f))
      assert(frames >= 1 && frames <= 8)
    }
  }
}
