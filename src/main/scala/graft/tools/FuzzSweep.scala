package graft.tools

import graft.corpus.{LegacyGen, PagesGen, PdfGen, Rng, ZipGen}
import graft.extract.Extractor

/** Heavy never-throw sweep (beyond ExtractorSpec's bounded version): 20k+
  * adversarial inputs — random blobs, magic-prefixed junk forcing every
  * parser branch, byte-flipped/truncated corruptions of valid documents
  * (incl. nested-PDF attachments, every zip format, RTF, CFB), and a
  * stream-density pathological PDF with a wall-time bound.
  * Run: sbt "runMain graft.tools.FuzzSweep" — prints the count; any throw
  * or time-bound violation fails the run. */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val r = new Rng(0xfeedbeefL)
    var n = 0
    // 0) adversarial stream density: thousands of tiny streams + Filespec/
    // trailer/obj keyword spam — the probes' `inside` checks run inside
    // indexOf loops, so this must stay near-linear (binary-searched
    // extents), bounded at a few seconds even on a cold JVM
    locally {
      val sb = new java.lang.StringBuilder(1 << 20)
      sb.append("%PDF-1.4\n")
      (0 until 4000).foreach { i =>
        sb.append(s"${i + 10} 0 obj\n<< /Length 2 >>\nstream\nAB\nendstream\nendobj\n")
        sb.append("/Filespec trailer stream 7 0 obj ") // keyword spam (text)
      }
      sb.append("1 0 obj\n<< /Length 40 >>\nstream\n")
      sb.append("BT /F1 12 Tf 72 720 Td (payload) Tj ET\nendstream\nendobj\n")
      sb.append("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
      val b = sb.toString.getBytes("ISO-8859-1")
      val t0 = System.nanoTime()
      val e = Extractor.extract("pathological", b)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(e.status != null)
      assert(sec < 10.0, s"stream-density pathological case took $sec s")
      println(f"[fuzz] stream-density case: ${b.length} bytes, $sec%.2f s, status=${e.status}")
      n += 1
    }
    // 1) pure random blobs
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](r.nextInt(4096))
      var i = 0; while (i < b.length) { b(i) = (r.nextLong() & 0xff).toByte; i += 1 }
      assert(Extractor.extract("f", b).status != null); n += 1
    }
    // 2) magic-prefixed random bodies (forces each parser branch)
    val jpegSig = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)
    val cfbSig = Array[Byte](0xd0.toByte, 0xcf.toByte, 0x11, 0xe0.toByte,
      0xa1.toByte, 0xb1.toByte, 0x1a, 0xe1.toByte)
    val prefixes: Seq[Array[Byte]] = Seq(
      "%PDF-1.4\n".getBytes("ISO-8859-1"), "PK".getBytes("ISO-8859-1"),
      "GIF89a".getBytes("ISO-8859-1"), "RIFF1234WAVE".getBytes("ISO-8859-1"),
      jpegSig, "<html><body>".getBytes("ISO-8859-1"),
      "fLaC".getBytes("ISO-8859-1"), "OggS".getBytes("ISO-8859-1"),
      cfbSig, "{\\rtf1\\ansi".getBytes("ISO-8859-1"),
      Array[Byte]('I', 'I', 0x2a, 0), Array[Byte]('M', 'M', 0, 0x2a),
      Array[Byte](0, 0, 0, 0x20, 'f', 't', 'y', 'p', 'h', 'e', 'i', 'c'),
      "a,b,c\nd,e,f\ng,h,i\n".getBytes("ISO-8859-1"))
    (0 until 5000).foreach { k =>
      val p = prefixes(k % prefixes.length)
      val b = new Array[Byte](p.length + r.nextInt(2048))
      System.arraycopy(p, 0, b, 0, p.length)
      var i = p.length; while (i < b.length) { b(i) = (r.nextLong() & 0xff).toByte; i += 1 }
      assert(Extractor.extract("f", b).status != null); n += 1
    }
    // 3) corrupted VALID documents: random byte flips + truncations
    val seeds = Seq(
      ZipGen.docx(Seq("alpha beta gamma", "delta")),
      ZipGen.odt("h", Seq("p1", "p2")),
      ZipGen.pptx(Seq(Seq("s"))),
      ZipGen.xlsx(Seq("a", "b")),
      PdfGen.build(PdfGen.PdfSpec(Seq(Seq("line one", "line two")),
        attachments = Seq("a.pdf" -> PdfGen.build(PdfGen.PdfSpec(Seq(Seq("inner"))))))),
      LegacyGen.rtf(Seq("rtf paragraph one", "and two")),
      LegacyGen.doc(Seq("word paragraph one", "and two")),
      LegacyGen.xls(Seq("cell a", "cell b")),
      LegacyGen.ppt(Seq(Seq("slide text"))),
      LegacyGen.cfb("WordDocument", Array.tabulate[Byte](700)(i => (i * 17).toByte)),
      ZipGen.ods(Seq("cell a", "cell b")),
      ZipGen.epub(Seq("chapter")),
      PagesGen.page(0).html, PagesGen.page(41).html,
      PagesGen.page(33).html, // csv category
      PagesGen.page(475).html) // heif/heic media variant
    (0 until 10000).foreach { k =>
      val src = seeds(k % seeds.length)
      val b = java.util.Arrays.copyOf(src, 1 + r.nextInt(src.length))
      var flips = r.nextInt(8)
      while (flips > 0 && b.length > 0) {
        b(r.nextInt(b.length)) = (r.nextLong() & 0xff).toByte; flips -= 1
      }
      assert(Extractor.extract("f", b).status != null); n += 1
    }
    println(s"[fuzz] $n inputs, zero throws")
  }
}
