package graft.tools

import graft.corpus.{PagesGen, PdfGen, Rng, ZipGen}
import graft.extract.Extractor

/** Heavy never-throw sweep (beyond ExtractorSpec's bounded version): 20k
  * adversarial inputs — random blobs, magic-prefixed junk forcing every
  * parser branch, and byte-flipped/truncated corruptions of valid
  * documents (incl. nested-PDF attachments and every zip format).
  * Run: sbt "runMain graft.tools.FuzzSweep" — prints the count; any throw
  * fails the run. */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val r = new Rng(0xfeedbeefL)
    var n = 0
    // 1) pure random blobs
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](r.nextInt(4096))
      var i = 0; while (i < b.length) { b(i) = (r.nextLong() & 0xff).toByte; i += 1 }
      assert(Extractor.extract("f", b).status != null); n += 1
    }
    // 2) magic-prefixed random bodies (forces each parser branch)
    val jpegSig = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)
    val prefixes: Seq[Array[Byte]] = Seq(
      "%PDF-1.4\n".getBytes("ISO-8859-1"), "PK".getBytes("ISO-8859-1"),
      "GIF89a".getBytes("ISO-8859-1"), "RIFF1234WAVE".getBytes("ISO-8859-1"),
      jpegSig, "<html><body>".getBytes("ISO-8859-1"),
      "fLaC".getBytes("ISO-8859-1"), "OggS".getBytes("ISO-8859-1"))
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
      PagesGen.page(0).html, PagesGen.page(41).html)
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
