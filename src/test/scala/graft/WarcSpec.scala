package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{GenGoldens, PagesGen, WarcGen}
import graft.sources.{Ingest, WarcReader}

/** WARC ingest: Common-Crawl-format archives -> the pages table shape,
  * round-tripped through the deterministic WarcGen writer and extracted
  * identically to the parquet path. */
class WarcSpec extends AnyFunSuite {

  private def pages(n: Long) = (0L until n).map(PagesGen.page)

  test("scalar roundtrip: every response record comes back byte-identical") {
    val ps = pages(120)
    Seq(false, true).foreach { gz =>
      val warc = WarcGen.build(ps, gzip = gz)
      val got = WarcReader.records(warc)
      assert(got.length == ps.length, s"gz=$gz")
      got.zip(ps).foreach { case (a, b) =>
        assert(a.url == b.url && a.warc_ts == b.warc_ts)
        assert(java.util.Arrays.equals(a.html, b.html), a.url)
      }
    }
  }

  test("malformed archives never throw and keep the parseable prefix") {
    val warc = WarcGen.build(pages(20))
    // truncations at every boundary flavor
    (1 until warc.length by 97).foreach { cut =>
      val got = WarcReader.records(java.util.Arrays.copyOf(warc, cut))
      assert(got.length <= 20)
    }
    // garbage is not a warc
    assert(WarcReader.records("not a warc at all".getBytes).isEmpty)
    assert(WarcReader.records(Array.emptyByteArray).isEmpty)
    // a corrupted record header loses framing -> clean stop, no throw
    val broken = new String(warc, "ISO-8859-1")
      .replaceFirst("Content-Length: \\d+", "Content-Length: nope")
      .getBytes("ISO-8859-1")
    WarcReader.records(broken) // must not throw
  }

  test("spark ingest: fromWarc equals the parquet pages table; extraction identical") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("graft-warc")
    val ps = pages(200)
    // two archives, one gzipped — multiple files exercise distribution
    Files.write(dir.resolve("part-0.warc"), WarcGen.build(ps.take(100)))
    Files.write(dir.resolve("part-1.warc.gz"), WarcGen.build(ps.drop(100), gzip = true))

    val fromWarc = Ingest.fromWarc(spark, dir.toString)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getTimestamp(1).getTime,
        java.util.Arrays.hashCode(r.getAs[Array[Byte]](2)))
    }.toSet
    val expected = ps.map(p =>
      (p.url, p.warc_ts.getTime, java.util.Arrays.hashCode(p.html))).toSet
    assert(key(fromWarc) == expected)

    // end-to-end: extraction over warc-ingested pages matches the scalar
    // oracle (the same invariant the parquet path is held to)
    val out = graft.pipeline.ExtractPipeline.run(fromWarc,
        graft.pipeline.ExtractPipeline.Config(partitions = 4))
      .collect().map(e => e.url -> ((e.status, e.textBytes))).toMap
    val oracle = GenGoldens.dedupedPages(200).map { p =>
      val e = graft.extract.Extractor.extract(p.url, p.html)
      p.url -> ((e.status, e.textBytes))
    }.toMap
    assert(out == oracle)
  }
}
