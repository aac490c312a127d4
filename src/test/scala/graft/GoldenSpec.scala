package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{CorpusWriter, GenGoldens}
import graft.pipeline.ExtractPipeline

/** THE correctness gate (north_rule): the Spark pipeline's extracted text is
  * byte-identical per url to the committed golden fixtures produced by the
  * scalar oracle — a full-outer comparison so missing urls, extra urls, and
  * any byte diff all fail (the byte-level upgrade of the reference's exact
  * status-JSON asserts, test_views.py:113-119,164-169). */
class GoldenSpec extends AnyFunSuite {

  private val Rows = 500L

  test("spark pipeline output is byte-identical per url to golden fixtures") {
    val spark = TestSpark.spark
    val pages = CorpusWriter.pagesDs(spark, Rows, partitions = 7)
    val out = ExtractPipeline.run(pages, ExtractPipeline.Config(partitions = 8))
      .collect()
      .map(e => e.url -> e)
      .toMap

    // expectation table
    val expLines = Files.readAllLines(Paths.get("fixtures/expected.tsv"))
    assert(expLines.size > 1, "fixtures/expected.tsv missing — run GenGoldens")
    val expected = expLines.stream().skip(1).toArray.map(_.toString).map { line =>
      val f = line.split("\t", -1)
      f(0) -> ((f(1), f(2), f(3).toLong, f(4).toInt, f(5), f(6), f(7), f(8).toInt, f(9).toLong))
    }.toMap

    assert(out.keySet == expected.keySet,
      s"url set mismatch: missing=${(expected.keySet -- out.keySet).take(3)} " +
        s"extra=${(out.keySet -- expected.keySet).take(3)}")

    expected.foreach { case (url, (status, mime, textBytes, spanCount, message,
        kind, pdfVersion, nAtts, attBytes)) =>
      val e = out(url)
      assert(e.status == status, s"$url status ${e.status} != $status (${e.message})")
      assert(e.mimeType == mime, s"$url mime")
      assert(e.textBytes == textBytes, s"$url textBytes")
      assert(e.spans.length == spanCount, s"$url spanCount")
      assert(Option(e.message).getOrElse("") == message, s"$url message")
      assert(e.detectedKind == kind, s"$url detectedKind ${e.detectedKind} != $kind")
      assert(e.pdfVersion == pdfVersion, s"$url pdfVersion")
      assert(e.attachments.length == nAtts, s"$url nAttachments")
      assert(e.attachments.map(_.bytes.length.toLong).sum == attBytes, s"$url attBytes")
      if (status == "finished") {
        val golden = Files.readAllBytes(
          Paths.get("fixtures/golden", GenGoldens.sha256(url) + ".txt"))
        assert(java.util.Arrays.equals(e.text, golden),
          s"$url text bytes differ from golden")
      }
    }
    // no golden file lacks a produced row (both directions checked via keyset)
  }

  test("spark pipeline equals the scalar oracle on rows beyond the fixtures") {
    // rows 500..1100: not covered by the committed goldens — the oracle is
    // run in-process instead, so this window can move freely between rounds
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val pages = CorpusWriter.pagesDs(spark, 1100L, partitions = 6)
      .where(xxhash64(col("url")).isNotNull) // no-op; keeps lazy plan shape
    val sparkOut = ExtractPipeline.run(pages, ExtractPipeline.Config(partitions = 8))
      .collect()
      .filter(_.url.split("doc-").last.toLong >= 500L)
      .map(e => e.url -> ((e.status, e.textBytes,
        java.util.Arrays.hashCode(e.text), e.spans.length, Option(e.message))))
      .toMap
    val oracle = GenGoldens.dedupedPages(1100L)
      .filter(_.url.split("doc-").last.toLong >= 500L)
      .map { p =>
        val e = graft.extract.Extractor.extract(p.url, p.html)
        p.url -> ((e.status, e.textBytes,
          java.util.Arrays.hashCode(e.text), e.spans.length, Option(e.message)))
      }.toMap
    assert(sparkOut.keySet == oracle.keySet)
    oracle.foreach { case (url, expected) =>
      assert(sparkOut(url) == expected, s"$url: ${sparkOut(url)} != $expected")
    }
  }

  test("dedup picks the latest crawl for duplicated urls") {
    val spark = TestSpark.spark
    val pages = CorpusWriter.pagesDs(spark, 200L, partitions = 5)
    assert(pages.count() == 200)
    val deduped = ExtractPipeline.dedupLatest(pages)
    val dupUrls = (0L until 200L)
      .filter(i => graft.corpus.PagesGen.category(i) == "dup-url")
      .map(graft.corpus.PagesGen.url).distinct
    assert(dupUrls.nonEmpty)
    import org.apache.spark.sql.functions._
    val kept = deduped.filter(col("url").isin(dupUrls: _*))
      .select("url", "warc_ts").collect()
    assert(kept.length == dupUrls.size, "one row per dup url")
    // kept row must be the later crawl: url doc-<k> was re-crawled at row
    // k+1 with warc_ts = base + (k+1)*1000 + 7200000
    kept.foreach { r =>
      val key = r.getString(0).split("doc-").last.toLong
      val expectedTs = 1735689600000L + (key + 1) * 1000L + 7200000L
      assert(r.getTimestamp(1).getTime == expectedTs, s"row $r")
    }
  }
}
