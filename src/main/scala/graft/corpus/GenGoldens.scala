package graft.corpus

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.core.Page
import graft.extract.Extractor

/** Golden-fixture generator — the scalar (non-Spark) oracle of SURVEY.md §5.2:
  * runs the extraction core single-threaded over the deterministic corpus and
  * writes per-url golden text + an expectation table. `sbt -batch test` then
  * asserts the SPARK pipeline reproduces these byte-identically (north_rule
  * invariant). Run once per heuristics version:
  *
  *   sbt "runMain graft.corpus.GenGoldens fixtures 500"
  */
object GenGoldens {

  val DefaultRows = 500L

  def sha256(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Deduped corpus: last write wins per url, mirroring
    * ExtractPipeline.dedupLatest but in plain Scala — INCLUDING the
    * tie-break: (warc_ts, xxhash64(html)) descending with the pipeline's
    * exact hash, so the winner is identical by construction even if a
    * future corpus produces equal timestamps for one url. */
  def dedupedPages(n: Long): Seq[Page] =
    (0L until n).map(PagesGen.page)
      .groupBy(_.url)
      .map { case (_, rows) =>
        rows.maxBy { p =>
          // null html hashes as the empty payload, matching the pipeline's
          // tieHash normalization (the corpus never emits nulls, but the
          // oracle must mirror the pipeline exactly either way)
          val h0 = if (p.html == null) Array.emptyByteArray else p.html
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            h0, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            h0.length, 42L)
          (p.warc_ts.getTime, h)
        }
      }
      .toSeq.sortBy(_.url)

  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "fixtures"
    val n = if (args.length > 1) args(1).toLong else DefaultRows
    val goldenDir = Paths.get(outDir, "golden")
    Files.createDirectories(goldenDir)

    val pages = dedupedPages(n)
    val tsv = new java.lang.StringBuilder(64 * 1024)
    tsv.append("url\tstatus\tmimeType\ttextBytes\tspanCount\tmessage\tdetectedKind\tpdfVersion\tnAttachments\tattBytes\n")
    var goldens = 0
    pages.foreach { p =>
      val e = Extractor.extract(p.url, p.html)
      if (e.status == "finished") {
        Files.write(goldenDir.resolve(sha256(p.url) + ".txt"), e.text)
        goldens += 1
      }
      val msg = Option(e.message).getOrElse("")
      val attBytes = e.attachments.map(_.bytes.length.toLong).sum
      tsv.append(s"${p.url}\t${e.status}\t${e.mimeType}\t${e.textBytes}\t${e.spans.length}\t$msg" +
        s"\t${e.detectedKind}\t${e.pdfVersion}\t${e.attachments.length}\t$attBytes\n")
    }
    Files.write(Paths.get(outDir, "expected.tsv"),
      tsv.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[goldens] rows=$n urls=${pages.length} goldens=$goldens -> $outDir")
  }
}
