package graft.tools
import graft.corpus.PagesGen
import graft.extract.Extractor
/** Scalar (no-Spark) extraction micro-benchmark: single-core docs/s and
  * MB/s over the seeded corpus — the per-core number BASELINE.md's
  * compute-bound analysis is anchored to. Run:
  *   sbt "runMain graft.tools.ScalarBench" */
object ScalarBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toLongOption).getOrElse(4000L)
    val pages = (0L until n).map(PagesGen.page)
    // warm
    pages.take(math.min(1000, n.toInt)).foreach(p => Extractor.extract(p.url, p.html))
    var bytes = 0L
    val t0 = System.nanoTime()
    pages.foreach { p => bytes += Extractor.extract(p.url, p.html).textBytes }
    val sec = (System.nanoTime()-t0)/1e9
    println(f"[scalar] $n docs in $sec%.2f s = ${n/sec}%.0f docs/s/core, out=$bytes")
    val htmlBytes = pages.map(_.html.length.toLong).sum
    println(f"[scalar] input ${htmlBytes/1e6}%.1f MB -> ${htmlBytes/1e6/sec}%.1f MB/s/core")
  }
}
