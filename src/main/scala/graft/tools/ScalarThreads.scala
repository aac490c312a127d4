package graft.tools
import graft.corpus.PagesGen
import graft.extract.Extractor

/** Raw-thread extraction scaling probe (no Spark): T threads over disjoint
  * doc ranges, aggregate MB/s — the measurement behind BASELINE.md's
  * DRAM-knee analysis, re-runnable at the current scalar speed. Run:
  *   sbt "runMain graft.tools.ScalarThreads <docsPerThread> <threads...>"
  */
object ScalarThreads {
  def main(args: Array[String]): Unit = {
    val per = args.headOption.flatMap(_.toLongOption).getOrElse(20000L)
    val threadCounts =
      if (args.length > 1) args.tail.flatMap(_.toIntOption).toSeq else Seq(1, 2, 4, 8)
    val maxT = threadCounts.max
    // pre-generate all inputs so generation cost never pollutes the timing
    val pages = (0L until per * maxT).map(PagesGen.page).toArray
    val mb = pages.map(_.html.length.toLong).sum / 1e6
    // warm JIT on one slice
    pages.take(2000).foreach(p => Extractor.extract(p.url, p.html))
    for (t <- threadCounts) {
      val slice = per * t
      val t0 = System.nanoTime()
      val threads = (0 until t).map { ti =>
        val th = new Thread(() => {
          var i = ti * per
          val end = (ti + 1) * per
          var acc = 0L
          while (i < end) { acc += Extractor.extract(pages(i.toInt).url, pages(i.toInt).html).textBytes; i += 1 }
          if (acc == -1L) System.err.print("")
        })
        th.start(); th
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val inMb = pages.take(slice.toInt).map(_.html.length.toLong).sum / 1e6
      println(f"[scalar-threads] T=$t%2d  ${slice} docs  $sec%6.2f s  ${inMb / sec}%7.1f MB/s total  ${inMb / sec / t}%6.1f MB/s/core")
    }
    if (mb < 0) println("")
  }
}
