package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusWriter
import graft.pipeline.ExtractPipeline

/** Benchmark main. Two parts:
  *
  *  1. The north-rule scaling evidence (BASELINE.md protocol): the SAME
  *     extraction job on the SAME synthetic pages corpus at local[8] (N)
  *     and local[32] (4N); reports docs/sec at both and scaling efficiency
  *     eff = (throughput_4N / throughput_N) / 4, target >= 0.8.
  *  2. Headline query timings at local[32] over SPARK_GRAFT_SF_DIR.
  *
  * Prints ONE JSON line (driver contract) with the stub's required fields
  * plus an "extract" section carrying the scaling numbers.
  * Timings use the noop sink so column pruning cannot skip work.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Wall seconds for the full extraction job over the given pages path. */
  private def timeExtraction(spark: SparkSession, pagesPath: String, partitions: Int): Double = {
    val pages = spark.read.parquet(pagesPath)
    val t0 = System.nanoTime()
    materialize(ExtractPipeline.run(pages,
      ExtractPipeline.Config(partitions = partitions)).toDF())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val rows = math.max(2000L, (sf * 200000).toLong) // sf0.1 -> 20k pages
    val pagesPath = s"/tmp/graft-bench-pages/rows-$rows"
    val warmupPath = "/tmp/graft-bench-pages/warmup-2000"

    // ---- corpus setup (not timed) on a throwaway session
    {
      val s = session(32)
      CorpusWriter.ensurePages(s, rows, pagesPath)
      CorpusWriter.ensurePages(s, 2000L, warmupPath)
      s.stop()
    }

    // ---- scaling run: N = 8 cores
    val sec8 = {
      val s = session(8)
      try {
        timeExtraction(s, warmupPath, 8) // JIT/codegen warmup
        timeExtraction(s, pagesPath, 8)
      } finally s.stop()
    }

    // ---- scaling run + headline queries: 4N = 32 cores
    val (sec32, queryTimes) = {
      val s = session(32)
      try {
        timeExtraction(s, warmupPath, 32)
        val t = timeExtraction(s, pagesPath, 32)
        // headline subset: one per operator family (the rest are covered by
        // the Verify correctness pass; first-run codegen compile of all 24
        // would dominate wall time and measure Janino, not the engine)
        val headline = Set("q01_pricing_summary", "q02_topk_revenue",
          "q05_window_topn", "q06_sessionize", "d01_exact_dedup",
          "d02_token_stats", "d05_minhash_pairs", "d07_simhash_pairs",
          "e01_cosine_topk", "e02_ann_lsh", "x01_extract_status_counts")
        val qt = SparkEntry.queries.toSeq.sortBy(_._1)
          .filter(q => headline.contains(q._1)).map { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok = try { materialize(fn(s, sfDir)); true }
            catch { case _: Throwable => false }
          name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
        (t, qt)
      } finally s.stop()
    }

    val thr8 = rows / sec8
    val thr32 = rows / sec32
    val eff = (thr32 / thr8) / 4.0
    def f(d: Double): String = f"$d%.4f".replace(",", ".")

    val qs = queryTimes.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).filter(_ > 0).sum + sec32
    val extract =
      s"""{"rows":$rows,"sec_local8":${f(sec8)},"sec_local32":${f(sec32)},""" +
        s""""docs_per_sec_local8":${f(thr8)},"docs_per_sec_local32":${f(thr32)},""" +
        s""""docs_per_sec_per_core_local32":${f(thr32 / 32)},""" +
        s""""scaling_efficiency_8_to_32":${f(eff)}}"""
    println(
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,""" +
        s""""extract":$extract,"sf":"$sfDir"}""")
  }
}
