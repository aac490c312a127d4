package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 optimization harness (guide §1.4/§1.5): times INDIVIDUAL declared
  * queries with the noop sink at the SAME session config as graft.Bench
  * (which is frozen for measurement), and optionally dumps
  * `.explain("formatted")` plans to plans/r07/.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.BenchExtra [tag] [q1,q2,...]"
  *
  * - `tag` (default "probe"): plans are written to
  *   plans/r07/<query>_<tag>.txt when tag is "before" or "after"
  *   (the judge-facing artifacts); other tags time only.
  * - query list (default: the Bench headline set) selects which declared
  *   queries run.
  *
  * This is a SEPARATE main from graft.Bench: the driver contract
  * (one-JSON-line Bench output, scale factors, methodology) is untouched.
  * Timings here use the identical warmup + best-of-2 + noop-sink protocol.
  */
object BenchExtra {

  /** Same fixed ALU loop as Bench.hostCalib (duplicated because Bench is
    * frozen): meaningful RELATIVELY across runs — ~0.2-0.3 s clean,
    * 0.39+ s in the documented degraded windows. */
  private def hostCalib(): Double = {
    def once(): Double = {
      var h = 0x9E3779B97F4A7C15L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < 200000000L) { h ^= i; h *= 0xC2B2AE3D27D4EB4FL; h ^= (h >>> 29); i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      if (h == 42L) System.err.print("")
      sec
    }
    (1 to 3).map(_ => once()).min
  }

  val Headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_topk_revenue", "q05_window_topn",
    "q06_sessionize", "d01_exact_dedup", "d02_token_stats",
    "d05_minhash_pairs", "d07_simhash_pairs", "d10_decontaminate",
    "d11_repetition", "d12_pii", "d13_domains", "d14_para_dedup",
    "d15_url_canon", "d16_token_budget", "d17_corpus_lang",
    "d18_holdout_split", "d19_dup_windows", "d20_dup_excise",
    "d21_hash_sample", "e01_cosine_topk", "e02_ann_lsh", "e04_ann_ivf",
    "x01_extract_status_counts")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = args.headOption.getOrElse("probe")
    val wanted: Seq[String] =
      if (args.length >= 2 && args(1).nonEmpty) args(1).split(",").toSeq
      else Headline

    val calibStart = hostCalib()

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "131072")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
    if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      b.config("spark.local.dir", "/dev/shm/graft-shuffle")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val planDir = java.nio.file.Paths.get("plans/r07")
    java.nio.file.Files.createDirectories(planDir)

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    try {
      // an unknown query name must be LOUD, not silently dropped: a typo'd
      // probe would otherwise record an "after" set missing the query
      // under measurement (review finding)
      wanted.filterNot(SparkEntryAccess.get(_).isDefined).foreach(n =>
        System.err.println(s"[bench-extra] UNKNOWN query name: $n (skipped)"))
      for (name <- wanted; fn <- SparkEntryAccess.get(name)) {
        s.sparkContext.setJobDescription(s"bench-extra: $name")
        def once(): Double = {
          val t0 = System.nanoTime()
          materialize(fn(s, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        val warm = try Some(once()) catch {
          case t: Throwable =>
            System.err.println(s"[bench-extra] $name FAILED: ${t.getMessage}")
            None
        }
        // timed runs guarded like graft.Bench's: a transient flake records
        // -1.0 for THIS query instead of aborting the whole probe session
        val sec = warm match {
          case None => -1.0
          case Some(w) =>
            try { if (w >= 10.0) once() else math.min(once(), once()) }
            catch { case _: Throwable => -1.0 }
        }
        results(name) = sec
        // plan dump AFTER timing (plan construction may do eager work)
        if (tag == "before" || tag == "after") {
          val full = fn(s, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(planDir.resolve(s"${name}_$tag.txt"),
            full.getBytes("UTF-8"))
        }
        println(f"[bench-extra] $name%-28s ${sec}%8.3f s")
      }
    } finally s.stop()

    val calibEnd = hostCalib()
    def f(d: Double): String = f"$d%.4f".replace(",", ".")
    val qs = results.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    println(s"""{"bench_extra":"$tag","sf":"$sfDir","queries":$qs,""" +
      s""""host_calib_sec_start":${f(calibStart)},"host_calib_sec_end":${f(calibEnd)},""" +
      s""""total":${f(results.values.filter(_ > 0).sum)}}""")
  }
}

/** Indirection so BenchExtra compiles regardless of SparkEntry's shape. */
private object SparkEntryAccess {
  def get(name: String): Option[(SparkSession, String) => org.apache.spark.sql.DataFrame] =
    graft.SparkEntry.queries.get(name)
}
