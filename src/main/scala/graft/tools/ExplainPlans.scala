package graft.tools
import graft.corpus.CorpusWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Plan-inspection tool: prints the physical plans of the flagship queries
  * so pushdown / broadcast / aggregate shapes can be reviewed (PLANS.md is
  * generated from this output). Run: sbt "runMain graft.tools.ExplainPlans" */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    def p(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"########## $name")
      // formatted mode: compact operator tree first, details after a blank
      // line — print the tree (exchanges, aggregates, reuse) plus pushdown
      // details, skip the serializer noise
      val full = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val tree = full.split("\n\n").head
      println(tree.take(4000))
      full.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Arguments: hashpartitioning") || l.contains("RoundRobin"))
        .take(12).foreach(l => println(l.take(240)))
    }
    // pushdown check: filter + projection on lineitem
    p("pushdown", s.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_shipdate") < "1996-01-01").select("l_orderkey","l_quantity"))
    p("q02_topk", graft.SparkEntry.queries("q02_topk_revenue")(s, d))
    p("q03_rollup_broadcast", graft.SparkEntry.queries("q03_region_rollup")(s, d))
    val pages = CorpusWriter.pagesDs(s, 100, 2)
    p("extract_full", graft.pipeline.ExtractPipeline.run(pages).toDF())
    p("d05_minhash", graft.SparkEntry.queries("d05_minhash_pairs")(s, d))
    // d10: the benchmark gram side must BROADCAST (no corpus shuffle)
    val docs = s.read.parquet(s"$d/documents.parquet")
    p("d10_decontaminate", graft.ops.Dedup.decontaminate(
      docs.filter(col("doc_id") % 50 =!= 0), docs.filter(col("doc_id") % 50 === 0)))
    p("d11_repetition", graft.ops.TextStats.repetition(docs))
    // d18: must be a single zero-exchange projection over the id column
    p("d18_holdout", graft.SparkEntry.queries("d18_holdout_split")(s, d))
    // d19: window strings must NOT reach an exchange — only the 24-byte
    // hash-key rows shuffle; the hot-set probe side broadcasts under AQE
    p("d19_dup_windows", graft.SparkEntry.queries("d19_dup_windows")(s, d))
    // d20: same window/hot shape as d19 plus ONE doc-key shuffle of
    // (id, dup positions); the token arrays join it on the uniform id key
    p("d20_dup_excise", graft.SparkEntry.queries("d20_dup_excise")(s, d))
    // d21: must be a single zero-exchange Filter (md5 CASE) over the scan
    p("d21_hash_sample", graft.SparkEntry.queries("d21_hash_sample")(s, d))
    // mix assemble: the coarse lang key must NOT get a single global
    // window — two (lang, day)-spread window exchanges plus the
    // metadata-sized offset join (broadcast under AQE)
    p("mix_assemble", graft.pipeline.MixJob.assemble(
      docs.select(col("doc_id").cast("string").as("url"),
        // a varying crawl time: constant-folding a literal ts would
        // degenerate the (lang, day) bucket the audit is checking
        timestamp_seconds(lit(1735689600L) + col("doc_id") * 3600).as("warc_ts"),
        col("lang"), col("text")),
      graft.pipeline.MixOptions(sample = Map("en" -> 0.5), budget = Some(10000L))))
    s.stop()
  }
}
