package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plans of the newest operators (the
  * PLANS.md evidence loop): curate, d12 pii, d13 domains. Run:
  *   sbt "runMain graft.tools.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val pages = graft.corpus.CorpusWriter.pagesDs(spark, 300L, partitions = 4)
      val extracted = graft.pipeline.ExtractPipeline
        .run(pages, graft.pipeline.ExtractPipeline.Config(partitions = 4)).toDF()
      // NOTE (r7): curate's input guard reliably checkpoints this live
      // (non-file-backed) extraction frame at call time, so this "print
      // the plan" step now RUNS extraction once and the dumped plan shows
      // a checkpoint scan leaf where the extraction subtree used to
      // appear — which matches the production batch job (committed
      // snapshot) more closely than the r6 audit did. The extraction
      // pipeline's own plan is audited separately via ReuseCheck (§4).
      println("==== curate (full chain incl. filters + decontamination) ====")
      import spark.implicits._
      graft.pipeline.Curate.curate(extracted,
        graft.pipeline.CurateOptions(cap = 25, block = Seq("example-3.test"),
          paraMaxDocs = 2, minQuality = Some(0.2), maxDupWord = Some(0.9),
          maxTopBigram = Some(0.9)),
        benchGrams = Some(graft.ops.Dedup.benchGramHashes(
          Seq("held out benchmark prompt text for the plan audit")
            .toDF("text")))).explain("formatted")
      println("==== d12 pii (over finished text) ====")
      graft.ops.TextStats.piiStats(
        extracted.where(org.apache.spark.sql.functions.col("status") === "finished")
          .selectExpr("url", "cast(text as string) as text"),
        idCol = "url").explain("formatted")
      println("==== d13 domainStats (pages metadata) ====")
      graft.ops.Urls.domainStats(pages.toDF(), "url", "warc_ts",
        cap = 25, block = Seq("example-3.test")).explain("formatted")
      println("==== d14 passage dedup (over finished text) ====")
      graft.ops.Dedup.stripRepeatedParagraphs(
        extracted.where(org.apache.spark.sql.functions.col("status") === "finished")
          .selectExpr("url", "cast(text as string) as text"),
        idCol = "url", textCol = "text").explain("formatted")
    } finally spark.stop()
  }
}
