package graft.tools
import graft.corpus.CorpusWriter
import org.apache.spark.sql.SparkSession
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val pages = CorpusWriter.pagesDs(s, 300, 3)
    val df = graft.pipeline.ExtractPipeline.run(pages).toDF()
    df.collect() // materialize THIS query execution so AQE finalizes
    val fin = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    println("#### final tree")
    println(fin.split("\n\n").head)
    println("#### reuse markers: " + fin.linesIterator.count(l => l.contains("Reused")))
    s.stop()
  }
}
