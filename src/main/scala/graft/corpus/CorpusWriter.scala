package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-side corpus materialization: pages are a pure function of the row
  * index, so generation distributes trivially and the table content is
  * independent of `partitions`. */
object CorpusWriter {

  def pagesDs(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => PagesGen.page(i)).toDF()
  }

  def writePages(spark: SparkSession, n: Long, path: String, partitions: Int = 32): Unit =
    pagesDs(spark, n, partitions).write.mode("overwrite").parquet(path)

  /** Write the pages table BUCKETED by url-hash: all versions of a url land
    * in one file. This is the 100 TB ingest layout — extraction over a
    * bucketed table needs NO shuffle at all (per-partition dedup + map),
    * the same way production tables are bucketed/sorted at write time to
    * co-locate later joins. One file per bucket; files stay under
    * maxPartitionBytes so each bucket reads back as one task partition. */
  def writePagesBucketed(spark: SparkSession, n: Long, path: String, buckets: Int = 32): Unit =
    pagesDs(spark, n, buckets)
      .repartition(buckets, pmod(xxhash64(col("url")), lit(buckets)))
      .write.mode("overwrite").parquet(path)

  /** Idempotent local materialization for tests/queries: generate once,
    * reuse across SparkEntry query invocations. */
  def ensurePages(spark: SparkSession, n: Long, path: String): String = {
    val done = new java.io.File(path + "/_SUCCESS")
    if (!done.exists()) writePages(spark, n, path)
    path
  }
}
