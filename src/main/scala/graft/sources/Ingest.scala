package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc corpus ingestion: raw files on disk -> the pages table shape.
  * Spark analog of the reference's upload source (store_file,
  * docsbox/docs/utils.py:142-150): each file becomes one document row.
  * Built on the binaryFile source, so reads are distributed and lazily
  * column-pruned (content only materializes where needed). */
object Ingest {

  /** Read every file under `dir` (optionally glob-filtered) as a pages row:
    * url = file path URI, warc_ts = modification time, html = bytes.
    * `text`/`lang` are null — unknown for raw files (FIXTURES.md §1 marks
    * them as crawler-provided extras not used by extraction). */
  def fromBinaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        col("path").as("url"),
        col("modificationTime").as("warc_ts"),
        col("content").as("html"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"))

  /** Read WARC archives (plain or .gz) into the pages table shape — the
    * Common-Crawl ingest path: one row per `response` record, url from
    * WARC-Target-URI, warc_ts from WARC-Date, html = the HTTP payload.
    * Files are distributed by the binaryFile source and parsed inside a
    * narrow map (one task per file; whole-file parse is the standard WARC
    * access pattern — archives are written ~1 GB each precisely so one
    * fits in an executor task). */
  def fromWarc(spark: SparkSession, dir: String, glob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(WarcReader.records))
      .toDF()
  }
}
