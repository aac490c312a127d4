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
}
